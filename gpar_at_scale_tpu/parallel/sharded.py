"""Sharded training / inference steps over a named mesh.

Chain axis: independent hyperparameter optimizations / MCMC chains vmapped
then sharded.  Data axis: the N (time) dimension of the observations — the
associative-scan filter shards over it and XLA inserts the block-boundary
collectives (the scan's combine is associative, so time blocks communicate
only at boundaries; SURVEY.md §5.7 build mapping).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpar_at_scale_tpu.gp.dtc import dtc_objective
from gpar_at_scale_tpu.kernels import Matern52
from gpar_at_scale_tpu.ssm.markov import lgssm_of
from gpar_at_scale_tpu.ssm.pkalman import parallel_filter
from gpar_at_scale_tpu.utils.params import unpack_gpar


def make_dtc_nlml(out_family=Matern52, time_family=Matern52, dtype=jnp.float32):
    """Build the scaled-GPAR negative DTC objective as a pure function of
    (params, t, X, y, Z), using the shardable associative-scan filter."""

    def nlml(params, t, X, y, Z):
        tl, ts, ol, osig, ns = unpack_gpar(params)
        time_k = time_family(lengthscale=tl, variance=ts**2)
        out_k = out_family(lengthscale=ol, variance=osig**2)
        lgssm = lgssm_of(time_k, t, ns**2, dtype)
        return -dtc_objective(out_k, lgssm, X, Z, y, filter_fn=parallel_filter)

    return nlml


class TrainState(NamedTuple):
    params: jnp.ndarray  # (C, 5) chain-sharded log-params
    opt_state: Any


def make_sharded_train_step(
    mesh: Mesh,
    *,
    out_family=Matern52,
    time_family=Matern52,
    learning_rate: float = 1e-2,
    dtype=jnp.float32,
) -> Tuple[Callable, Callable, Callable]:
    """(init_fn, step_fn, place_fn) for multi-chain DTC hyperparameter
    optimization.

    Shardings: params/opt state on the "chain" mesh axis; (t, X, y) on the
    "data" axis (the time dimension); Z replicated.  The per-chain gradient
    reductions over the data axis become psums inserted by XLA.
    """
    opt = optax.adam(learning_rate)
    nlml = make_dtc_nlml(out_family, time_family, dtype)

    chain = NamedSharding(mesh, P("chain"))
    data0 = NamedSharding(mesh, P("data"))
    data1 = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())

    def place(params_batch, t, X, y, Z):
        """device_put the problem onto the mesh with the canonical shardings;
        jit then infers placements from the committed arguments."""
        params_batch = jax.device_put(jnp.asarray(params_batch, dtype), chain)
        t = jax.device_put(jnp.asarray(t, dtype), data0)
        X = jax.device_put(jnp.asarray(X, dtype), data1)
        y = jax.device_put(jnp.asarray(y, dtype), data0)
        Z = jax.device_put(jnp.asarray(Z, dtype), repl)
        return params_batch, t, X, y, Z

    def init(params_batch) -> TrainState:
        return TrainState(params=params_batch, opt_state=jax.vmap(opt.init)(params_batch))

    def _one(params, opt_state, t, X, y, Z):
        loss, g = jax.value_and_grad(nlml)(params, t, X, y, Z)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def step(state: TrainState, t, X, y, Z):
        params, opt_state, loss = jax.vmap(_one, in_axes=(0, 0, None, None, None, None))(
            state.params, state.opt_state, t, X, y, Z
        )
        return TrainState(params=params, opt_state=opt_state), loss

    return init, step, place
