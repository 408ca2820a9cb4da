"""Model-axis (TP) sharding of the inducing dimension M.

``parallel/modelshard.py``: Z sharded along M over a "model" mesh axis,
local K_fu slabs + per-device narrow whitening filters, Gram row-blocks
gathered.  Asserted numerically identical to the replicated objective/q(u)
(SURVEY §2c TP row; VERDICT r4 item 8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.gp.dtc import compute_q_u, dtc_objective
from gpar_at_scale_tpu.kernels import Matern52
from gpar_at_scale_tpu.parallel.mesh import make_mesh
from gpar_at_scale_tpu.parallel.modelshard import (
    compute_q_u_modelsharded,
    dtc_objective_modelsharded,
    make_modelsharded_nlml,
    place_modelsharded,
)
from gpar_at_scale_tpu.ssm.markov import lgssm_of
from gpar_at_scale_tpu.utils.params import pack_gpar, unpack_gpar


def _problem(rng, n=96, m=16, d=2, dtype=jnp.float64):
    t = jnp.asarray(np.sort(rng.uniform(0, 6, size=n)), dtype)
    V = jnp.asarray(rng.normal(size=(n, d)), dtype)
    y = jnp.asarray(np.sin(np.asarray(t)) + 0.3 * rng.normal(size=n), dtype)
    Z = V[np.linspace(0, n - 1, m).astype(int)]
    time_k = Matern52(lengthscale=0.7, variance=1.1)
    out_k = Matern52(lengthscale=0.9, variance=1.3)
    lgssm = lgssm_of(time_k, t, 0.09, dtype)
    return t, V, y, Z, time_k, out_k, lgssm


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(("model",), (4,), devices=jax.devices()[:4])


def test_modelsharded_objective_matches_replicated(rng, mesh):
    t, V, y, Z, time_k, out_k, lgssm = _problem(rng)
    ref = dtc_objective(out_k, lgssm, V, Z, y, uu_ridge=0.09)
    Z_sh = place_modelsharded(mesh, Z)
    val = dtc_objective_modelsharded(
        mesh, (0.9, jnp.sqrt(1.3)), lgssm, V, y, Z_sh, uu_ridge=0.09, num_blocks=8
    )
    np.testing.assert_allclose(float(val), float(ref), rtol=1e-9)


def test_modelsharded_qu_matches_replicated(rng, mesh):
    t, V, y, Z, time_k, out_k, lgssm = _problem(rng)
    qu_ref = compute_q_u(out_k, lgssm, V, Z, y, uu_ridge=0.09)
    Z_sh = place_modelsharded(mesh, Z)
    qu = compute_q_u_modelsharded(
        mesh, (0.9, jnp.sqrt(1.3)), lgssm, V, y, Z_sh, uu_ridge=0.09, num_blocks=8
    )
    np.testing.assert_allclose(np.asarray(qu.m_eps), np.asarray(qu_ref.m_eps), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qu.L_D), np.asarray(qu_ref.L_D), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qu.L_uu), np.asarray(qu_ref.L_uu), rtol=1e-8, atol=1e-10)


def test_modelsharded_gradients_match_replicated(rng, mesh):
    """The sharded objective trains: d nlml / d params identical to the
    replicated path (gradients flow through shard_map + all_gathers)."""
    t, V, y, Z, *_ = _problem(rng, n=64, m=8)
    params = pack_gpar(0.7, 1.05, 0.9, 1.15, 0.3).astype(jnp.float64)

    nlml_sh = make_modelsharded_nlml(mesh, dtype=jnp.float64, num_blocks=8)

    def nlml_ref(p):
        tl, ts, ol, osig, ns = unpack_gpar(p)
        time_k = Matern52(lengthscale=tl, variance=ts**2)
        out_k = Matern52(lengthscale=ol, variance=osig**2)
        lgssm = lgssm_of(time_k, t, ns**2, jnp.float64)
        return -dtc_objective(out_k, lgssm, V, Z, y, uu_ridge=ns**2)

    Z_sh = place_modelsharded(mesh, Z)
    # jit is required around grad-of-shard_map (eager transpose trips a
    # sharding-override assert in jax 0.9) — and is the production mode.
    v_sh, g_sh = jax.jit(jax.value_and_grad(lambda p: nlml_sh(p, t, V, y, Z_sh)))(params)
    v_rf, g_rf = jax.value_and_grad(nlml_ref)(params)
    np.testing.assert_allclose(float(v_sh), float(v_rf), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_rf), rtol=1e-6, atol=1e-9)


def test_indivisible_m_raises(rng, mesh):
    t, V, y, Z, time_k, out_k, lgssm = _problem(rng, m=15)
    with pytest.raises(ValueError, match="divide"):
        dtc_objective_modelsharded(
            mesh, (0.9, 1.0), lgssm, V, y, Z, uu_ridge=0.09
        )
