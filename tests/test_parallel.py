"""Sharding correctness on the 8-device virtual CPU mesh: sharded execution
must reproduce single-device results bit-for-bit (determinism, SURVEY §5.2)
or to tight numerical tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gpar_at_scale_tpu.gp.dtc import dtc_objective
from gpar_at_scale_tpu.kernels import Matern52
from gpar_at_scale_tpu.parallel.mesh import make_mesh, shard_along
from gpar_at_scale_tpu.parallel.sharded import make_dtc_nlml, make_sharded_train_step
from gpar_at_scale_tpu.ssm.markov import lgssm_of
from gpar_at_scale_tpu.ssm.pkalman import parallel_filter, parallel_logpdf


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(("chain", "data"), (4, 2))


def _problem(rng, n=32, m=6, d=2):
    t = np.sort(rng.uniform(0, 4, size=n))
    X = rng.normal(size=(n, d))
    y = rng.normal(size=n)
    Z = X[:m]
    return jnp.array(t), jnp.array(X), jnp.array(y), jnp.array(Z)


def test_mesh_construction():
    assert len(jax.devices()) == 8
    mesh = make_mesh(("chain", "data"), (2, 4))
    assert mesh.shape == {"chain": 2, "data": 4}


def test_sharded_parallel_logpdf_matches(mesh, rng):
    """Time-axis-sharded associative-scan filter == unsharded result."""
    t, X, y, Z = _problem(rng, n=64)
    k = Matern52(lengthscale=0.8, variance=1.1)
    lgssm = lgssm_of(k, t, 0.1)
    want = float(parallel_logpdf(lgssm, y))

    data = NamedSharding(mesh, P("data"))
    lgssm_sharded = jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(*(["data"] + [None] * (a.ndim - 1)))) if a.ndim >= 1 and a.shape[0] == 64 else NamedSharding(mesh, P())
        ),
        lgssm,
    )
    y_sharded = jax.device_put(y, data)
    got = float(jax.jit(parallel_logpdf)(lgssm_sharded, y_sharded))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_sharded_dtc_objective_matches(mesh, rng):
    t, X, y, Z = _problem(rng, n=64, m=8)
    params = jnp.array([0.1, -0.2, 0.3, -0.1, -1.0])
    nlml = make_dtc_nlml(dtype=jnp.float64)
    want = float(nlml(params, t, X, y, Z))

    data0 = NamedSharding(mesh, P("data"))
    data1 = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())
    got = float(
        jax.jit(nlml)(
            jax.device_put(params, repl),
            jax.device_put(t, data0),
            jax.device_put(X, data1),
            jax.device_put(y, data0),
            jax.device_put(Z, repl),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_sharded_train_step_runs_and_matches_replicated(mesh, rng):
    """One multi-chain train step on the mesh == the same step computed
    chain-by-chain without sharding."""
    t, X, y, Z = _problem(rng, n=32, m=6)
    chains = 8
    params = jnp.array(0.1 * np.random.default_rng(1).normal(size=(chains, 5)))

    init, step, place = make_sharded_train_step(mesh, dtype=jnp.float64, learning_rate=1e-2)
    p_s, t_s, X_s, y_s, Z_s = place(params, t, X, y, Z)
    state = init(p_s)
    state2, loss = step(state, t_s, X_s, y_s, Z_s)
    assert loss.shape == (chains,)
    assert np.all(np.isfinite(np.asarray(loss)))

    # reference: unsharded per-chain losses
    nlml = make_dtc_nlml(dtype=jnp.float64)
    for c in range(chains):
        want = float(nlml(params[c], t, X, y, Z))
        np.testing.assert_allclose(float(loss[c]), want, rtol=1e-8)


def test_vmapped_chains_shard_over_mesh(mesh, rng):
    """NUTS chains sharded over the chain axis produce valid samples."""
    from gpar_at_scale_tpu.inference.nuts import nuts

    def lp(x):
        return -0.5 * jnp.sum(x * x)

    chains = 8
    keys = jax.random.split(jax.random.PRNGKey(0), chains)
    x0s = jnp.ones((chains, 2))
    chain_sh = NamedSharding(mesh, P(("chain", "data")))

    run = jax.jit(
        jax.vmap(lambda k, x: nuts(k, lp, x, num_samples=200, num_warmup=150, max_depth=5))
    )
    res = run(jax.device_put(keys, chain_sh), jax.device_put(x0s, chain_sh))
    s = np.asarray(res.samples)
    assert s.shape == (chains, 200, 2)
    np.testing.assert_allclose(s.reshape(-1, 2).var(0), 1.0, atol=0.3)
