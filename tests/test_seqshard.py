"""Explicit time-block-sharded filter (parallel/seqshard.py) vs the
sequential oracle, on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.gp.dtc import dtc_objective
from gpar_at_scale_tpu.kernels import Matern32, Matern52
from gpar_at_scale_tpu.parallel.mesh import make_mesh
from gpar_at_scale_tpu.parallel.seqshard import (
    make_sharded_decorrelate,
    make_sharded_filter,
    make_sharded_logpdf,
    make_sharded_smooth,
)
from gpar_at_scale_tpu.ssm.kalman import decorrelate, kalman_filter, rts_smooth
from gpar_at_scale_tpu.ssm.markov import lgssm_of


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(("data",), (8,))


def _problem(n, b=0, dtype=jnp.float64, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0.0, 3.0, size=n))
    k = Matern52(lengthscale=0.7, variance=1.3)
    lgssm = lgssm_of(k, jnp.asarray(t, dtype), 0.1, dtype)
    y = rng.normal(size=(n, b) if b else (n,))
    return lgssm, jnp.asarray(y, dtype)


@pytest.mark.parametrize("n", [64, 61, 8, 5])
def test_filter_matches_sequential(mesh, n):
    lgssm, y = _problem(n, b=3)
    oracle = kalman_filter(lgssm, y)
    res = make_sharded_filter(mesh)(lgssm, y)
    np.testing.assert_allclose(res.ll, oracle.ll, rtol=1e-9)
    np.testing.assert_allclose(res.m, oracle.m, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(res.P, oracle.P, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(res.S, oracle.S, rtol=1e-8)
    np.testing.assert_allclose(res.v, oracle.v, rtol=1e-8, atol=1e-10)


def test_decorrelate_and_logpdf(mesh):
    lgssm, y = _problem(40)
    ll_o, a_o = decorrelate(lgssm, y)
    ll_s, a_s = make_sharded_decorrelate(mesh)(lgssm, y)
    np.testing.assert_allclose(ll_s, ll_o, rtol=1e-9)
    np.testing.assert_allclose(a_s, a_o, rtol=1e-8, atol=1e-10)
    lp = make_sharded_logpdf(mesh)(lgssm, y)
    np.testing.assert_allclose(lp, ll_o, rtol=1e-9)
    # whitening identity: sum(alpha^2) = y^T Sigma^-1 y (via oracle)
    np.testing.assert_allclose(jnp.sum(a_s**2), jnp.sum(a_o**2), rtol=1e-9)


def test_dtc_objective_with_sharded_filter(mesh):
    """The whole DTC bound trains against a genuinely time-sharded filter."""
    rng = np.random.default_rng(1)
    n, m, d = 48, 6, 2
    t = np.sort(rng.uniform(0, 2, size=n))
    X = rng.normal(size=(n, d))
    y = rng.normal(size=n)
    Z = X[:m]
    time_k = Matern32(lengthscale=0.5, variance=1.0)
    out_k = Matern52(lengthscale=1.1, variance=0.8)
    lgssm = lgssm_of(time_k, jnp.asarray(t), 0.05, jnp.float64)
    ref = dtc_objective(out_k, lgssm, X, Z, y)
    got = dtc_objective(out_k, lgssm, X, Z, y, filter_fn=make_sharded_filter(mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-8)


@pytest.mark.parametrize("n,b", [(64, 3), (61, 2), (40, 0), (5, 0)])
def test_smoother_matches_sequential(mesh, n, b):
    lgssm, y = _problem(n, b=b, seed=3)
    oracle = rts_smooth(lgssm, y)
    res = make_sharded_smooth(mesh)(lgssm, y)
    np.testing.assert_allclose(res.mean, oracle.mean, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(res.var, oracle.var, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(res.ms, oracle.ms, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(res.Ps, oracle.Ps, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(res.ll, oracle.ll, rtol=1e-9)


def test_gradients_flow_through_sharded_filter(mesh):
    """value_and_grad through shard_map: hyperparameter optimization can run
    on the sequence-sharded path."""
    rng = np.random.default_rng(2)
    n = 32
    t = jnp.asarray(np.sort(rng.uniform(0, 2, size=n)))
    y = jnp.asarray(rng.normal(size=n))
    lp = make_sharded_logpdf(mesh)

    def nll(log_l):
        k = Matern52(lengthscale=jnp.exp(log_l), variance=1.0)
        return -lp(lgssm_of(k, t, 0.1, jnp.float64), y)

    def nll_seq(log_l):
        from gpar_at_scale_tpu.ssm.kalman import logpdf

        k = Matern52(lengthscale=jnp.exp(log_l), variance=1.0)
        return -logpdf(lgssm_of(k, t, 0.1, jnp.float64), y)

    v, g = jax.value_and_grad(nll)(jnp.asarray(0.3))
    v2, g2 = jax.value_and_grad(nll_seq)(jnp.asarray(0.3))
    np.testing.assert_allclose(v, v2, rtol=1e-9)
    np.testing.assert_allclose(g, g2, rtol=1e-6)
