"""Associative-scan Kalman engine vs. the sequential oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.kernels import Matern12, Matern32, Matern52
from gpar_at_scale_tpu.ssm.kalman import decorrelate, kalman_filter, logpdf, rts_smooth
from gpar_at_scale_tpu.ssm.markov import lgssm_of
from gpar_at_scale_tpu.ssm.pkalman import (
    parallel_decorrelate,
    parallel_filter,
    parallel_logpdf,
    parallel_smooth,
)

FAMS = [Matern12, Matern32, Matern52]


def _case(rng, n=50, family=Matern52, nv=0.1):
    t = jnp.array(np.sort(rng.uniform(0, 8, size=n)))
    y = jnp.array(rng.normal(size=n))
    k = family(lengthscale=0.8, variance=1.2)
    return lgssm_of(k, t, nv), y


@pytest.mark.parametrize("family", FAMS)
def test_parallel_filter_matches_sequential(family, rng):
    lgssm, y = _case(rng, family=family)
    seq = kalman_filter(lgssm, y)
    par = parallel_filter(lgssm, y)
    np.testing.assert_allclose(par.m, seq.m, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(par.P, seq.P, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(par.S, seq.S, rtol=1e-8)
    np.testing.assert_allclose(par.ll, seq.ll, rtol=1e-8)


def test_parallel_logpdf_and_decorrelate(rng):
    lgssm, y = _case(rng, n=64)
    np.testing.assert_allclose(parallel_logpdf(lgssm, y), logpdf(lgssm, y), rtol=1e-9)
    lml_p, a_p = parallel_decorrelate(lgssm, y)
    lml_s, a_s = decorrelate(lgssm, y)
    np.testing.assert_allclose(a_p, a_s, rtol=1e-7, atol=1e-10)


def test_parallel_batched_columns(rng):
    lgssm, _ = _case(rng, n=40)
    Y = jnp.array(np.random.default_rng(1).normal(size=(40, 6)))
    lml_p, a_p = parallel_decorrelate(lgssm, Y)
    lml_s, a_s = decorrelate(lgssm, Y)
    np.testing.assert_allclose(a_p, a_s, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(lml_p, lml_s, rtol=1e-8)


@pytest.mark.parametrize("family", FAMS)
def test_parallel_smoother_matches_sequential(family, rng):
    lgssm, y = _case(rng, n=45, family=family)
    ps = parallel_smooth(lgssm, y)
    ss = rts_smooth(lgssm, y)
    np.testing.assert_allclose(ps.mean, ss.mean, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ps.var, ss.var, rtol=1e-6, atol=1e-9)


def test_parallel_smoother_heterogeneous_noise_splice(rng):
    """The infinite-noise prediction trick must survive the parallel path."""
    t = np.sort(rng.uniform(0, 5, size=60))
    nv = np.where(np.arange(60) % 3 == 0, 1e10, 0.05)
    y = np.where(np.arange(60) % 3 == 0, 0.0, np.sin(t))
    k = Matern52(lengthscale=1.0, variance=1.0)
    lgssm = lgssm_of(k, jnp.array(t), jnp.array(nv))
    ps = parallel_smooth(lgssm, jnp.array(y))
    ss = rts_smooth(lgssm, jnp.array(y))
    np.testing.assert_allclose(ps.mean, ss.mean, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(ps.var, ss.var, rtol=1e-5, atol=1e-8)


def test_parallel_long_series_f64(rng):
    """Longer series: lml per point stays consistent with sequential."""
    lgssm, y = _case(rng, n=2000)
    np.testing.assert_allclose(
        parallel_logpdf(lgssm, y), logpdf(lgssm, y), rtol=1e-8
    )


def test_parallel_gradients_flow(rng):
    t = jnp.array(np.sort(rng.uniform(0, 5, size=30)))
    y = jnp.array(rng.normal(size=30))

    def nlml(log_l):
        k = Matern52(lengthscale=jnp.exp(log_l), variance=1.0)
        return -parallel_logpdf(lgssm_of(k, t, 0.1), y)

    g = jax.grad(nlml)(jnp.array(0.0))
    assert np.isfinite(g) and abs(g) > 0
