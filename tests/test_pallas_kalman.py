"""Pallas blocked-scan Kalman filter vs. the sequential engine (interpret
mode on CPU; the compiled path is exercised on hardware by
benchmarks/long_series.py and bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.kernels import Matern12, Matern32, Matern52
from gpar_at_scale_tpu.ops.pallas_kalman import pallas_decorrelate
from gpar_at_scale_tpu.ssm.kalman import decorrelate, kalman_filter
from gpar_at_scale_tpu.ssm.markov import lgssm_of


@pytest.mark.parametrize("family,n", [(Matern12, 2500), (Matern32, 1500), (Matern52, 2100)])
def test_pallas_decorrelate_matches_sequential(family, n, rng):
    t = jnp.asarray(np.cumsum(rng.uniform(0.1, 1.0, n)) / 50.0, jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    k = family(lengthscale=1.0, variance=1.0)
    lg = lgssm_of(k, t, 0.1, jnp.float32)

    ll_ref, a_ref = decorrelate(lg, y)
    logdet_ref = jnp.sum(jnp.log(kalman_filter(lg, y).S))
    ll_p, a_p, logdet_p = pallas_decorrelate(lg, y, interpret=True)

    np.testing.assert_allclose(float(ll_p), float(ll_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_ref), atol=5e-5)
    np.testing.assert_allclose(float(logdet_p), float(logdet_ref), rtol=1e-5)


def test_pallas_short_series_padding(rng):
    """n << LANES: mostly padded lanes must not contaminate the result."""
    n = 37
    t = jnp.asarray(np.sort(rng.uniform(0, 3, n)), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    k = Matern52(lengthscale=0.7, variance=1.2)
    lg = lgssm_of(k, t, 0.2, jnp.float32)
    ll_ref, a_ref = decorrelate(lg, y)
    ll_p, a_p, _ = pallas_decorrelate(lg, y, interpret=True)
    np.testing.assert_allclose(float(ll_p), float(ll_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_ref), atol=5e-5)
