"""Pallas blocked-scan RTS smoother vs. the sequential engine (interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.kernels import Matern12, Matern32, Matern52
from gpar_at_scale_tpu.ops.pallas_smoother import pallas_smooth
from gpar_at_scale_tpu.ssm.kalman import rts_smooth
from gpar_at_scale_tpu.ssm.markov import lgssm_of


@pytest.mark.parametrize("family,n", [(Matern12, 1300), (Matern32, 900), (Matern52, 2100)])
def test_pallas_smooth_matches_sequential(family, n, rng):
    t = jnp.asarray(np.cumsum(rng.uniform(0.1, 1.0, n)) / 50.0, jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(t)) + 0.3 * rng.normal(size=n), jnp.float32)
    k = family(lengthscale=1.0, variance=1.0)
    lg = lgssm_of(k, t, 0.1, jnp.float32)
    ref = rts_smooth(lg, y)
    fm, fv, ll = pallas_smooth(lg, y, interpret=True)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(ref.mean), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(ref.var), atol=2e-5)
    np.testing.assert_allclose(float(ll), float(ref.ll[0]), rtol=2e-5)


def test_pallas_smooth_noise_splice_prediction(rng):
    """Infinite-noise splice (prediction at unobserved points) through the
    blocked-scan smoother."""
    n = 600
    t = np.sort(rng.uniform(0, 5, n))
    nv = np.where(np.arange(n) % 4 == 0, 1e10, 0.05).astype(np.float32)
    y = np.where(np.arange(n) % 4 == 0, 0.0, np.sin(t)).astype(np.float32)
    k = Matern52(lengthscale=1.0, variance=1.0)
    lg = lgssm_of(k, jnp.asarray(t, jnp.float32), jnp.asarray(nv), jnp.float32)
    ref = rts_smooth(lg, jnp.asarray(y))
    fm, fv, _ = pallas_smooth(lg, jnp.asarray(y), interpret=True)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(ref.mean), atol=5e-5)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(ref.var), atol=5e-5)
