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


def test_chunked_decorrelate_matches_single_launch(rng):
    """pallas_decorrelate_chunked threads the combined filtering element
    across segments; any chunking must reproduce the single-launch result
    (and the sequential oracle) exactly up to f32 roundoff."""
    import jax.numpy as jnp
    import numpy as np

    from gpar_at_scale_tpu.kernels import Matern52
    from gpar_at_scale_tpu.ops.pallas_kalman import (
        LANES,
        pallas_decorrelate,
        pallas_decorrelate_chunked,
    )
    from gpar_at_scale_tpu.ssm.kalman import decorrelate
    from gpar_at_scale_tpu.ssm.markov import lgssm_of

    n = 2 * LANES + 517  # forces 3 chunks at chunk_size=LANES, last padded
    t = jnp.asarray(np.sort(rng.uniform(0, 60, n)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(t)) + 0.3 * rng.normal(size=n), jnp.float32)
    k = Matern52(lengthscale=1.3, variance=0.8)
    lg = lgssm_of(k, t, 0.09, jnp.float32)

    ll1, a1, ld1 = pallas_decorrelate(lg, y, interpret=True)
    llc, ac, ldc = pallas_decorrelate_chunked(lg, y, chunk_size=LANES, interpret=True)
    np.testing.assert_allclose(float(llc), float(ll1), rtol=2e-5)
    np.testing.assert_allclose(float(ldc), float(ld1), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ac), np.asarray(a1), rtol=2e-4, atol=2e-4)

    ll_s, alpha_s = decorrelate(lg, y)
    np.testing.assert_allclose(float(llc), float(ll_s), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(ac), np.asarray(alpha_s), rtol=2e-3, atol=2e-3)
