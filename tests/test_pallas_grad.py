"""Fisher-identity custom VJP for the Pallas filter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.kernels import Matern12, Matern52
from gpar_at_scale_tpu.ops.pallas_grad import logpdf_markov_pallas
from gpar_at_scale_tpu.ssm.kalman import logpdf
from gpar_at_scale_tpu.ssm.markov import lgssm_of
from gpar_at_scale_tpu.utils.params import unpack_gp


def _case(rng, n=700):
    t = np.cumsum(rng.uniform(0.2, 1.2, n)) / 20.0
    y = np.sin(t) + 0.3 * rng.normal(size=n)
    return jnp.asarray(t, jnp.float32), jnp.asarray(y, jnp.float32)


def test_matern12_gradients_match_autodiff(rng):
    t, y = _case(rng)

    def nll_p(p):
        l, sf, sn = unpack_gp(p)
        return -logpdf_markov_pallas(Matern12(lengthscale=l, variance=sf**2), t, sn**2, y)

    def nll_s(p):
        l, sf, sn = unpack_gp(p)
        return -logpdf(lgssm_of(Matern12(lengthscale=l, variance=sf**2), t, sn**2, jnp.float32), y)

    p0 = jnp.asarray([0.1, -0.2, -1.0], jnp.float32)
    v1, g1 = jax.value_and_grad(nll_p)(p0)
    v2, g2 = jax.value_and_grad(nll_s)(p0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4)


def test_matern52_value_matches_but_grads_documented_unstable(rng):
    """d = 3: the VALUE is exact; the EM-identity gradient is documented as
    unreliable in f32 (Q^-1 cancellation) — assert only the value here."""
    t, y = _case(rng)
    l, sf, sn = 1.1, 0.8, 0.37
    k = Matern52(lengthscale=l, variance=sf**2)
    v1 = float(logpdf_markov_pallas(k, t, sn**2, y))
    v2 = float(logpdf(lgssm_of(k, t, sn**2, jnp.float32), y))
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
