"""Disturbance-smoother custom VJP for the Pallas filter.

Gradients of the blocked-scan log-likelihood must match JAX autodiff of the
sequential ``lax.scan`` filter for all Matern state dims d = 1, 2, 3 — the
De Jong/Koopman r/N adjoint never inverts Q, so it is f32-stable where the
EM/Fisher identity was not (Q_k is near-singular at small time gaps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.kernels import Matern12, Matern32, Matern52
from gpar_at_scale_tpu.ops.pallas_grad import lgssm_loglik, logpdf_markov_pallas
from gpar_at_scale_tpu.ssm.kalman import logpdf
from gpar_at_scale_tpu.ssm.markov import lgssm_of
from gpar_at_scale_tpu.utils.params import unpack_gp


def _case(rng, n=700):
    t = np.cumsum(rng.uniform(0.2, 1.2, n)) / 20.0
    y = np.sin(t) + 0.3 * rng.normal(size=n)
    return jnp.asarray(t, jnp.float32), jnp.asarray(y, jnp.float32)


@pytest.mark.parametrize(
    "family,rtol",
    [(Matern12, 1e-4), (Matern32, 2e-3), (Matern52, 5e-3)],
    ids=["matern12", "matern32", "matern52"],
)
def test_hyperparam_gradients_match_autodiff(rng, family, rtol):
    t, y = _case(rng)

    def nll_p(p):
        l, sf, sn = unpack_gp(p)
        return -logpdf_markov_pallas(family(lengthscale=l, variance=sf**2), t, sn**2, y)

    def nll_s(p):
        l, sf, sn = unpack_gp(p)
        return -logpdf(
            lgssm_of(family(lengthscale=l, variance=sf**2), t, sn**2, jnp.float32), y
        )

    p0 = jnp.asarray([0.1, -0.2, -1.0], jnp.float32)
    v1, g1 = jax.value_and_grad(nll_p)(p0)
    v2, g2 = jax.value_and_grad(nll_s)(p0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=rtol, atol=1e-3)


def test_raw_aqry_gradients_match_autodiff(rng):
    """Gradients w.r.t. the raw per-step (A, Q, R, y) arrays, d = 3."""
    t, y = _case(rng, n=300)
    lg = lgssm_of(Matern52(lengthscale=0.9, variance=0.7), t, 0.15, jnp.float32)
    A, Q, R = lg.A, lg.Q, lg.R

    g_p = jax.grad(lgssm_loglik, argnums=(0, 1, 2, 3))(A, Q, R, y)

    from gpar_at_scale_tpu.ssm.markov import LGSSM

    def ll_seq(A, Q, R, y):
        return logpdf(LGSSM(A=A, Q=Q, H=lg.H, R=R), y)

    g_s = jax.grad(ll_seq, argnums=(0, 1, 2, 3))(A, Q, R, y)

    # Q cotangents: only the symmetric part is meaningful (upstream dQ is
    # always symmetric); compare sym parts.
    sym = lambda M: 0.5 * (M + np.swapaxes(M, -1, -2))
    for i, (gp, gs) in enumerate(zip(g_p, g_s)):
        gp, gs = np.asarray(gp), np.asarray(gs)
        if i == 1:
            gp, gs = sym(gp), sym(gs)
        scale = np.max(np.abs(gs)) + 1e-6
        np.testing.assert_allclose(gp / scale, gs / scale, atol=2e-3)


def test_value_unchanged_by_vjp_wrapper(rng):
    t, y = _case(rng)
    k = Matern52(lengthscale=1.1, variance=0.64)
    v1 = float(logpdf_markov_pallas(k, t, 0.37**2, y))
    v2 = float(logpdf(lgssm_of(k, t, 0.37**2, jnp.float32), y))
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
