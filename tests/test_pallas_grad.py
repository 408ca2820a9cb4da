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


# ---------------------------------------------------------------------------
# Batched whitened-Gram VJP (the differentiable Pallas DTC training path)
# ---------------------------------------------------------------------------


def _gram_case(rng, n=220, b=5):
    t = np.cumsum(rng.uniform(0.2, 1.2, n)) / 20.0
    U = rng.normal(size=(n, b))
    return jnp.asarray(t, jnp.float32), jnp.asarray(U, jnp.float32)


def _gram_seq(A, Q, R, U, H):
    """Differentiable sequential-filter oracle for (G, logdet)."""
    from gpar_at_scale_tpu.ssm.kalman import kalman_filter
    from gpar_at_scale_tpu.ssm.markov import LGSSM

    res = kalman_filter(LGSSM(A=A, Q=Q, H=H, R=R), U)
    white = res.v / jnp.sqrt(res.S)[:, None]
    return white.T @ white, jnp.sum(jnp.log(res.S))


@pytest.mark.parametrize(
    "family", [Matern12, Matern32, Matern52], ids=["m12", "m32", "m52"]
)
def test_whiten_gram_value_matches_dense(rng, family):
    from gpar_at_scale_tpu.ops.pallas_grad import whiten_gram

    t, U = _gram_case(rng)
    k = family(lengthscale=0.8, variance=0.9)
    lg = lgssm_of(k, t, 0.2**2, jnp.float32)
    G, logdet = whiten_gram(lg, U)

    t64 = np.asarray(t, np.float64)
    Sigma = np.asarray(k(jnp.asarray(t64)[:, None]), np.float64) + 0.2**2 * np.eye(len(t))
    Si = np.linalg.inv(Sigma)
    G_d = np.asarray(U, np.float64).T @ Si @ np.asarray(U, np.float64)
    scale = np.max(np.abs(G_d))
    np.testing.assert_allclose(np.asarray(G) / scale, G_d / scale, atol=2e-4)
    np.testing.assert_allclose(
        float(logdet), np.linalg.slogdet(Sigma)[1], rtol=1e-4
    )


def test_whiten_gram_gradients_match_autodiff(rng):
    """VJP w.r.t. raw (A, Q, R, U) vs autodiff of the sequential filter
    Gram — the VERDICT r2 done-criterion for differentiable Pallas DTC."""
    from gpar_at_scale_tpu.ops.pallas_grad import _whiten_gram_p

    t, U = _gram_case(rng, n=180, b=4)
    lg = lgssm_of(Matern52(lengthscale=0.9, variance=0.7), t, 0.15, jnp.float32)
    A, Q, R = lg.A, lg.Q, lg.R

    ct_G = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
    ct_ld = jnp.asarray(0.7, jnp.float32)

    def loss_p(A, Q, R, U):
        G, ld = _whiten_gram_p(A, Q, R, U)
        return jnp.sum(G * ct_G) + ct_ld * ld

    def loss_s(A, Q, R, U):
        G, ld = _gram_seq(A, Q, R, U, lg.H)
        return jnp.sum(G * ct_G) + ct_ld * ld

    v_p = float(loss_p(A, Q, R, U))
    v_s = float(loss_s(A, Q, R, U))
    np.testing.assert_allclose(v_p, v_s, rtol=1e-4)

    g_p = jax.grad(loss_p, argnums=(0, 1, 2, 3))(A, Q, R, U)
    g_s = jax.grad(loss_s, argnums=(0, 1, 2, 3))(A, Q, R, U)
    sym = lambda M: 0.5 * (M + np.swapaxes(M, -1, -2))
    for i, (gp, gs) in enumerate(zip(g_p, g_s)):
        gp, gs = np.asarray(gp), np.asarray(gs)
        if i == 1:  # Q cotangent: symmetric part only
            gp, gs = sym(gp), sym(gs)
        scale = np.max(np.abs(gs)) + 1e-6
        np.testing.assert_allclose(gp / scale, gs / scale, atol=3e-3)


def test_dtc_pallas_trains_end_to_end(rng):
    """filter_fn='pallas' carries exact hyperparameter gradients through the
    DTC bound (gradcheck vs the sequential engine, f32)."""
    from gpar_at_scale_tpu.gp.dtc import dtc_objective
    from gpar_at_scale_tpu.utils.params import unpack_gpar

    n, m, d = 150, 12, 2
    t = jnp.asarray(np.cumsum(rng.uniform(0.2, 1.0, n)) / 10.0, jnp.float32)
    V = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    Z = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(t)) + 0.2 * rng.normal(size=n), jnp.float32)

    def nlml(p, impl):
        tl, ts, ol, osig, ns = unpack_gpar(p)
        time_k = Matern52(lengthscale=tl, variance=ts**2)
        out_k = Matern52(lengthscale=ol, variance=osig**2)
        lg = lgssm_of(time_k, t, ns**2, jnp.float32)
        return -dtc_objective(out_k, lg, V, Z, y, uu_ridge=ns**2, filter_fn=impl)

    p0 = jnp.asarray([0.1, -0.2, 0.3, -0.1, -1.2], jnp.float32)
    v_p, g_p = jax.value_and_grad(lambda p: nlml(p, "pallas"))(p0)
    v_s, g_s = jax.value_and_grad(lambda p: nlml(p, None))(p0)
    np.testing.assert_allclose(float(v_p), float(v_s), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_s), rtol=1e-3, atol=2e-3
    )


def test_pallas_sum_kernel_dispatches(rng):
    """Sum-of-Matern time kernels (H != e1 or d > 3) train under the
    'pallas' entry points by dispatching to the associative engine
    (VERDICT r1 item 7; kernel sums at ``src/gp/optimized.jl:132-144``)."""
    from gpar_at_scale_tpu.gp.dtc import dtc_objective
    from gpar_at_scale_tpu.ops.pallas_kalman import pallas_decorrelate, pallas_supported

    n, m = 90, 8
    t = jnp.asarray(np.cumsum(rng.uniform(0.2, 1.0, n)) / 10.0, jnp.float32)
    V = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    Z = jnp.asarray(rng.normal(size=(m, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)

    time_k = Matern32(lengthscale=0.7, variance=0.8) + Matern52(
        lengthscale=2.0, variance=0.4
    )
    lg = lgssm_of(time_k, t, 0.1, jnp.float32)
    assert not pallas_supported(lg)

    # decorrelate contract via the fallback
    ll, alpha, logdet = pallas_decorrelate(lg, y)
    from gpar_at_scale_tpu.ssm.kalman import decorrelate

    ll_s, alpha_s = decorrelate(lg, y)
    np.testing.assert_allclose(float(ll), float(ll_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_s), atol=1e-3)

    # DTC bound trains (value + grad finite, matches sequential)
    out_k = Matern52(lengthscale=1.0, variance=0.7)

    def nlml(v, impl):
        k = Matern52(lengthscale=1.0, variance=v)
        return -dtc_objective(k, lg, V, Z, y, uu_ridge=0.1, filter_fn=impl)

    v_p, g_p = jax.value_and_grad(lambda v: nlml(v, "pallas"))(jnp.float32(0.7))
    v_s, g_s = jax.value_and_grad(lambda v: nlml(v, None))(jnp.float32(0.7))
    np.testing.assert_allclose(float(v_p), float(v_s), rtol=1e-5)
    np.testing.assert_allclose(float(g_p), float(g_s), rtol=1e-3)
