"""Segmented (streaming) blocked engine == the sequential oracle.

The segment carries must be EXACT: the filter injects the previous
segment's filtered state into the phase-2 prefix; the smoother injects the
later segment's first smoothed state as the suffix scan's terminal element
(``ssm/segmented.py`` — the bounded-compile-plan execution mode measured in
r4).  Covers ragged tails, batched columns, and sum-kernel general H.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.kernels import Matern12, Matern32, Matern52
from gpar_at_scale_tpu.ssm.kalman import decorrelate, kalman_filter, logpdf, rts_smooth
from gpar_at_scale_tpu.ssm.markov import lgssm_of
from gpar_at_scale_tpu.ssm.segmented import (
    segmented_decorrelate,
    segmented_filter,
    segmented_logpdf,
    segmented_smooth,
)

FAMS = [Matern12, Matern32, Matern52]


def _case(rng, n=137, family=Matern52, nv=0.1):
    t = jnp.array(np.sort(rng.uniform(0, 8, size=n)))
    y = jnp.array(np.sin(np.asarray(t) * 1.3) + 0.3 * rng.normal(size=n))
    k = family(lengthscale=0.8, variance=1.2)
    return lgssm_of(k, t, nv), y


@pytest.mark.parametrize("family", FAMS)
@pytest.mark.parametrize("n,seg", [(137, 50), (120, 40), (64, 64), (30, 7)])
def test_segmented_filter_matches_sequential(family, n, seg, rng):
    """Exact FilterResult parity across segment boundaries incl. ragged
    tails (137 % 50 != 0) and single-segment (64 == 64)."""
    lgssm, y = _case(rng, n=n, family=family)
    ref = kalman_filter(lgssm, y)
    out = segmented_filter(lgssm, y, segment_size=seg, num_blocks=8)
    np.testing.assert_allclose(out.m, ref.m, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(out.P, ref.P, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(out.mp, ref.mp, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(out.Pp, ref.Pp, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(out.S, ref.S, rtol=1e-8)
    np.testing.assert_allclose(out.v, ref.v, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(out.ll, ref.ll, rtol=1e-9)


def test_segmented_logpdf_and_decorrelate(rng):
    lgssm, y = _case(rng, n=101)
    np.testing.assert_allclose(
        float(segmented_logpdf(lgssm, y, segment_size=33, num_blocks=8)),
        float(logpdf(lgssm, y)),
        rtol=1e-9,
    )
    ll_s, a_s = segmented_decorrelate(lgssm, y, segment_size=33, num_blocks=8)
    ll_r, a_r = decorrelate(lgssm, y)
    np.testing.assert_allclose(a_s, a_r, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(ll_s, ll_r, rtol=1e-9)


def test_segmented_filter_batched_columns(rng):
    """The DTC whitening shape: M+1 columns stream through segments."""
    lgssm, _ = _case(rng, n=90)
    Y = jnp.array(np.random.default_rng(3).normal(size=(90, 5)))
    out = segmented_filter(lgssm, Y, segment_size=28, num_blocks=8)
    ref = kalman_filter(lgssm, Y)
    np.testing.assert_allclose(out.v, ref.v, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(out.ll, ref.ll, rtol=1e-8)


@pytest.mark.parametrize("family", FAMS)
@pytest.mark.parametrize("n,seg", [(137, 50), (48, 13)])
def test_segmented_smoother_matches_sequential(family, n, seg, rng):
    """Backward carry across segments: smoothed moments equal the one-shot
    RTS smoother everywhere, including at segment boundaries."""
    lgssm, y = _case(rng, n=n, family=family)
    ref = rts_smooth(lgssm, y)
    out = segmented_smooth(lgssm, y, segment_size=seg, num_blocks=8)
    np.testing.assert_allclose(out.mean, ref.mean, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(out.var, ref.var, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(out.ms, ref.ms, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(out.Ps, ref.Ps, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(out.ll, ref.ll, rtol=1e-9)


@pytest.mark.parametrize("n,seg", [(123, 40), (60, 60)])
def test_segmented_loglik_grad_matches_oneshot(n, seg, rng):
    """Segmented r/N adjoint recursions with boundary carries == the
    one-shot closed-form gradient (``blocked_grad.loglik_bwd``) == jax.grad
    — the training path past the single-dispatch plan ceiling."""
    import jax

    from gpar_at_scale_tpu.ssm.blocked import blocked_logpdf
    from gpar_at_scale_tpu.ssm.blocked_grad import loglik_bwd, loglik_fwd_aux
    from gpar_at_scale_tpu.ssm.segmented import segmented_loglik_grad

    lgssm, y = _case(rng, n=n)
    R = jnp.broadcast_to(lgssm.R, (n,))

    ll_ref, aux = loglik_fwd_aux(lgssm.A, lgssm.Q, R, lgssm.H, y, num_blocks=8)
    dA_r, dQ_r, dR_r, dy_r = loglik_bwd(lgssm.A, lgssm.Q, R, lgssm.H, aux, num_blocks=8)

    ll, dA, dQ, dR, dy = segmented_loglik_grad(lgssm, y, segment_size=seg, num_blocks=8)
    np.testing.assert_allclose(float(ll), float(ll_ref), rtol=1e-10)
    np.testing.assert_allclose(dA, dA_r, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(dQ, dQ_r, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(dR, dR_r, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(dy, dy_r, rtol=1e-7, atol=1e-10)

    # and against jax.grad end-to-end (dy channel)
    g_y = jax.grad(lambda yy: blocked_logpdf(lgssm, yy, num_blocks=8))(y)
    np.testing.assert_allclose(dy, g_y, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("n,seg", [(123, 40), (90, 90)])
def test_segmented_t_variants_match_oneshot(n, seg, rng):
    """Per-segment discretization (_t variants: no full-length (N, d, d)
    array anywhere) == prebuilt-LGSSM results, for filter and smoother."""
    from gpar_at_scale_tpu.ssm.segmented import (
        segmented_decorrelate_t,
        segmented_filter_t,
        segmented_smooth_t,
    )

    t = jnp.array(np.sort(rng.uniform(0, 8, size=n)))
    y = jnp.array(np.sin(np.asarray(t) * 1.3) + 0.3 * rng.normal(size=n))
    k = Matern52(lengthscale=0.8, variance=1.2)
    lgssm = lgssm_of(k, t, 0.1)

    ref = kalman_filter(lgssm, y)
    out = segmented_filter_t(k, t, 0.1, y, segment_size=seg, num_blocks=8)
    np.testing.assert_allclose(out.m, ref.m, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(out.ll, ref.ll, rtol=1e-9)
    np.testing.assert_allclose(out.S, ref.S, rtol=1e-8)

    ll_t, a_t = segmented_decorrelate_t(k, t, 0.1, y, segment_size=seg, num_blocks=8)
    ll_r, a_r = decorrelate(lgssm, y)
    np.testing.assert_allclose(a_t, a_r, rtol=1e-7, atol=1e-10)

    ref_s = rts_smooth(lgssm, y)
    out_s = segmented_smooth_t(k, t, 0.1, y, segment_size=seg, num_blocks=8)
    np.testing.assert_allclose(out_s.mean, ref_s.mean, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(out_s.var, ref_s.var, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(out_s.Ps, ref_s.Ps, rtol=1e-6, atol=1e-9)


def test_make_segmented_nll_grad_matches_jax_grad(rng):
    """The fully-fused per-segment gradient factory (discretize + adjoints +
    pullback in one dispatch per segment) == jax.grad end-to-end."""
    import jax

    from gpar_at_scale_tpu.ssm.blocked import blocked_logpdf
    from gpar_at_scale_tpu.ssm.segmented import make_segmented_nll_grad

    n = 130
    t = jnp.array(np.sort(rng.uniform(0, 8, size=n)))
    y = jnp.array(np.sin(np.asarray(t) * 1.3) + 0.25 * rng.normal(size=n))

    def kernel_fn(p):
        return Matern52(lengthscale=jnp.exp(p[0]), variance=jnp.exp(p[1])), jnp.exp(p[2])

    grad_fn = make_segmented_nll_grad(kernel_fn, t, y, segment_size=41, num_blocks=8)
    p0 = jnp.array([0.2, -0.1, -1.5])
    ll, g = grad_fn(p0)

    def ref(p):
        k, nv = kernel_fn(p)
        return blocked_logpdf(lgssm_of(k, t, nv), y, num_blocks=8)

    ll_r, g_r = jax.value_and_grad(ref)(p0)
    np.testing.assert_allclose(float(ll), float(ll_r), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_r), rtol=1e-7, atol=1e-10)


def test_segmented_sum_kernel_general_H(rng):
    """d = 5 block-diagonal state, H = [1,0,1,0,0] across segments."""
    n = 77
    t = jnp.array(np.sort(rng.uniform(0, 8, size=n)))
    y = jnp.array(rng.normal(size=n))
    k = Matern32(lengthscale=0.5, variance=0.7) + Matern52(lengthscale=2.0, variance=0.4)
    lgssm = lgssm_of(k, t, 0.05)
    ref_f = kalman_filter(lgssm, y)
    out_f = segmented_filter(lgssm, y, segment_size=30, num_blocks=8)
    np.testing.assert_allclose(out_f.ll, ref_f.ll, rtol=1e-8)
    ref_s = rts_smooth(lgssm, y)
    out_s = segmented_smooth(lgssm, y, segment_size=30, num_blocks=8)
    np.testing.assert_allclose(out_s.mean, ref_s.mean, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(out_s.var, ref_s.var, rtol=1e-6, atol=1e-9)
