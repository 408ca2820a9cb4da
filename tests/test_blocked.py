"""Blocked two-pass XLA Kalman engine vs. the sequential oracle.

The production long-series engine (``ssm/blocked.py``): same filtering-element
monoid as the associative engine, scheduled as two streaming passes with a
B-way lockstep inner axis.  Covers: FilterResult parity (incl. padding when
N % B != 0 and N < B), batched columns, sum kernels (d > 3, general H),
smoother parity, and gradients through the whole engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.kernels import Matern12, Matern32, Matern52
from gpar_at_scale_tpu.ssm.blocked import (
    blocked_decorrelate,
    blocked_filter,
    blocked_logpdf,
    blocked_smooth,
)
from gpar_at_scale_tpu.ssm.kalman import decorrelate, kalman_filter, logpdf, rts_smooth
from gpar_at_scale_tpu.ssm.markov import lgssm_of

FAMS = [Matern12, Matern32, Matern52]


def _case(rng, n=50, family=Matern52, nv=0.1):
    t = jnp.array(np.sort(rng.uniform(0, 8, size=n)))
    y = jnp.array(rng.normal(size=n))
    k = family(lengthscale=0.8, variance=1.2)
    return lgssm_of(k, t, nv), y


@pytest.mark.parametrize("family", FAMS)
@pytest.mark.parametrize("n,B", [(50, 8), (64, 16), (37, 8), (5, 16)])
def test_blocked_filter_matches_sequential(family, n, B, rng):
    """Parity incl. ragged padding (37 % 8 != 0) and N < num_blocks."""
    lgssm, y = _case(rng, n=n, family=family)
    seq = kalman_filter(lgssm, y)
    blk = blocked_filter(lgssm, y, num_blocks=B)
    np.testing.assert_allclose(blk.m, seq.m, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(blk.P, seq.P, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(blk.mp, seq.mp, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(blk.Pp, seq.Pp, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(blk.S, seq.S, rtol=1e-8)
    np.testing.assert_allclose(blk.v, seq.v, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(blk.ll, seq.ll, rtol=1e-8)


def test_blocked_logpdf_and_decorrelate(rng):
    lgssm, y = _case(rng, n=64)
    np.testing.assert_allclose(
        blocked_logpdf(lgssm, y, num_blocks=8), logpdf(lgssm, y), rtol=1e-9
    )
    lml_b, a_b = blocked_decorrelate(lgssm, y, num_blocks=8)
    lml_s, a_s = decorrelate(lgssm, y)
    np.testing.assert_allclose(a_b, a_s, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(lml_b, lml_s, rtol=1e-9)


def test_blocked_batched_columns(rng):
    """The DTC whitening shape: M+1 columns share one pass (K6 fix)."""
    lgssm, _ = _case(rng, n=40)
    Y = jnp.array(np.random.default_rng(1).normal(size=(40, 6)))
    lml_b, a_b = blocked_decorrelate(lgssm, Y, num_blocks=8)
    lml_s, a_s = decorrelate(lgssm, Y)
    np.testing.assert_allclose(a_b, a_s, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(lml_b, lml_s, rtol=1e-8)


def test_blocked_sum_kernel_general_H(rng):
    """Sum-of-Matern SDE: d = 5 block-diagonal state, H = [1,0,1,0,0] — the
    case the Pallas kernels cannot express (they hard-code H = e1, d <= 3);
    the blocked XLA engine handles it directly."""
    n = 48
    t = jnp.array(np.sort(rng.uniform(0, 8, size=n)))
    y = jnp.array(rng.normal(size=n))
    k = Matern32(lengthscale=0.5, variance=0.7) + Matern52(lengthscale=2.0, variance=0.4)
    lgssm = lgssm_of(k, t, 0.05)
    assert lgssm.dim == 5
    seq = kalman_filter(lgssm, y)
    blk = blocked_filter(lgssm, y, num_blocks=8)
    np.testing.assert_allclose(blk.ll, seq.ll, rtol=1e-8)
    np.testing.assert_allclose(blk.m, seq.m, rtol=1e-6, atol=1e-9)
    bs = blocked_smooth(lgssm, y, num_blocks=8)
    ss = rts_smooth(lgssm, y)
    np.testing.assert_allclose(bs.mean, ss.mean, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(bs.var, ss.var, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("family", FAMS)
@pytest.mark.parametrize("n,B", [(45, 8), (33, 16)])
def test_blocked_smoother_matches_sequential(family, n, B, rng):
    lgssm, y = _case(rng, n=n, family=family)
    bs = blocked_smooth(lgssm, y, num_blocks=B)
    ss = rts_smooth(lgssm, y)
    np.testing.assert_allclose(bs.mean, ss.mean, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(bs.var, ss.var, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(bs.ms, ss.ms, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(bs.Ps, ss.Ps, rtol=1e-6, atol=1e-9)


def test_blocked_gradients_match_sequential(rng):
    """d NLML / d log-hyperparams through the blocked engine == through the
    sequential scan — the 1M-step training path is plain jax.grad."""
    n = 60
    t = jnp.array(np.sort(rng.uniform(0, 6, size=n)))
    y = jnp.array(np.sin(np.asarray(t)) + 0.1 * rng.normal(size=n))

    def nlml(p, engine):
        k = Matern52(lengthscale=jnp.exp(p[0]), variance=jnp.exp(p[1]))
        lg = lgssm_of(k, t, jnp.exp(p[2]))
        return -(engine(lg, y, num_blocks=8) if engine is blocked_logpdf else engine(lg, y))

    p0 = jnp.array([0.3, -0.2, -1.5])
    v_b, g_b = jax.value_and_grad(lambda p: nlml(p, blocked_logpdf))(p0)
    v_s, g_s = jax.value_and_grad(lambda p: nlml(p, logpdf))(p0)
    np.testing.assert_allclose(float(v_b), float(v_s), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_s), rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("family", FAMS)
def test_blocked_loglik_closed_form_vjp(family, rng):
    """The disturbance-smoother custom VJP (``ssm/blocked_grad.py``) ==
    jax.grad through the blocked engine, for hyperparameter gradients
    end-to-end through ``lgssm_of`` discretization."""
    from gpar_at_scale_tpu.ssm.blocked_grad import blocked_loglik

    n = 70
    t = jnp.array(np.sort(rng.uniform(0, 6, size=n)))
    y = jnp.array(np.sin(np.asarray(t) * 1.7) + 0.2 * rng.normal(size=n))

    def nll(p, engine):
        k = family(lengthscale=jnp.exp(p[0]), variance=jnp.exp(p[1]))
        lg = lgssm_of(k, t, jnp.exp(p[2]))
        return -engine(lg, y, num_blocks=8)

    p0 = jnp.array([0.2, -0.1, -1.2])
    v_c, g_c = jax.value_and_grad(lambda p: nll(p, blocked_loglik))(p0)
    v_a, g_a = jax.value_and_grad(lambda p: nll(p, blocked_logpdf))(p0)
    np.testing.assert_allclose(float(v_c), float(v_a), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_a), rtol=1e-7, atol=1e-10)


def test_blocked_loglik_vjp_general_H(rng):
    """Closed-form VJP with a sum-of-Matern SDE: d = 5, H = [1,0,1,0,0] —
    beyond what the Pallas disturbance-smoother path supports."""
    from gpar_at_scale_tpu.ssm.blocked_grad import blocked_loglik

    n = 40
    t = jnp.array(np.sort(rng.uniform(0, 8, size=n)))
    y = jnp.array(rng.normal(size=n))

    def nll(p, engine):
        k = Matern32(lengthscale=jnp.exp(p[0]), variance=0.7) + Matern52(
            lengthscale=2.0, variance=jnp.exp(p[1])
        )
        lg = lgssm_of(k, t, jnp.exp(p[2]))
        return -engine(lg, y, num_blocks=8)

    p0 = jnp.array([-0.4, -0.6, -2.0])
    g_c = jax.grad(lambda p: nll(p, blocked_loglik))(p0)
    g_a = jax.grad(lambda p: nll(p, blocked_logpdf))(p0)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_a), rtol=1e-7, atol=1e-10)


def test_split_fwd_bwd_matches_custom_vjp(rng):
    """The two separately-dispatchable halves (``loglik_fwd_aux`` +
    ``loglik_bwd`` + vjp through lgssm_of) == one-jit jax.grad — the
    million_grad --fisher execution scheme."""
    from gpar_at_scale_tpu.ssm.blocked_grad import loglik_bwd, loglik_fwd_aux

    n = 55
    t = jnp.array(np.sort(rng.uniform(0, 6, size=n)))
    y = jnp.array(np.sin(np.asarray(t)) + 0.1 * rng.normal(size=n))

    def arrays(p):
        k = Matern52(lengthscale=jnp.exp(p[0]), variance=jnp.exp(p[1]))
        lg = lgssm_of(k, t, jnp.exp(p[2]))
        return lg.A, lg.Q, jnp.broadcast_to(lg.R, (n,)), lg.H

    p0 = jnp.array([0.1, 0.3, -1.0])
    A, Q, R, H = arrays(p0)
    ll, aux = loglik_fwd_aux(A, Q, R, H, y, num_blocks=8)
    dA, dQ, dR, _ = loglik_bwd(A, Q, R, H, aux, num_blocks=8)
    _, vjp = jax.vjp(lambda p: arrays(p)[:3], p0)
    (g_split,) = vjp((dA, dQ, dR))

    def nll(p):
        k = Matern52(lengthscale=jnp.exp(p[0]), variance=jnp.exp(p[1]))
        return -blocked_logpdf(lgssm_of(k, t, jnp.exp(p[2])), y, num_blocks=8)

    v_a, g_a = jax.value_and_grad(nll)(p0)
    np.testing.assert_allclose(float(-ll), float(v_a), rtol=1e-10)
    np.testing.assert_allclose(-np.asarray(g_split), np.asarray(g_a), rtol=1e-7, atol=1e-10)


def test_whiten_gram_blocked_matches_autodiff(rng):
    """Batched-column closed-form VJP (``blocked_grad.whiten_gram``) ==
    jax.grad through the batched blocked filter — the gradient engine behind
    million-step scaled-GPAR DTC training (``benchmarks/million_dtc.py``).
    Checks both hyperparameter cotangents (through lgssm_of discretization)
    and the column-stack cotangent ct_U."""
    from gpar_at_scale_tpu.ssm.blocked_grad import whiten_gram

    n, B = 45, 5
    t = jnp.array(np.sort(rng.uniform(0, 6, size=n)))
    U = jnp.array(rng.normal(size=(n, B)))
    Wt = jnp.array(rng.normal(size=(B, B)))  # arbitrary (asymmetric) cotangent

    def arrays(p):
        k = Matern52(lengthscale=jnp.exp(p[0]), variance=jnp.exp(p[1]))
        return lgssm_of(k, t, jnp.exp(p[2]))

    def via_custom(p, Ucols):
        G, ld = whiten_gram(arrays(p), Ucols, num_blocks=8)
        return jnp.sum(G * Wt) + 0.7 * ld

    def via_autodiff(p, Ucols):
        res = blocked_filter(arrays(p), Ucols, num_blocks=8)
        white = res.v / jnp.sqrt(res.S)[:, None]
        return jnp.sum((white.T @ white) * Wt) + 0.7 * jnp.sum(jnp.log(res.S))

    p0 = jnp.array([0.2, -0.3, -1.1])
    v_c, (gp_c, gU_c) = jax.value_and_grad(via_custom, argnums=(0, 1))(p0, U)
    v_a, (gp_a, gU_a) = jax.value_and_grad(via_autodiff, argnums=(0, 1))(p0, U)
    np.testing.assert_allclose(float(v_c), float(v_a), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gp_c), np.asarray(gp_a), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gU_c), np.asarray(gU_a), rtol=1e-7, atol=1e-10)


def test_whiten_gram_blocked_general_H(rng):
    """whiten_gram on a sum-of-Matern SDE (d = 5, H = [1,0,1,0,0]) — the
    batched closed-form VJP is not limited to the Pallas path's d <= 3."""
    from gpar_at_scale_tpu.ssm.blocked_grad import whiten_gram

    n, B = 36, 4
    t = jnp.array(np.sort(rng.uniform(0, 8, size=n)))
    U = jnp.array(rng.normal(size=(n, B)))
    Wt = jnp.array(rng.normal(size=(B, B)))

    def arrays(p):
        k = Matern32(lengthscale=jnp.exp(p[0]), variance=0.7) + Matern52(
            lengthscale=2.0, variance=jnp.exp(p[1])
        )
        return lgssm_of(k, t, jnp.exp(p[2]))

    def via_custom(p):
        G, ld = whiten_gram(arrays(p), U, num_blocks=8)
        return jnp.sum(G * Wt) + 1.3 * ld

    def via_autodiff(p):
        res = blocked_filter(arrays(p), U, num_blocks=8)
        white = res.v / jnp.sqrt(res.S)[:, None]
        return jnp.sum((white.T @ white) * Wt) + 1.3 * jnp.sum(jnp.log(res.S))

    p0 = jnp.array([-0.4, -0.6, -2.0])
    g_c = jax.grad(via_custom)(p0)
    g_a = jax.grad(via_autodiff)(p0)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_a), rtol=1e-7, atol=1e-10)


def test_whiten_split_halves_match_custom_vjp(rng):
    """``whiten_fwd_aux`` + ``whiten_bwd`` as separate dispatches == the
    one-jit custom VJP — the million_dtc staged execution scheme."""
    from gpar_at_scale_tpu.ssm.blocked_grad import (
        whiten_bwd,
        whiten_fwd_aux,
        whiten_gram,
    )

    n, B = 40, 3
    t = jnp.array(np.sort(rng.uniform(0, 5, size=n)))
    U = jnp.array(rng.normal(size=(n, B)))
    Wt = jnp.array(rng.normal(size=(B, B)))
    lg = lgssm_of(Matern52(lengthscale=0.9, variance=1.1), t, 0.07)
    A, Q, H = lg.A, lg.Q, lg.H
    R = jnp.broadcast_to(lg.R, (n,))

    G, ld, aux = whiten_fwd_aux(A, Q, R, H, U, num_blocks=8)
    ct_A, ct_Q, ct_R, ct_U = whiten_bwd(A, Q, R, H, aux, Wt, jnp.asarray(0.7), num_blocks=8)

    def via_custom(A_, Q_, R_, U_):
        from gpar_at_scale_tpu.ssm.markov import LGSSM

        G2, ld2 = whiten_gram(LGSSM(A=A_, Q=Q_, H=H, R=R_), U_, num_blocks=8)
        return jnp.sum(G2 * Wt) + 0.7 * ld2

    gA, gQ, gR, gU = jax.grad(via_custom, argnums=(0, 1, 2, 3))(A, Q, R, U)
    # grad symmetrizes ct_G internally; whiten_bwd receives raw Wt and
    # symmetrizes identically.
    np.testing.assert_allclose(np.asarray(ct_A), np.asarray(gA), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ct_Q), np.asarray(gQ), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ct_R), np.asarray(gR), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ct_U), np.asarray(gU), rtol=1e-8, atol=1e-12)


def test_blocked_smoother_gradients(rng):
    """Gradients through the blocked smoother (prediction-path training)."""
    n = 30
    t = jnp.array(np.sort(rng.uniform(0, 6, size=n)))
    y = jnp.array(np.sin(np.asarray(t)) + 0.1 * rng.normal(size=n))

    def loss(p, smoother):
        k = Matern52(lengthscale=jnp.exp(p[0]), variance=jnp.exp(p[1]))
        lg = lgssm_of(k, t, jnp.exp(p[2]))
        kw = {"num_blocks": 8} if smoother is blocked_smooth else {}
        sm = smoother(lg, y, **kw)
        return jnp.sum(sm.mean**2) + jnp.sum(sm.var)

    p0 = jnp.array([0.1, 0.2, -1.0])
    g_b = jax.grad(lambda p: loss(p, blocked_smooth))(p0)
    g_s = jax.grad(lambda p: loss(p, rts_smooth))(p0)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_s), rtol=1e-6, atol=1e-9)
