"""FFBS posterior sampling on the blocked/segmented engines.

``posterior_rand`` (reference ``src/gp/tmp.jl:167``) at production scale:
the backward-sampling conditionals are the smoothing elements, so a joint
draw is ONE affine suffix scan with pre-drawn noises (``ssm/blocked.py``
FFBS section).  Covers: bitwise parity with the plain sequential FFBS
recursion given the same noises, segmented == blocked given the same
noises (incl. ragged segment tails), and distributional agreement of the
sample moments with the RTS smoother (the r4 verdict's "CPU test asserting
agreement with sequential FFBS moments").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.kernels import Matern32, Matern52
from gpar_at_scale_tpu.ssm.blocked import (
    _chol_floor,
    _smoother_elements_fast,
    blocked_filter,
    blocked_posterior_sample,
    blocked_smooth,
    ffbs_draw,
)
from gpar_at_scale_tpu.ssm.kalman import posterior_sample, rts_smooth
from gpar_at_scale_tpu.ssm.markov import lgssm_of
from gpar_at_scale_tpu.ssm.segmented import segmented_posterior_sample


def _case(rng, n=60, family=Matern52, nv=0.1):
    t = jnp.array(np.sort(rng.uniform(0, 8, size=n)))
    y = jnp.array(np.sin(2 * np.asarray(t)) + rng.normal(size=n) * np.sqrt(nv))
    k = family(lengthscale=0.8, variance=1.2)
    return lgssm_of(k, t, nv), y


def _sequential_ffbs(E, g, L, xi):
    """Oracle: the literal backward recursion x_k = g_k + chol(L_k) xi_k
    + E_k x_{k+1}, same chol floor as ``ffbs_draw``."""
    n, d, S = xi.shape
    Lc = np.asarray(_chol_floor(L))
    E, g = np.asarray(E), np.asarray(g)
    xi = np.asarray(xi)
    x = np.zeros((n, d, S))
    x[-1] = g[-1] + Lc[-1] @ xi[-1]
    for k in range(n - 2, -1, -1):
        x[k] = g[k] + Lc[k] @ xi[k] + E[k] @ x[k + 1]
    return x


@pytest.mark.parametrize("n,B", [(60, 8), (37, 8), (5, 16)])
def test_ffbs_draw_matches_sequential_recursion(rng, key, n, B):
    """The blocked affine suffix scan IS the FFBS recursion (same noises)."""
    lgssm, y = _case(rng, n=n)
    res = blocked_filter(lgssm, y[:, None], num_blocks=B)
    E, g, L = _smoother_elements_fast(lgssm, res)
    xi = jax.random.normal(key, (n, lgssm.dim, 3), lgssm.A.dtype)
    x_blk = ffbs_draw(E, g, L, xi, num_blocks=B)
    x_seq = _sequential_ffbs(E, g, L, xi)
    np.testing.assert_allclose(np.asarray(x_blk), x_seq, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("seg", [17, 25, 60])
def test_segmented_equals_blocked_given_xi(rng, key, seg):
    """Exact carry across segment boundaries: same xi => same joint draw
    (ragged tails included)."""
    lgssm, y = _case(rng, n=60, family=Matern32)
    xi = jax.random.normal(key, (60, lgssm.dim, 4), lgssm.A.dtype)
    f_blk = blocked_posterior_sample(key, lgssm, y, num_blocks=8, xi=xi)
    f_seg = segmented_posterior_sample(
        key, lgssm, y, segment_size=seg, num_blocks=8, xi=xi
    )
    np.testing.assert_allclose(np.asarray(f_seg), np.asarray(f_blk), rtol=1e-9, atol=1e-11)


def test_split_dispatch_filter_result_hook(rng, key):
    """Precomputed FilterResult (the million-step staging) is equivalent."""
    lgssm, y = _case(rng, n=40)
    xi = jax.random.normal(key, (40, lgssm.dim, 2), lgssm.A.dtype)
    res = blocked_filter(lgssm, y[:, None], num_blocks=8)
    f_a = blocked_posterior_sample(key, lgssm, y, num_blocks=8, xi=xi)
    f_b = blocked_posterior_sample(
        key, lgssm, y, num_blocks=8, filter_result=res, xi=xi
    )
    np.testing.assert_allclose(np.asarray(f_a), np.asarray(f_b), rtol=0, atol=0)


def test_posterior_sample_moments_match_smoother(rng, key):
    """Sample mean/var/lag-1 cross-cov vs the exact RTS posterior, and vs
    the sequential sampler's moments (``kalman.posterior_sample``)."""
    lgssm, y = _case(rng, n=80)
    S = 4000
    f = np.asarray(blocked_posterior_sample(key, lgssm, y, num_samples=S, num_blocks=8))
    sm = rts_smooth(lgssm, y)
    mean, var = np.asarray(sm.mean), np.asarray(sm.var)
    sd = np.sqrt(var)

    # Marginal mean within 5 MC standard errors, var within 20% + floor.
    np.testing.assert_allclose(f.mean(axis=0), mean, atol=5 * sd.max() / np.sqrt(S))
    np.testing.assert_allclose(f.var(axis=0), var, rtol=0.2, atol=1e-4)

    # Lag-1 joint structure: Cov(f_k, f_{k+1} | y) = H E_k Ps_{k+1} H^T.
    res = blocked_filter(lgssm, y[:, None], num_blocks=8)
    E, _, _ = _smoother_elements_fast(lgssm, res)
    H = np.asarray(lgssm.H)
    Ps = np.asarray(blocked_smooth(lgssm, y, num_blocks=8).Ps)
    cov_theory = np.einsum("i,nij,njk,k->n", H, np.asarray(E)[:-1], Ps[1:], H)
    fc = f - f.mean(axis=0)
    cov_emp = (fc[:, :-1] * fc[:, 1:]).mean(axis=0)
    np.testing.assert_allclose(cov_emp, cov_theory, atol=6 * var.max() / np.sqrt(S))

    # Sequential sampler agrees in moments (same posterior).
    f_seq = np.asarray(posterior_sample(key, lgssm, y, num_samples=S))
    np.testing.assert_allclose(
        f_seq.mean(axis=0), f.mean(axis=0), atol=8 * sd.max() / np.sqrt(S)
    )
