"""Kalman filtering / RTS smoothing / posterior sampling for LGSSMs.

TPU-native equivalent of the TemporalGPs.jl surface the reference consumes:
``decorrelate(lgssm, y) -> (lml, alpha)`` (``src/gp/dtc.jl:106-117``),
``smooth(lgssm, y)`` (``src/gp/temporal_gp_inference.jl:109``), ``logpdf``
(``src/gp/temporal_gp_inference.jl:78``) and ``posterior_rand``
(``src/gp/tmp.jl:167``).

Two deliberate upgrades over the reference:

* **Batched observation columns.** The filter's covariance recursion is
  y-independent, so B right-hand sides share one pass — this replaces the
  reference's M sequential ``decorrelate`` calls over the columns of C_fu
  (defect K6, ``src/gp/dtc.jl:110-117``) with a single scan whose per-step
  work is a (d, B) matmul that XLA vectorizes on the VPU/MXU.
* **lml from the scan.**  log det of the dense temporal covariance is
  accumulated as sum(log S_k) inside the filter instead of materializing the
  N x N noise matrix (defect K1, ``src/gp/dtc.jl:96-99,123``).

This module is the sequential ``lax.scan`` engine — O(N) work, O(N)
sequential depth; numerically the cleanest (Joseph-form updates) and the
oracle for the O(log N)-depth associative-scan engine in
``gpar_at_scale_tpu/ssm/pkalman.py``.

All functions accept y of shape (N,) or (N, B) and are fully differentiable
w.r.t. the LGSSM parameters.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.ssm.markov import LGSSM

_LOG_2PI = 1.8378770664093453


class FilterResult(NamedTuple):
    """Per-step filter quantities. Means carry a trailing batch axis B.

    m:  (N, d, B) filtered means        P:  (N, d, d) filtered covariances
    mp: (N, d, B) predicted means       Pp: (N, d, d) predicted covariances
    S:  (N,)      innovation variances  v:  (N, B)    innovations
    ll: (B,)      total log marginal likelihood per column
    """

    m: jnp.ndarray
    P: jnp.ndarray
    mp: jnp.ndarray
    Pp: jnp.ndarray
    S: jnp.ndarray
    v: jnp.ndarray
    ll: jnp.ndarray


def _ensure_batch(y) -> Tuple[jnp.ndarray, bool]:
    y = jnp.asarray(y)
    if y.ndim == 1:
        return y[:, None], True
    return y, False


@jax.default_matmul_precision("highest")
def kalman_filter(lgssm: LGSSM, y) -> FilterResult:
    """Forward filter with batched observation columns."""
    Y, _ = _ensure_batch(y)
    d = lgssm.dim
    B = Y.shape[1]
    dtype = lgssm.A.dtype
    H = lgssm.H
    I = jnp.eye(d, dtype=dtype)

    def step(carry, inp):
        m, P = carry
        A, Q, R, yk = inp
        mp = A @ m  # (d, B)
        Pp = A @ P @ A.T + Q
        Sk = H @ Pp @ H + R  # scalar
        v = yk - H @ mp  # (B,)
        K = (Pp @ H) / Sk  # (d,)
        m_new = mp + K[:, None] * v[None, :]
        ImKH = I - K[:, None] * H[None, :]
        P_new = ImKH @ Pp @ ImKH.T + R * jnp.outer(K, K)  # Joseph form
        ll_k = -0.5 * (_LOG_2PI + jnp.log(Sk) + v * v / Sk)  # (B,)
        return (m_new, P_new), (m_new, P_new, mp, Pp, Sk, v, ll_k)

    init = (jnp.zeros((d, B), dtype), jnp.zeros((d, d), dtype))
    _, (m, P, mp, Pp, S, v, ll) = jax.lax.scan(
        step, init, (lgssm.A, lgssm.Q, lgssm.R, Y)
    )
    return FilterResult(m=m, P=P, mp=mp, Pp=Pp, S=S, v=v, ll=jnp.sum(ll, axis=0))


def logpdf(lgssm: LGSSM, y):
    """log N(y | 0, Sigma) via the innovations decomposition — TemporalGPs
    ``logpdf(lgssm, y)`` (``src/gp/temporal_gp_inference.jl:78``)."""
    res = kalman_filter(lgssm, y)
    return res.ll[0] if jnp.ndim(y) == 1 else res.ll


def decorrelate(lgssm: LGSSM, y):
    """Whitening pass: (lml, alpha) with sum(alpha^2) = y^T Sigma^-1 y and
    alpha = L^-1 y for the innovations Cholesky factor of Sigma.

    Batched: y (N, B) -> alpha (N, B), lml (B,).  Replaces the reference's
    per-column loop (``src/gp/dtc.jl:110-117``).
    """
    single = jnp.ndim(y) == 1
    res = kalman_filter(lgssm, y)
    alpha = res.v / jnp.sqrt(res.S)[:, None]
    if single:
        return res.ll[0], alpha[:, 0]
    return res.ll, alpha


def log_det_cov(lgssm: LGSSM):
    """log det(Sigma) = sum log S_k — the K1 fix: no dense noise matrix."""
    res = kalman_filter(lgssm, jnp.zeros((lgssm.num_steps,), lgssm.A.dtype))
    return jnp.sum(jnp.log(res.S))


class SmoothResult(NamedTuple):
    """RTS smoothing output in observation-function space.

    mean: (N, B) posterior means of f = H x;  var: (N,) posterior variances
    (shared across columns);  ll: (B,) filter lml;  ms/Ps: state-space
    smoothed moments.
    """

    mean: jnp.ndarray
    var: jnp.ndarray
    ll: jnp.ndarray
    ms: jnp.ndarray
    Ps: jnp.ndarray


@jax.default_matmul_precision("highest")
def rts_smooth(lgssm: LGSSM, y, filter_result: FilterResult = None) -> SmoothResult:
    """Rauch-Tung-Striebel smoother; batched means share one covariance pass.

    Equivalent of TemporalGPs ``smooth`` (``src/gp/temporal_gp_inference.jl:109``)
    but returning f-space marginals directly (the reference extracted
    ``f.m[1]`` by hand, ``src/gp/gpar_scaled_inference.jl:119``).
    """
    Y, single = _ensure_batch(y)
    res = filter_result if filter_result is not None else kalman_filter(lgssm, Y)
    H = lgssm.H

    # Reverse pass over steps N-2 .. 0; gains use step k+1's A, mp, Pp.
    def step(carry, inp):
        ms_next, Ps_next = carry
        m, P, A_next, mp_next, Pp_next = inp
        # G = P A_next^T Pp_next^-1  (d, d); solve on the small state dim.
        G = jnp.linalg.solve(Pp_next, A_next @ P).T
        ms = m + G @ (ms_next - mp_next)
        Ps = P + G @ (Ps_next - Pp_next) @ G.T
        return (ms, Ps), (ms, Ps)

    init = (res.m[-1], res.P[-1])
    inputs = (
        res.m[:-1],
        res.P[:-1],
        lgssm.A[1:],
        res.mp[1:],
        res.Pp[1:],
    )
    _, (ms_rev, Ps_rev) = jax.lax.scan(step, init, inputs, reverse=True)
    ms = jnp.concatenate([ms_rev, res.m[-1:]], axis=0)  # (N, d, B)
    Ps = jnp.concatenate([Ps_rev, res.P[-1:]], axis=0)  # (N, d, d)

    f_mean = jnp.einsum("d,ndb->nb", H, ms)
    f_var = jnp.einsum("d,nde,e->n", H, Ps, H)
    if single:
        f_mean = f_mean[:, 0]
    return SmoothResult(mean=f_mean, var=jnp.maximum(f_var, 0.0), ll=res.ll, ms=ms, Ps=Ps)


@jax.default_matmul_precision("highest")
def posterior_sample(key, lgssm: LGSSM, y, num_samples: int = 1):
    """Joint posterior samples of f = H x given y — TemporalGPs
    ``posterior_rand`` (``src/gp/tmp.jl:167``). Forward-filter
    backward-sampling; returns (num_samples, N)."""
    Y, single = _ensure_batch(y)
    if Y.shape[1] != 1:
        raise ValueError("posterior_sample expects a single observation column")
    res = kalman_filter(lgssm, Y)
    d = lgssm.dim
    n = lgssm.num_steps
    dtype = lgssm.A.dtype
    H = lgssm.H
    S = num_samples

    def chol_d(P):
        # Small-dim Cholesky with jitter floor for degenerate covariances.
        eps = 1e-12 if dtype == jnp.float64 else 1e-8
        return jnp.linalg.cholesky(P + eps * jnp.eye(d, dtype=dtype))

    key_last, key_rest = jax.random.split(key)
    xs_last = res.m[-1][:, 0][None, :] + (
        jax.random.normal(key_last, (S, d), dtype) @ chol_d(res.P[-1]).T
    )  # (S, d)

    keys = jax.random.split(key_rest, n - 1)

    def step(carry, inp):
        x_next = carry  # (S, d)
        m, P, A_next, mp_next, Pp_next, k = inp
        G = jnp.linalg.solve(Pp_next, A_next @ P).T
        cond_mean = m[:, 0][None, :] + (x_next - mp_next[:, 0][None, :]) @ G.T
        cond_cov = P - G @ Pp_next @ G.T
        eps = jax.random.normal(k, (S, d), dtype)
        x = cond_mean + eps @ chol_d(cond_cov).T
        return x, x

    inputs = (res.m[:-1], res.P[:-1], lgssm.A[1:], res.mp[1:], res.Pp[1:], keys)
    _, xs_rev = jax.lax.scan(step, xs_last, inputs, reverse=True)
    xs = jnp.concatenate([xs_rev, xs_last[None]], axis=0)  # (N, S, d)
    return jnp.einsum("d,nsd->sn", H, xs)
