"""Parallel (associative-scan) Kalman filter and RTS smoother.

The O(log N)-depth engine for long time series — the TPU-native answer to the
reference's sequential O(N) Kalman recursion (SURVEY.md §5.7): the filter and
smoother are reformulated as associative prefix scans (Sarkka &
Garcia-Fernandez, "Temporal Parallelization of Bayesian Smoothers",
arXiv:1905.13002 — PAPERS.md) and run under ``jax.lax.associative_scan``,
which XLA lowers to a work-efficient parallel scan; under a sharded mesh the
block-boundary combines ride ICI collectives automatically.

Filtering element per step k (with our convention A_0 = 0, Q_0 = Pinf so the
prior enters through step 0):

    S_k = H Q_k H^T + R_k          K_k = Q_k H^T / S_k
    A'_k = (I - K_k H) A_k         b'_k = K_k y_k
    C'_k = (I - K_k H) Q_k
    eta'_k = A_k^T H^T y_k / S_k   J'_k = A_k^T H^T H A_k / S_k

with the associative combine (i earlier, j later):

    Z    = I + C_i J_j
    A_ij = A_j Z^-1 A_i
    b_ij = A_j Z^-1 (b_i + C_i eta_j) + b_j
    C_ij = A_j Z^-1 C_i A_j^T + C_j
    Z2   = I + J_j C_i
    eta_ij = A_i^T Z2^-1 (eta_j - J_j b_i) + eta_i
    J_ij   = A_i^T Z2^-1 J_j A_i + J_i

After the inclusive prefix scan, the filtered moments are m_k = b_k,
P_k = C_k.  The innovation quantities (lml, whitened residuals) are then
elementwise from the one-step-shifted predicted moments — same trick that
keeps log det Sigma inside the scan (K1 fix).

Observation columns are batched exactly as in the sequential engine: b and
eta carry a trailing (B,) axis; A, C, J are shared across columns.

Numerics: elements mix covariance-like (C) and information-like (J)
quantities; in f32 prefer the sequential engine for short series and this one
for long N where the log-depth matters.  All (d, d) solves use explicit
``jnp.linalg.solve`` on the small static state dim.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.ssm.kalman import FilterResult, SmoothResult, _ensure_batch
from gpar_at_scale_tpu.ssm.markov import LGSSM

_LOG_2PI = 1.8378770664093453


def _filter_elements(lgssm: LGSSM, Y: jnp.ndarray):
    """Build per-step scan elements. Y: (N, B)."""
    A, Q, H, R = lgssm.A, lgssm.Q, lgssm.H, lgssm.R
    d = lgssm.dim
    I = jnp.eye(d, dtype=A.dtype)

    S = jnp.einsum("i,nij,j->n", H, Q, H) + R  # (N,)
    K = jnp.einsum("nij,j->ni", Q, H) / S[:, None]  # (N, d)
    ImKH = I[None] - jnp.einsum("na,b->nab", K, H)  # (N, d, d): I - K H
    A_el = jnp.einsum("nab,nbc->nac", ImKH, A)  # (N, d, d)
    b_el = jnp.einsum("na,nb->nab", K, Y)  # (N, d, B)
    C_el = jnp.einsum("nab,nbc->nac", ImKH, Q)
    HtA = jnp.einsum("a,nab->nb", H, A)  # (N, d) row H A
    eta_el = HtA[:, :, None] * (Y / S[:, None])[:, None, :]  # (N, d, B)
    J_el = jnp.einsum("na,nb->nab", HtA, HtA) / S[:, None, None]  # (N, d, d)
    return A_el, b_el, C_el, eta_el, J_el


def _combine(elem_i, elem_j):
    """Associative combine of filtering elements (i earlier, j later).
    All operands carry a leading scan axis."""
    A_i, b_i, C_i, eta_i, J_i = elem_i
    A_j, b_j, C_j, eta_j, J_j = elem_j
    d = A_i.shape[-1]
    I = jnp.eye(d, dtype=A_i.dtype)

    Z = I + jnp.einsum("...ab,...bc->...ac", C_i, J_j)
    # Solve Z^T X^T = M^T to get X = M Z^-1 for the right-inverse products.
    Zt = jnp.swapaxes(Z, -1, -2)
    AjZ = jnp.swapaxes(jnp.linalg.solve(Zt, jnp.swapaxes(A_j, -1, -2)), -1, -2)  # A_j Z^-1

    A_ij = AjZ @ A_i
    b_ij = jnp.einsum("...ab,...bB->...aB", AjZ, b_i + jnp.einsum("...ab,...bB->...aB", C_i, eta_j)) + b_j
    C_ij = AjZ @ C_i @ jnp.swapaxes(A_j, -1, -2) + C_j

    Z2 = I + jnp.einsum("...ab,...bc->...ac", J_j, C_i)
    AiT = jnp.swapaxes(A_i, -1, -2)
    AiTZ2 = jnp.swapaxes(jnp.linalg.solve(jnp.swapaxes(Z2, -1, -2), A_i), -1, -2)  # A_i^T Z2^-1
    eta_ij = (
        jnp.einsum("...ab,...bB->...aB", AiTZ2, eta_j - jnp.einsum("...ab,...bB->...aB", J_j, b_i))
        + eta_i
    )
    J_ij = AiTZ2 @ J_j @ A_i + J_i
    return A_ij, b_ij, C_ij, eta_ij, J_ij


@jax.default_matmul_precision("highest")
def parallel_filter(lgssm: LGSSM, y) -> FilterResult:
    """Associative-scan filter; returns the same FilterResult as the
    sequential engine (filtered + predicted moments, innovations, lml)."""
    Y, _ = _ensure_batch(y)
    elems = _filter_elements(lgssm, Y)
    A_s, b_s, C_s, _, _ = jax.lax.associative_scan(_combine, elems, axis=0)
    m = b_s  # (N, d, B) filtered means
    P = C_s  # (N, d, d) filtered covariances

    # Predicted moments elementwise from the one-step shift.
    A, Q, H, R = lgssm.A, lgssm.Q, lgssm.H, lgssm.R
    m_prev = jnp.concatenate([jnp.zeros_like(m[:1]), m[:-1]], axis=0)
    P_prev = jnp.concatenate([jnp.zeros_like(P[:1]), P[:-1]], axis=0)
    mp = jnp.einsum("nab,nbB->naB", A, m_prev)
    Pp = jnp.einsum("nab,nbc,ndc->nad", A, P_prev, A) + Q

    S = jnp.einsum("a,nab,b->n", H, Pp, H) + R
    v = Y - jnp.einsum("a,naB->nB", H, mp)
    ll = -0.5 * jnp.sum(
        _LOG_2PI + jnp.log(S)[:, None] + v * v / S[:, None], axis=0
    )
    return FilterResult(m=m, P=P, mp=mp, Pp=Pp, S=S, v=v, ll=ll)


def parallel_logpdf(lgssm: LGSSM, y):
    res = parallel_filter(lgssm, y)
    return res.ll[0] if jnp.ndim(y) == 1 else res.ll


def parallel_decorrelate(lgssm: LGSSM, y):
    single = jnp.ndim(y) == 1
    res = parallel_filter(lgssm, y)
    alpha = res.v / jnp.sqrt(res.S)[:, None]
    if single:
        return res.ll[0], alpha[:, 0]
    return res.ll, alpha


def _smoother_elements(lgssm: LGSSM, res: FilterResult):
    """Per-step smoothing elements from the filtered moments.

    E_k = P_k A_{k+1}^T Pp_{k+1}^-1 ; g_k = m_k - E_k mp_{k+1} ;
    L_k = P_k - E_k Pp_{k+1} E_k^T  (== P_k - E_k A_{k+1} P_k, since
    E_k Pp_{k+1} E_k^T = P_k A_{k+1}^T Pp_{k+1}^-1 A_{k+1} P_k; the code
    uses the explicitly symmetric congruence form).  Last: (0, m_N, P_N).
    """
    A = lgssm.A
    m, P, mp, Pp = res.m, res.P, res.mp, res.Pp
    n = m.shape[0]
    d = A.shape[-1]

    A_next = A[1:]  # (N-1, d, d)
    Pp_next = Pp[1:]
    mp_next = mp[1:]
    # E = P A^T Pp^-1 -> solve Pp^T X^T = (P A^T)^T ... Pp symmetric.
    PAt = jnp.einsum("nab,ncb->nac", P[:-1], A_next)  # P_k A_{k+1}^T
    E = jnp.swapaxes(jnp.linalg.solve(Pp_next, jnp.swapaxes(PAt, -1, -2)), -1, -2)
    g = m[:-1] - jnp.einsum("nab,nbB->naB", E, mp_next)
    L = P[:-1] - E @ Pp_next @ jnp.swapaxes(E, -1, -2)

    E_last = jnp.zeros((1, d, d), A.dtype)
    g_last = m[-1:]
    L_last = P[-1:]
    return (
        jnp.concatenate([E, E_last], axis=0),
        jnp.concatenate([g, g_last], axis=0),
        jnp.concatenate([L, L_last], axis=0),
    )


def _combine_smooth(later, earlier):
    """Reverse-scan combine.  ``jax.lax.associative_scan(..., reverse=True)``
    flips, scans, and flips back, so the FIRST argument is the already-
    combined suffix of later steps and the SECOND is the new earlier step.
    The paper's operator (earlier o later) therefore applies the earlier
    element's gain on the left:  (E_e E_l, E_e g_l + g_e, E_e L_l E_e^T + L_e).
    """
    E_l, g_l, L_l = later
    E_e, g_e, L_e = earlier
    E = E_e @ E_l
    g = jnp.einsum("...ab,...bB->...aB", E_e, g_l) + g_e
    L = E_e @ L_l @ jnp.swapaxes(E_e, -1, -2) + L_e
    return E, g, L


@jax.default_matmul_precision("highest")
def parallel_smooth(lgssm: LGSSM, y, filter_result: FilterResult = None) -> SmoothResult:
    """Associative-scan RTS smoother (reverse prefix scan over smoothing
    elements); f-space marginals like the sequential ``rts_smooth``."""
    Y, single = _ensure_batch(y)
    res = filter_result if filter_result is not None else parallel_filter(lgssm, Y)
    elems = _smoother_elements(lgssm, res)
    _, g_s, L_s = jax.lax.associative_scan(_combine_smooth, elems, axis=0, reverse=True)
    ms = g_s  # (N, d, B)
    Ps = L_s  # (N, d, d)
    H = lgssm.H
    f_mean = jnp.einsum("d,ndb->nb", H, ms)
    f_var = jnp.einsum("d,nde,e->n", H, Ps, H)
    if single:
        f_mean = f_mean[:, 0]
    return SmoothResult(mean=f_mean, var=jnp.maximum(f_var, 0.0), ll=res.ll, ms=ms, Ps=Ps)
