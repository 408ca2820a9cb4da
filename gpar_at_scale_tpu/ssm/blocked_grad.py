"""Closed-form gradients through the blocked XLA Kalman filter.

``jax.grad`` of ``blocked_logpdf`` is exact and is what the test oracles use
— but the fused forward+backward program it produces is large, and this
sandbox's remote compile service stalls indefinitely on it at N = 1e6
(BENCHMARKS.md "engine dispatch diagnosis"; the same pathology as the fused
filter+smoother).  This module provides the same gradient in CLOSED FORM via
the De Jong / Koopman disturbance smoother — the identical math already used
for the Pallas kernels in ``ops/pallas_grad.py`` (see its module docstring
for the r/N recursion derivation), re-targeted at the blocked XLA engine:

    forward  = ``blocked_filter``            (one streaming two-pass program)
    backward = one ``blocked_suffix_scan``   (the r/N adjoint recursions ARE
               the smoothing-combine algebra) + elementwise contractions.

Two entry points:

* ``blocked_loglik(lgssm, y)`` — a ``jax.custom_vjp`` drop-in for
  ``blocked_logpdf`` whose backward never traces autodiff through the scans;
  one jit compiles forward+backward as two structurally simple halves.
* ``loglik_fwd_aux`` / ``loglik_bwd`` — the two halves as SEPARATE functions,
  so callers (``benchmarks/million_grad.py --fisher``) can jit and dispatch
  them independently when even the combined custom-VJP program is too much
  for a pathological compile service.

Unlike the EM/Fisher identity, nothing here inverts Q or Pp — the only
divisions are by the innovation variance S_k — so the gradient is f32-stable
including the near-singular Q_k of tiny time gaps.  Works for any state dim
and general emission rows H (sum kernels), which the Pallas path (d <= 3,
H = e1) cannot express.

Reference equivalent: the optimized temporal NLML the reference drives with
derivative-free Nelder-Mead (``src/gp/temporal_gp_inference.jl:69-79``;
Zygote imported but never used, ``src/GPARatScale.jl:2``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.ssm.blocked import (
    NUM_BLOCKS,
    blocked_filter,
    blocked_suffix_scan,
)
from gpar_at_scale_tpu.ssm.markov import LGSSM


@jax.default_matmul_precision("highest")
def loglik_fwd_aux(A, Q, R, H, y, num_blocks: int = NUM_BLOCKS):
    """Forward half: blocked filter on one observation column.

    Returns (ll, aux) with aux = (e, S, K, m, P) — everything the backward
    half needs.  R must be per-step (n,); H is the (d,) emission row."""
    lgssm = LGSSM(A=A, Q=Q, H=H, R=R)
    res = blocked_filter(lgssm, y[:, None], num_blocks)
    K = jnp.einsum("nij,j->ni", res.Pp, H) / res.S[:, None]
    return res.ll[0], (res.v[:, 0], res.S, K, res.m[:, :, 0], res.P)


@jax.default_matmul_precision("highest")
def loglik_bwd(A, Q, R, H, aux, num_blocks: int = NUM_BLOCKS):
    """Backward half: disturbance-smoother adjoints -> (dA, dQ, dR, dy).

    r/N recursions (r_n = 0, N_n = 0):
        C_k = (A_{k+1} (I - K_k H))^T
        r_k = H^T e_k / S_k + C_k r_{k+1}
        N_k = H^T H / S_k   + C_k N_{k+1} C_k^T
    run as ONE inclusive blocked suffix scan over the shared (E, g, L)
    smoothing algebra.  Score formulas as in ``ops/pallas_grad.py``."""
    e, S, K, m, P = aux
    n, d = K.shape
    dtype = A.dtype
    I = jnp.eye(d, dtype=dtype)

    A_next = jnp.concatenate([A[1:], jnp.zeros((1, d, d), dtype)])
    ImKH = I[None] - K[:, :, None] * H[None, None, :]
    C = jnp.swapaxes(A_next @ ImKH, -1, -2)
    b = H[None, :] * (e / S)[:, None]  # (n, d)
    W = (1.0 / S)[:, None, None] * (H[:, None] * H[None, :])[None]

    _, r, N = blocked_suffix_scan(C, b[:, :, None], W, num_blocks=num_blocks)
    r = r[:, :, 0]

    outer = lambda a, bb: a[:, :, None] * bb[:, None, :]
    rrN = outer(r, r) - N  # = 2 * Pbar_k

    m_prev = jnp.concatenate([jnp.zeros((1, d), dtype), m[:-1]])
    P_prev = jnp.concatenate([jnp.zeros((1, d, d), dtype), P[:-1]])
    dQ = 0.5 * rrN
    dA = rrN @ (A @ P_prev) + outer(r, m_prev)

    r_next = jnp.concatenate([r[1:], jnp.zeros((1, d), dtype)])
    N_next = jnp.concatenate([N[1:], jnp.zeros((1, d, d), dtype)])
    AK = jnp.einsum("nij,nj->ni", A_next, K)
    u = e / S - jnp.sum(AK * r_next, axis=-1)
    D = 1.0 / S + jnp.einsum("ni,nij,nj->n", AK, N_next, AK)
    dR = 0.5 * (u * u - D)
    dy = -u
    return dA, dQ, dR, dy


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _loglik_p(num_blocks, A, Q, R, H, y):
    ll, _ = loglik_fwd_aux(A, Q, R, H, y, num_blocks)
    return ll


def _fwd(num_blocks, A, Q, R, H, y):
    ll, aux = loglik_fwd_aux(A, Q, R, H, y, num_blocks)
    return ll, (A, Q, R, H, aux)


def _bwd(num_blocks, res, ct):
    A, Q, R, H, aux = res
    dA, dQ, dR, dy = loglik_bwd(A, Q, R, H, aux, num_blocks)
    ct = jnp.asarray(ct, A.dtype)
    return (ct * dA, ct * dQ, ct * dR, jnp.zeros_like(H), ct * dy)


_loglik_p.defvjp(_fwd, _bwd)


def blocked_loglik(lgssm: LGSSM, y, num_blocks: int = NUM_BLOCKS):
    """``blocked_logpdf`` with the closed-form disturbance-smoother VJP —
    the production gradient path for million-step hyperparameter training
    (``benchmarks/million_grad.py``).  Single observation column.

    H is treated as structural (zero cotangent): the emission row of a
    Matern(-sum) SDE does not depend on the hyperparameters
    (``ssm/markov.py::lgssm_of``)."""
    n = lgssm.num_steps
    R = jnp.broadcast_to(lgssm.R, (n,)).astype(lgssm.A.dtype)
    return _loglik_p(
        num_blocks, lgssm.A, lgssm.Q, R, lgssm.H.astype(lgssm.A.dtype), jnp.asarray(y)
    )


# ---------------------------------------------------------------------------
# Batched whitened-Gram VJP — the flagship scaled-GPAR DTC training path.
#
# The DTC bound and q(u) consume Sigma_y only through
#     G = U^T Sigma^-1 U,   U = [y - m | K_fu]  (N, M+1)
# and logdet Sigma (``gp/dtc.py::_whiten_all``; reference algebra at
# ``src/gp/dtc.jl:106-125``).  This is the batched-observation-column
# analogue of ``blocked_loglik``: every backward quantity (innovation e,
# filtered mean m, adjoint state r, observation disturbance u = Sigma^-1 U)
# is LINEAR in the columns of U, so the chain rule through an arbitrary Gram
# cotangent sym(ct_G) collapses to contractions of the unrotated column
# stack with sym(ct_G) — no per-column passes, no eigendecomposition.  Same
# math as ``ops/pallas_grad.whiten_gram`` (see its derivation comment),
# re-targeted at the production blocked two-pass engine, which additionally
# handles any state dim and general emission rows H (sum kernels).
#
# Exact cotangents, with r_k (d, B) from the batched adjoint recursion and
# N_k the (column-shared) information recursion run as ONE blocked suffix
# scan:
#     ct_Q_k = -r_k ct_sym r_k^T + ct_ld N_k
#     ct_A_k = -2 (r_k ct_sym r_k^T A_k P_{k-1} + r_k ct_sym m_{k-1}^T)
#              + 2 ct_ld N_k A_k P_{k-1}
#     ct_R_k = -u_k ct_sym u_k^T + ct_ld D_k
#     ct_U   = 2 u ct_sym
# ---------------------------------------------------------------------------


@jax.default_matmul_precision("highest")
def whiten_fwd_aux(A, Q, R, H, U, num_blocks: int = NUM_BLOCKS):
    """Forward half: one batched blocked filter over the column stack U
    (N, B).  Returns (G, logdet, aux) with G = U^T Sigma^-1 U and aux =
    (v, S, K, m, P) for ``whiten_bwd``.  R per-step (n,)."""
    lgssm = LGSSM(A=A, Q=Q, H=H, R=R)
    res = blocked_filter(lgssm, U, num_blocks)
    white = res.v / jnp.sqrt(res.S)[:, None]
    G = white.T @ white
    logdet = jnp.sum(jnp.log(res.S))
    K = jnp.einsum("nij,j->ni", res.Pp, H) / res.S[:, None]
    return G, logdet, (res.v, res.S, K, res.m, res.P)


@jax.default_matmul_precision("highest")
def whiten_bwd_elements(A, H, aux):
    """Backward stage 1: the (C, b, W) suffix-scan elements (elementwise).

    b carries the column batch; C and W are column-shared — so the scan
    itself (stage 2, ``blocked_suffix_scan``) may be dispatched over COLUMN
    CHUNKS of b, each reusing one compiled program.  (This sandbox's remote
    compile service repeatedly stalls on wide-column suffix-scan programs
    while compiling narrow ones — see results_r4/diag_dtc_1m*.txt — and the
    affine recursion is per-column independent, so chunked == fused.)"""
    e, S, K, m, P = aux
    n, d = K.shape
    dtype = A.dtype
    I = jnp.eye(d, dtype=dtype)
    A_next = jnp.concatenate([A[1:], jnp.zeros((1, d, d), dtype)])
    ImKH = I[None] - K[:, :, None] * H[None, None, :]
    C = jnp.swapaxes(A_next @ ImKH, -1, -2)  # (A_{k+1}(I - K_k H))^T
    b = H[None, :, None] * (e / S[:, None])[:, None, :]  # (N, d, B)
    W = (1.0 / S)[:, None, None] * (H[:, None] * H[None, :])[None]
    return C, b, W


@jax.default_matmul_precision("highest")
def whiten_bwd_scores(A, Q, R, H, aux, r, Nmat, ct_G, ct_ld):
    """Backward stage 3: scores from the scanned adjoints (r, Nmat) ->
    (ct_A, ct_Q, ct_R, ct_U).  Pure elementwise/MXU contractions."""
    e, S, K, m, P = aux
    n, d = K.shape
    dtype = A.dtype
    ctsym = (0.5 * (ct_G + ct_G.T)).astype(dtype)
    ct_ld = jnp.asarray(ct_ld, dtype)

    A_next = jnp.concatenate([A[1:], jnp.zeros((1, d, d), dtype)])
    m_prev = jnp.concatenate([jnp.zeros_like(m[:1]), m[:-1]])
    P_prev = jnp.concatenate([jnp.zeros((1, d, d), dtype), P[:-1]])
    AP = A @ P_prev

    r_next = jnp.concatenate([r[1:], jnp.zeros_like(r[:1])])
    N_next = jnp.concatenate([Nmat[1:], jnp.zeros_like(Nmat[:1])])
    AK = jnp.einsum("nij,nj->ni", A_next, K)  # A_{k+1} K_k
    u = e / S[:, None] - jnp.einsum("nd,ndB->nB", AK, r_next)  # Sigma^-1 U
    D = 1.0 / S + jnp.einsum("nd,nde,ne->n", AK, N_next, AK)

    R2 = jnp.einsum("nib,bc,njc->nij", r, ctsym, r)
    Rm = jnp.einsum("nib,bc,njc->nij", r, ctsym, m_prev)
    ct_A = -2.0 * (R2 @ AP + Rm) + (2.0 * ct_ld) * (Nmat @ AP)
    ct_Q = -R2 + ct_ld * Nmat
    ct_R = -jnp.einsum("nb,bc,nc->n", u, ctsym, u) + ct_ld * D
    ct_U = 2.0 * (u @ ctsym)
    return ct_A, ct_Q, ct_R, ct_U


def whiten_bwd(A, Q, R, H, aux, ct_G, ct_ld, num_blocks: int = NUM_BLOCKS):
    """Backward half: batched disturbance-smoother adjoints ->
    (ct_A, ct_Q, ct_R, ct_U).  One blocked suffix scan (shared with the
    smoother and the single-column ``loglik_bwd``) + MXU contractions.
    Staged entry points: ``whiten_bwd_elements`` / ``blocked_suffix_scan``
    / ``whiten_bwd_scores``."""
    C, b, W = whiten_bwd_elements(A, H, aux)
    _, r, Nmat = blocked_suffix_scan(C, b, W, num_blocks=num_blocks)
    return whiten_bwd_scores(A, Q, R, H, aux, r, Nmat, ct_G, ct_ld)


# ---------------------------------------------------------------------------
# Mixed-column (factored-cotangent) backward — bounded memory at ANY M.
#
# The staged backward above materializes full-width per-step aux
# (m: (N, d, M+1)) and the full adjoint stack r: at M = 128 on a 16 GB v5e
# the resident set OOMs (measured r5: million_dtc --m=128 --only=train,
# RESOURCE_EXHAUSTED).  The fix is algebraic, not approximate:
#
#   * the Gram cotangent, symmetrized, is NEGATIVE DEFINITE for any
#     cotangent produced by the DTC bound:  ctsym = -F F^T
#     (-ctsym = 0.5*[[1, -beta^T], [-beta, P^-1 + beta beta^T]] whose Schur
#     complement 0.5 P^-1 + 0.25 beta beta^T > 0), so F = chol(-ctsym)
#     exists — computed on the HOST in f64 (M x M, microseconds);
#   * every backward quantity is LINEAR in the observation columns: the
#     filter's (v, m) recursions have zero init, b = H (x) (e/S) is linear
#     in e, and the affine adjoint suffix r_k = b_k + C_k r_{k+1} shares C
#     across columns.  Hence  r @ F = scan(filter(U @ F))  — mixing columns
#     BEFORE the filter commutes with the whole pipeline.
#
# All pairwise column contractions then collapse to sums of per-chunk
# outer products of MIXED columns:
#     R2 = r ctsym r^T           = -sum_k (rF)_k (rF)_k^T
#     Rm = r ctsym m_prev^T      = -sum_k (rF)_k (m_prev F)_k^T
#     u ctsym u^T (diag)         = -sum_k (uF)_k^2
#     ct_U = 2 u ctsym           = -2 (uF) F^T
# so the backward runs over K-column chunks of U @ F, each chunk a
# filter + suffix-scan + contraction program no wider than the proven
# M = 32 path, with NOTHING full-width ever resident.  ct_ld's terms (the
# column-shared N/D information recursion) come from one extra 1-column
# dispatch.  Exact — asserted against ``whiten_bwd`` in
# ``tests/test_mixed_bwd.py``.
# ---------------------------------------------------------------------------


def cotangent_factor(ct_G):
    """Host-side F with  sym(ct_G) = -F F^T  (f64 Cholesky of the PSD
    negation; tiny relative ridge for semidefinite edge cases).  Returns a
    numpy (B, B) array; cast to the device dtype at the call site."""
    import numpy as _np

    ct = _np.asarray(ct_G, _np.float64)
    Sneg = -0.5 * (ct + ct.T)
    b = Sneg.shape[0]
    ridge = 1e-12 * max(float(_np.trace(Sneg)) / b, 1e-300)
    return _np.linalg.cholesky(Sneg + ridge * _np.eye(b))


@jax.default_matmul_precision("highest")
def whiten_bwd_mixed_chunk(A, Q, R, H, U, Fk, num_blocks: int = NUM_BLOCKS):
    """Partial cotangents from one mixed-column chunk U @ Fk.

    Fk: (M+1, K) columns of the cotangent factor F.  Returns
    (ct_A_p, ct_Q_p, ct_R_p, ct_U_p) such that summing over chunks (plus
    ``whiten_bwd_ld_part`` for the ct_ld terms) equals ``whiten_bwd``.
    Everything here is chunk-width; no full-width array is created."""
    n, d = A.shape[0], A.shape[-1]
    dtype = A.dtype
    lgssm = LGSSM(A=A, Q=Q, H=H, R=R)
    Ut = U @ Fk  # (N, K) mixed columns
    res = blocked_filter(lgssm, Ut, num_blocks)
    e, S, m, P = res.v, res.S, res.m, res.P
    K = jnp.einsum("nij,j->ni", res.Pp, H) / S[:, None]

    I = jnp.eye(d, dtype=dtype)
    A_next = jnp.concatenate([A[1:], jnp.zeros((1, d, d), dtype)])
    ImKH = I[None] - K[:, :, None] * H[None, None, :]
    C = jnp.swapaxes(A_next @ ImKH, -1, -2)
    b = H[None, :, None] * (e / S[:, None])[:, None, :]  # (N, d, K)
    W0 = jnp.zeros((n, d, d), dtype)
    _, r, _ = blocked_suffix_scan(C, b, W0, num_blocks=num_blocks)  # r = (rF)_chunk

    m_prev = jnp.concatenate([jnp.zeros_like(m[:1]), m[:-1]])
    P_prev = jnp.concatenate([jnp.zeros((1, d, d), dtype), P[:-1]])
    AP = A @ P_prev
    P2 = jnp.einsum("nik,njk->nij", r, r)  # (rF)(rF)^T partial
    Pm = jnp.einsum("nik,njk->nij", r, m_prev)

    r_next = jnp.concatenate([r[1:], jnp.zeros_like(r[:1])])
    AK = jnp.einsum("nij,nj->ni", A_next, K)
    u = e / S[:, None] - jnp.einsum("nd,ndK->nK", AK, r_next)  # (Sigma^-1 U) F

    ct_A_p = 2.0 * (P2 @ AP + Pm)  # = -2 (R2_p @ AP + Rm_p), R2_p = -P2
    ct_Q_p = P2  # = -R2_p
    ct_R_p = jnp.sum(u * u, axis=1)  # = -u ctsym u^T partial
    ct_U_p = -2.0 * (u @ Fk.T)
    return ct_A_p, ct_Q_p, ct_R_p, ct_U_p


@jax.default_matmul_precision("highest")
def whiten_bwd_ld_part(A, Q, R, H, ct_ld, num_blocks: int = NUM_BLOCKS):
    """The column-shared ct_ld terms: one 1-column filter (for S, K, P) +
    the information suffix recursion N -> (ct_A, ct_Q, ct_R) parts."""
    n, d = A.shape[0], A.shape[-1]
    dtype = A.dtype
    lgssm = LGSSM(A=A, Q=Q, H=H, R=R)
    res = blocked_filter(lgssm, jnp.zeros((n, 1), dtype), num_blocks)
    S, P = res.S, res.P
    K = jnp.einsum("nij,j->ni", res.Pp, H) / S[:, None]

    I = jnp.eye(d, dtype=dtype)
    A_next = jnp.concatenate([A[1:], jnp.zeros((1, d, d), dtype)])
    ImKH = I[None] - K[:, :, None] * H[None, None, :]
    C = jnp.swapaxes(A_next @ ImKH, -1, -2)
    W = (1.0 / S)[:, None, None] * (H[:, None] * H[None, :])[None]
    b0 = jnp.zeros((n, d, 1), dtype)
    _, _, Nmat = blocked_suffix_scan(C, b0, W, num_blocks=num_blocks)

    P_prev = jnp.concatenate([jnp.zeros((1, d, d), dtype), P[:-1]])
    AP = A @ P_prev
    N_next = jnp.concatenate([Nmat[1:], jnp.zeros_like(Nmat[:1])])
    AK = jnp.einsum("nij,nj->ni", A_next, K)
    D = 1.0 / S + jnp.einsum("nd,nde,ne->n", AK, N_next, AK)

    ct_ld = jnp.asarray(ct_ld, dtype)
    ct_A_p = (2.0 * ct_ld) * (Nmat @ AP)
    ct_Q_p = ct_ld * Nmat
    ct_R_p = ct_ld * D
    return ct_A_p, ct_Q_p, ct_R_p


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _whiten_gram_p(num_blocks, A, Q, R, H, U):
    G, logdet, _ = whiten_fwd_aux(A, Q, R, H, U, num_blocks)
    return G, logdet


def _wg_fwd(num_blocks, A, Q, R, H, U):
    G, logdet, aux = whiten_fwd_aux(A, Q, R, H, U, num_blocks)
    return (G, logdet), (A, Q, R, H, aux)


def _wg_bwd(num_blocks, res, cts):
    A, Q, R, H, aux = res
    ct_G, ct_ld = cts
    ct_A, ct_Q, ct_R, ct_U = whiten_bwd(A, Q, R, H, aux, ct_G, ct_ld, num_blocks)
    return (ct_A, ct_Q, ct_R, jnp.zeros_like(H), ct_U)


_whiten_gram_p.defvjp(_wg_fwd, _wg_bwd)


def whiten_gram(lgssm: LGSSM, U, num_blocks: int = NUM_BLOCKS):
    """Differentiable whitened Gram through the blocked two-pass engine:
    (G, logdet) with G = U^T Sigma_y^-1 U — the whole Sigma_y-dependence of
    the DTC bound and of q(u).  The custom VJP keeps forward and backward as
    two structurally simple streaming programs (no autodiff through the
    scans), which is what lets scaled-GPAR DTC *training* compile and run at
    N = 1e6 (``benchmarks/million_dtc.py``).  H structural (zero cotangent),
    as in ``blocked_loglik``."""
    n = lgssm.num_steps
    dtype = lgssm.A.dtype
    R = jnp.broadcast_to(lgssm.R, (n,)).astype(dtype)
    return _whiten_gram_p(
        num_blocks, lgssm.A, lgssm.Q, R, lgssm.H.astype(dtype), jnp.asarray(U, dtype)
    )
