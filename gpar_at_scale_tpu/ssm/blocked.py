"""Blocked two-pass Kalman filter/smoother in pure XLA — the production
long-series engine.

Same algorithm as the Pallas blocked-scan kernels (``ops/pallas_kalman.py``):
split the N-step series into B contiguous blocks, reduce each block's
filtering elements in lockstep (one ``lax.scan`` over T = ceil(N/B) steps
whose body combines B elements at once), associative-scan the B block totals
(tiny), then replay each block from its known filtered init.  Expressed as
plain ``lax.scan`` + einsums instead of a hand-written kernel:

* the per-iteration body is a (B, d, d)-batched elementwise/matmul bundle —
  exactly what the VPU/MXU want — so the sequential-scan engine's
  per-iteration While-loop overhead is amortized over B blocks: ~N/B loop
  iterations instead of N;
* XLA compiles it in seconds (measured r3: the same algorithm as a Pallas
  kernel takes 200+ s through this sandbox's remote-compile service and
  executes ~1000x off hardware speed — see BENCHMARKS.md "engine dispatch
  diagnosis"; the associative-scan engine also fails to compile at N >= 1e5);
* it is differentiable by plain ``jax.grad`` (scan residuals are O(N d^2)),
  handles batched observation columns (the DTC whitening path, K6 fix), any
  state dim, and any emission row H.

The math is the Sarkka & Garcia-Fernandez filtering-element monoid
(arXiv:1905.13002) shared with ``ssm/pkalman.py``; this module only changes
the *schedule*: two streaming passes with a B-way parallel inner axis,
instead of O(log N) full passes (associative) or N sequential steps (scan).

Capability parity: ``blocked_filter`` returns the same ``FilterResult`` as
``ssm.kalman.kalman_filter`` and plugs into every consumer (DTC whitening,
smoother, NLML, SMC likelihoods); ``blocked_smooth`` matches ``rts_smooth``.
Reference equivalents: ``decorrelate``/``smooth`` consumed at
``src/gp/dtc.jl:106-117`` and ``src/gp/temporal_gp_inference.jl:109``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.ssm.kalman import FilterResult, SmoothResult, _ensure_batch
from gpar_at_scale_tpu.ssm.markov import LGSSM
from gpar_at_scale_tpu.ssm.pkalman import _filter_elements

_LOG_2PI = 1.8378770664093453

# Default number of lockstep blocks: amortizes scan-iteration overhead N/B
# times while keeping the (B, d, d) batched body comfortably VPU-shaped.
NUM_BLOCKS = 1024


def _inv_small(Z):
    """Batched inverse of (..., d, d) for d <= 3 via the adjugate — closed
    form, no While loops (XLA's batched LU is latency-bound at tiny d).
    Safe here: every Z this module inverts is I + (PSD)(PSD) with
    eigenvalues >= 1.  Falls back to ``jnp.linalg.solve`` for d > 3."""
    d = Z.shape[-1]
    if d == 1:
        return 1.0 / Z
    if d == 2:
        a, b = Z[..., 0, 0], Z[..., 0, 1]
        c, e = Z[..., 1, 0], Z[..., 1, 1]
        det = a * e - b * c
        adj = jnp.stack(
            [jnp.stack([e, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
        )
        return adj / det[..., None, None]
    if d == 3:
        m = Z
        c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
        c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
        c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
        c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
        c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
        c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
        c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
        c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
        c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
        det = m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02
        adj = jnp.stack(
            [
                jnp.stack([c00, c10, c20], axis=-1),
                jnp.stack([c01, c11, c21], axis=-1),
                jnp.stack([c02, c12, c22], axis=-1),
            ],
            axis=-2,
        )
        return adj / det[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=Z.dtype), Z.shape)
    return jnp.linalg.solve(Z, eye)


def _combine_fast(elem_i, elem_j):
    """Filtering-element combine (i earlier, j later) using the adjugate
    inverse — same algebra as ``pkalman._combine`` without batched LU."""
    A_i, b_i, C_i, eta_i, J_i = elem_i
    A_j, b_j, C_j, eta_j, J_j = elem_j
    d = A_i.shape[-1]
    I = jnp.eye(d, dtype=A_i.dtype)

    Z = I + C_i @ J_j
    AjZ = A_j @ _inv_small(Z)
    A_ij = AjZ @ A_i
    b_ij = jnp.einsum("...ab,...bB->...aB", AjZ, b_i + jnp.einsum("...ab,...bB->...aB", C_i, eta_j)) + b_j
    C_ij = AjZ @ C_i @ jnp.swapaxes(A_j, -1, -2) + C_j

    Z2 = I + J_j @ C_i
    AiTZ2 = jnp.swapaxes(A_i, -1, -2) @ _inv_small(Z2)
    eta_ij = (
        jnp.einsum("...ab,...bB->...aB", AiTZ2, eta_j - jnp.einsum("...ab,...bB->...aB", J_j, b_i))
        + eta_i
    )
    J_ij = AiTZ2 @ J_j @ A_i + J_i
    return A_ij, b_ij, C_ij, eta_ij, J_ij


def _elem_identity(B, d, C, dtype):
    """Identity of the filtering-element monoid, broadcast over B blocks."""
    return (
        jnp.broadcast_to(jnp.eye(d, dtype=dtype), (B, d, d)),
        jnp.zeros((B, d, C), dtype),
        jnp.zeros((B, d, d), dtype),
        jnp.zeros((B, d, C), dtype),
        jnp.zeros((B, d, d), dtype),
    )


def _block(x, B, T):
    """(B*T, ...) -> (T, B, ...): block b owns the contiguous steps
    [b*T, (b+1)*T); the scan axis walks each block's local step in lockstep."""
    return jnp.moveaxis(x.reshape((B, T) + x.shape[1:]), 1, 0)


def _unblock(x, n):
    """(T, B, ...) -> (B*T, ...)[:n]."""
    T, B = x.shape[:2]
    return jnp.moveaxis(x, 0, 1).reshape((B * T,) + x.shape[2:])[:n]


@jax.default_matmul_precision("highest")
def blocked_filter(
    lgssm: LGSSM, y, num_blocks: int = NUM_BLOCKS, init=None
) -> FilterResult:
    """Forward filter with batched observation columns; FilterResult parity
    with ``kalman_filter`` at N/B sequential depth.

    init: optional (m0 (d, C), P0 (d, d)) FILTERED state of the step just
    before this series — the segment-carry hook of ``ssm/segmented.py``.
    Injected as the filtering element (A=0, b=m0, C=P0, eta=0, J=0)
    prepended to every block's phase-2 prefix, so the whole segment
    conditions on it exactly.  ``None`` = the LGSSM's own prior (A_0 = 0,
    Q_0 = Pinf enters through step 0's element, unchanged behavior)."""
    Y, _ = _ensure_batch(y)
    n = lgssm.num_steps
    d = lgssm.dim
    C = Y.shape[1]
    dtype = lgssm.A.dtype
    H = lgssm.H.astype(dtype)
    B = max(1, min(num_blocks, n))
    T = -(-n // B)
    pad = B * T - n

    elems = _filter_elements(lgssm, Y)
    ident_pad = _elem_identity(pad, d, C, dtype)
    elems = tuple(
        _block(jnp.concatenate([e, ip], axis=0), B, T)
        for e, ip in zip(elems, ident_pad)
    )

    # ---- phase 1: lockstep within-block element reduction ----
    def p1(carry, elem_t):
        return _combine_fast(carry, elem_t), None

    totals, _ = jax.lax.scan(p1, _elem_identity(B, d, C, dtype), elems)

    # ---- phase 2: exclusive prefix over the B block totals (tiny) ----
    scanned = jax.lax.associative_scan(_combine_fast, totals, axis=0)
    ident1 = _elem_identity(1, d, C, dtype)
    prefixed = tuple(
        jnp.concatenate([i1, s[:-1]], axis=0) for i1, s in zip(ident1, scanned)
    )
    if init is not None:
        m_c, P_c = init
        e_c = (
            jnp.zeros((1, d, d), dtype),
            jnp.asarray(m_c, dtype).reshape(1, d, C),
            jnp.asarray(P_c, dtype).reshape(1, d, d),
            jnp.zeros((1, d, C), dtype),
            jnp.zeros((1, d, d), dtype),
        )
        e_cb = tuple(jnp.broadcast_to(e, (B,) + e.shape[1:]) for e in e_c)
        prefixed = _combine_fast(e_cb, prefixed)  # carry is EARLIER than all
    m0 = prefixed[1]  # (B, d, C) filtered mean entering each block
    P0 = prefixed[2]  # (B, d, d)

    # ---- phase 3: per-block replay from the known filtered init ----
    A_b = _block(jnp.concatenate([lgssm.A.astype(dtype), jnp.zeros((pad, d, d), dtype)]), B, T)
    Q_b = _block(jnp.concatenate([lgssm.Q.astype(dtype), jnp.zeros((pad, d, d), dtype)]), B, T)
    R_b = _block(jnp.concatenate([jnp.broadcast_to(lgssm.R.astype(dtype), (n,)), jnp.ones((pad,), dtype)]), B, T)
    Y_b = _block(jnp.concatenate([Y.astype(dtype), jnp.zeros((pad, C), dtype)]), B, T)
    M_b = _block(jnp.concatenate([jnp.ones((n,), dtype), jnp.zeros((pad,), dtype)]), B, T)
    I = jnp.eye(d, dtype=dtype)

    def p3(carry, inp):
        m, P = carry
        A_t, Q_t, R_t, Y_t, msk = inp
        mp = jnp.einsum("bij,bjc->bic", A_t, m)
        Pp = jnp.einsum("bij,bjk,blk->bil", A_t, P, A_t) + Q_t
        S = jnp.einsum("i,bij,j->b", H, Pp, H) + R_t
        v = Y_t - jnp.einsum("i,bic->bc", H, mp)
        K = jnp.einsum("bij,j->bi", Pp, H) / S[:, None]
        m_new = mp + K[:, :, None] * v[:, None, :]
        ImKH = I[None] - K[:, :, None] * H[None, None, :]
        P_new = (
            jnp.einsum("bij,bjk,blk->bil", ImKH, Pp, ImKH)
            + R_t[:, None, None] * jnp.einsum("bi,bj->bij", K, K)
        )  # Joseph form
        mk = (msk > 0.5)[:, None, None]  # (B, 1, 1) broadcasts over d, C/d
        m_c = jnp.where(mk, m_new, m)
        P_c = jnp.where(mk, P_new, P)
        return (m_c, P_c), (m_new, P_new, mp, Pp, S, v)

    init = (m0, P0)
    _, (m_s, P_s, mp_s, Pp_s, S_s, v_s) = jax.lax.scan(
        p3, init, (A_b, Q_b, R_b, Y_b, M_b)
    )

    m = _unblock(m_s, n)
    P = _unblock(P_s, n)
    mp = _unblock(mp_s, n)
    Pp = _unblock(Pp_s, n)
    S = _unblock(S_s, n)
    v = _unblock(v_s, n)
    ll = -0.5 * jnp.sum(_LOG_2PI + jnp.log(S)[:, None] + v * v / S[:, None], axis=0)
    return FilterResult(m=m, P=P, mp=mp, Pp=Pp, S=S, v=v, ll=ll)


def blocked_logpdf(lgssm: LGSSM, y, num_blocks: int = NUM_BLOCKS):
    res = blocked_filter(lgssm, y, num_blocks)
    return res.ll[0] if jnp.ndim(y) == 1 else res.ll


def blocked_decorrelate(lgssm: LGSSM, y, num_blocks: int = NUM_BLOCKS):
    """Whitening pass (lml, alpha); batched columns share one pass (K6)."""
    single = jnp.ndim(y) == 1
    res = blocked_filter(lgssm, y, num_blocks)
    alpha = res.v / jnp.sqrt(res.S)[:, None]
    if single:
        return res.ll[0], alpha[:, 0]
    return res.ll, alpha


# ---------------------------------------------------------------------------
# Smoother: blocked reverse scan over the smoothing-element monoid
# ---------------------------------------------------------------------------


def _smoother_elements_fast(lgssm: LGSSM, res: FilterResult, next_step=None):
    """(E, g, L) smoothing elements, adjugate-inverse variant of
    ``pkalman._smoother_elements`` (no batched LU over N matrices).
    Pp is a predicted covariance (>= Q > 0), safe to invert directly.

    next_step: optional (A, mp, Pp) of the step AFTER this series (a later
    segment's first step): the last element is then a REGULAR smoothing
    element toward that step instead of the terminal (0, m_n, P_n) — the
    segment-carry hook of ``ssm/segmented.py``."""
    A = lgssm.A
    m, P, mp, Pp = res.m, res.P, res.mp, res.Pp
    d = A.shape[-1]

    A_next = A[1:]
    Pp_next = Pp[1:]
    mp_next = mp[1:]
    if next_step is not None:
        A1, mp1, Pp1 = next_step
        A_next = jnp.concatenate([A_next, A1.reshape(1, d, d)], axis=0)
        Pp_next = jnp.concatenate([Pp_next, Pp1.reshape(1, d, d)], axis=0)
        mp_next = jnp.concatenate([mp_next, mp1.reshape((1,) + mp.shape[1:])], axis=0)
        m_head, P_head = m, P
    else:
        m_head, P_head = m[:-1], P[:-1]
    PAt = jnp.einsum("nab,ncb->nac", P_head, A_next)  # P_k A_{k+1}^T
    E = PAt @ _inv_small(Pp_next)
    g = m_head - jnp.einsum("nab,nbB->naB", E, mp_next)
    L = P_head - E @ Pp_next @ jnp.swapaxes(E, -1, -2)
    if next_step is not None:
        return E, g, L

    E_last = jnp.zeros((1, d, d), A.dtype)
    return (
        jnp.concatenate([E, E_last], axis=0),
        jnp.concatenate([g, m[-1:]], axis=0),
        jnp.concatenate([L, P[-1:]], axis=0),
    )


def _combine_smooth(later, earlier):
    """(earlier o later): earlier element's gain applied on the left —
    identical to ``pkalman._combine_smooth``."""
    E_l, g_l, L_l = later
    E_e, g_e, L_e = earlier
    E = E_e @ E_l
    g = jnp.einsum("...ab,...bB->...aB", E_e, g_l) + g_e
    L = E_e @ L_l @ jnp.swapaxes(E_e, -1, -2) + L_e
    return E, g, L


def _smooth_identity(B, d, C, dtype):
    return (
        jnp.broadcast_to(jnp.eye(d, dtype=dtype), (B, d, d)),
        jnp.zeros((B, d, C), dtype),
        jnp.zeros((B, d, d), dtype),
    )


def blocked_suffix_scan(E, g, L, num_blocks: int = NUM_BLOCKS, terminal=None):
    """Inclusive suffix combine of smoothing-algebra elements, blocked.

    out_k = elem_k o elem_{k+1} o ... o elem_{n-1} under the combine
    (E, g, L)_earlier o (E, g, L)_later = (Ee El, Ee gl + ge, Ee Ll Ee^T + Le)
    — the shared algebra of the RTS smoothing recursion AND the De Jong /
    Koopman disturbance-smoother adjoint recursions
        r_k = g_k + E_k r_{k+1}          (affine suffix)
        N_k = L_k + E_k N_{k+1} E_k^T    (congruence suffix).

    terminal: optional element (g_t (d, C), L_t (d, d)) appended AFTER the
    last step with E_t = 0 — the segment-carry hook of ``ssm/segmented.py``:
    out_k = elem_k o ... o elem_{n-1} o (0, g_t, L_t), i.e. the recursion
    continues into a later segment whose scanned state at its first step is
    (g_t, L_t).  ``None`` = suffix ends at step n-1 (unchanged behavior).

    Same 3-phase schedule as ``blocked_filter``: within-block reverse scan
    (N/B sequential depth), tiny reverse exclusive scan over block totals,
    fully-parallel fold.  E (n, d, d), g (n, d, C), L (n, d, d)."""
    n, d = E.shape[0], E.shape[-1]
    C = g.shape[-1]
    dtype = E.dtype
    B = max(1, min(num_blocks, n))
    T = -(-n // B)
    pad = B * T - n

    ident_pad = _smooth_identity(pad, d, C, dtype)
    elems_b = tuple(
        _block(jnp.concatenate([e, ip], axis=0), B, T)
        for e, ip in zip((E, g, L), ident_pad)
    )

    def p1(carry, elem_t):
        new = _combine_smooth(carry, elem_t)  # carry = later steps' suffix
        return new, new

    totals, suffix = jax.lax.scan(
        p1, _smooth_identity(B, d, C, dtype), elems_b, reverse=True
    )
    scanned = jax.lax.associative_scan(_combine_smooth, totals, axis=0, reverse=True)
    ident1 = _smooth_identity(1, d, C, dtype)
    later = tuple(
        jnp.concatenate([s[1:], i1], axis=0) for s, i1 in zip(scanned, ident1)
    )
    if terminal is not None:
        g_t, L_t = terminal
        e_t = (
            jnp.zeros((1, d, d), dtype),
            jnp.asarray(g_t, dtype).reshape(1, d, C),
            jnp.asarray(L_t, dtype).reshape(1, d, d),
        )
        e_tb = tuple(jnp.broadcast_to(e, (B,) + e.shape[1:]) for e in e_t)
        # new_later_b = later_b o e_t: the terminal is LATER than everything.
        later = _combine_smooth(e_tb, later)
    later_b = tuple(jnp.broadcast_to(x[None], (T,) + x.shape) for x in later)
    out = _combine_smooth(later_b, suffix)
    return tuple(_unblock(x, n) for x in out)


# ---------------------------------------------------------------------------
# FFBS posterior sampling on the blocked engine (production-scale
# ``posterior_rand``, reference ``src/gp/tmp.jl:167``).
#
# The backward-sampling conditionals ARE the smoothing elements: with
# E_k = P_k A_{k+1}^T Pp_{k+1}^-1, the FFBS recursion is
#     x_k | x_{k+1} ~ N(m_k + E_k (x_{k+1} - mp_{k+1}),  L_k),
#     L_k = P_k - E_k Pp_{k+1} E_k^T,
# i.e. exactly (E, g, L) from ``_smoother_elements_fast`` (g = m - E mp_next;
# last element (0, m_n, P_n)).  Draw all step noises upfront
# (eta_k = chol(L_k) xi_k) and the joint sample is the AFFINE suffix
#     x_k = (g_k + eta_k) + E_k x_{k+1}
# — one ``blocked_suffix_scan`` with W = 0, N/B sequential depth instead of
# the O(N)-depth sequential sampler in ``ssm/kalman.py::posterior_sample``.
# Exact: composing the affine conditionals with pre-drawn standard normals
# reproduces the joint backward factorization of the posterior.
# ---------------------------------------------------------------------------


def _chol_floor(P):
    """Batched small-dim Cholesky robust to degenerate FFBS conditionals.

    The conditional covariance L_k = P_k - E_k Pp_{k+1} E_k^T cancels to
    ~machine epsilon at near-deterministic transitions (tiny time gaps); in
    f32 the residual can be indefinite at magnitudes far above any fixed
    jitter (measured on TPU: NaN draws at N=20k with dt ~ 1e-3 x
    lengthscale).  Two guards: (1) a RELATIVE jitter scaled to each step's
    trace, (2) any step whose Cholesky still comes out non-finite falls
    back to the diagonal sqrt — at such steps the conditional noise is
    O(eps), so dropping its off-diagonal correlation is harmless."""
    d = P.shape[-1]
    if P.dtype == jnp.float64:
        eps, rel = 1e-12, 1e-10
    else:
        eps, rel = 1e-8, 1e-5
    I = jnp.eye(d, dtype=P.dtype)
    tr = jnp.trace(P, axis1=-2, axis2=-1) / d
    jit = eps + rel * jnp.maximum(tr, 0.0)
    L = jnp.linalg.cholesky(P + jit[..., None, None] * I)
    diag = jnp.sqrt(jnp.maximum(jnp.diagonal(P, axis1=-2, axis2=-1), 0.0) + eps)
    fallback = diag[..., :, None] * I
    bad = ~jnp.all(jnp.isfinite(L), axis=(-2, -1))
    return jnp.where(bad[..., None, None], fallback, L)


def _combine_affine(later, earlier):
    """(earlier o later) of the affine part only: x_k = g_k + E_k x_later."""
    E_l, g_l = later
    E_e, g_e = earlier
    return E_e @ E_l, jnp.einsum("...ab,...bB->...aB", E_e, g_l) + g_e


def _affine_identity(B, d, C, dtype):
    return (
        jnp.broadcast_to(jnp.eye(d, dtype=dtype), (B, d, d)),
        jnp.zeros((B, d, C), dtype),
    )


def blocked_affine_suffix_scan(E, g, num_blocks: int = NUM_BLOCKS, terminal=None):
    """``blocked_suffix_scan`` restricted to the affine (E, g) half — the
    FFBS sampling recursion x_k = g_k + E_k x_{k+1} needs no L-congruence,
    and dropping it halves the scan's work AND its padded (N, d, d) plan
    temporaries (the full scan's sampling program OOM'd at N = 1e6 on a
    16 GB v5e — measured r5).  terminal: optional g_t (d, C) appended with
    E_t = 0 (segment carry)."""
    n, d = E.shape[0], E.shape[-1]
    C = g.shape[-1]
    dtype = E.dtype
    B = max(1, min(num_blocks, n))
    T = -(-n // B)
    pad = B * T - n

    ident_pad = _affine_identity(pad, d, C, dtype)
    elems_b = tuple(
        _block(jnp.concatenate([e, ip], axis=0), B, T)
        for e, ip in zip((E, g), ident_pad)
    )

    def p1(carry, elem_t):
        new = _combine_affine(carry, elem_t)
        return new, new

    totals, suffix = jax.lax.scan(
        p1, _affine_identity(B, d, C, dtype), elems_b, reverse=True
    )
    scanned = jax.lax.associative_scan(_combine_affine, totals, axis=0, reverse=True)
    ident1 = _affine_identity(1, d, C, dtype)
    later = tuple(
        jnp.concatenate([s[1:], i1], axis=0) for s, i1 in zip(scanned, ident1)
    )
    if terminal is not None:
        e_t = (
            jnp.zeros((1, d, d), dtype),
            jnp.asarray(terminal, dtype).reshape(1, d, C),
        )
        e_tb = tuple(jnp.broadcast_to(e, (B,) + e.shape[1:]) for e in e_t)
        later = _combine_affine(e_tb, later)
    later_b = tuple(jnp.broadcast_to(x[None], (T,) + x.shape) for x in later)
    out = _combine_affine(later_b, suffix)
    return tuple(_unblock(x, n) for x in out)


def ffbs_draw(E, g, L, xi, num_blocks: int = NUM_BLOCKS, x_term=None):
    """State-space joint posterior draws from FFBS elements.

    E (n, d, d), g (n, d, 1), L (n, d, d) as produced by
    ``_smoother_elements_fast``; xi (n, d, S) standard normals; x_term
    optional (d, S) draw of the step AFTER this series (segment carry).
    Returns x (n, d, S)."""
    g_s = g + _chol_floor(L) @ xi  # (n, d, S)
    terminal = None if x_term is None else jnp.asarray(x_term, E.dtype)
    _, x = blocked_affine_suffix_scan(E, g_s, num_blocks, terminal=terminal)
    return x


@jax.default_matmul_precision("highest")
def blocked_posterior_sample(
    key,
    lgssm: LGSSM,
    y,
    num_samples: int = 1,
    num_blocks: int = NUM_BLOCKS,
    filter_result: FilterResult = None,
    xi=None,
):
    """Joint posterior samples of f = H x given y — ``posterior_rand``
    (``src/gp/tmp.jl:167``) on the production blocked engine.  Returns
    (num_samples, N).

    filter_result: pass a precomputed ``blocked_filter`` result to stage the
    forward and sampling passes as separate dispatches (the split that keeps
    million-step programs compilable here; see BENCHMARKS.md).
    xi: optional (N, d, num_samples) standard normals overriding the draw —
    the deterministic hook that makes blocked == segmented == the sequential
    recursion testable bitwise."""
    Y, _ = _ensure_batch(y)
    if Y.shape[1] != 1:
        raise ValueError("blocked_posterior_sample expects one observation column")
    res = (
        filter_result
        if filter_result is not None
        else blocked_filter(lgssm, Y, num_blocks)
    )
    n, d = lgssm.num_steps, lgssm.dim
    dtype = lgssm.A.dtype
    if xi is None:
        xi = jax.random.normal(key, (n, d, num_samples), dtype)
    else:
        xi = jnp.asarray(xi, dtype)
    E, g, L = _smoother_elements_fast(lgssm, res)
    x = ffbs_draw(E, g, L, xi, num_blocks)
    H = lgssm.H.astype(dtype)
    return jnp.einsum("d,nds->sn", H, x)


@jax.default_matmul_precision("highest")
def blocked_smooth(
    lgssm: LGSSM,
    y,
    filter_result: FilterResult = None,
    num_blocks: int = NUM_BLOCKS,
    boundary=None,
) -> SmoothResult:
    """RTS smoother as a blocked reverse scan; SmoothResult parity with
    ``rts_smooth``.  Three phases mirror the filter: within-block reverse
    suffix reduction, tiny reverse exclusive scan over block totals, then an
    elementwise (fully parallel) combine — no replay pass needed because the
    smoothed moments ARE the combined suffix elements.

    boundary: optional (A1, mp1, Pp1, ms1, Ps1) — transition/predicted
    moments and SMOOTHED moments of the step right AFTER this series (a
    later segment's first step, ``ssm/segmented.py``): the backward
    recursion then continues into that segment exactly."""
    Y, single = _ensure_batch(y)
    res = filter_result if filter_result is not None else blocked_filter(lgssm, Y, num_blocks)

    if boundary is None:
        elems = _smoother_elements_fast(lgssm, res)
        terminal = None
    else:
        A1, mp1, Pp1, ms1, Ps1 = boundary
        elems = _smoother_elements_fast(lgssm, res, next_step=(A1, mp1, Pp1))
        terminal = (ms1, Ps1)
    _, ms, Ps = blocked_suffix_scan(*elems, num_blocks=num_blocks, terminal=terminal)
    H = lgssm.H.astype(lgssm.A.dtype)
    f_mean = jnp.einsum("d,ndb->nb", H, ms)
    f_var = jnp.einsum("d,nde,e->n", H, Ps, H)
    if single:
        f_mean = f_mean[:, 0]
    return SmoothResult(mean=f_mean, var=jnp.maximum(f_var, 0.0), ll=res.ll, ms=ms, Ps=Ps)
