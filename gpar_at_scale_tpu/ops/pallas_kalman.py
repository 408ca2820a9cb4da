"""Pallas TPU kernel: lane-parallel blocked-scan Kalman filter.

The speed-of-light single-chip design for long time series (the 1M-step
north-star config, BASELINE.md).  Both stock engines leave performance on the
table: ``lax.scan`` serializes N tiny steps; ``lax.associative_scan`` is
parallel but makes O(log N) full passes over the element stream in HBM.
This kernel does the classic two-level scan with exactly TWO streaming passes:

  phase 1  -- split the series into LANES = 8*128 = 1024 contiguous blocks,
              one per VPU lane; every grid step t combines each block's t-th
              filtering element into a per-block running element.  All d x d
              algebra (d <= 3) is unrolled into elementwise ops on (8, 128)
              tiles, so each instruction advances 1024 blocks at once.
  phase 2  -- associative scan over the 1024 block elements (tiny, XLA).
  phase 3  -- re-stream each block with its prefix as the known filtered
              init, running the plain Kalman recursion and emitting the
              whitened innovations alpha_k, log S_k and the log-likelihood.

Elements are the Sarkka & Garcia-Fernandez filtering elements
(A, b, C, eta, J) with combine

    Z = I + C_i J_j          (eigenvalues >= 1: C, J PSD -- the unrolled
    A_ij = A_j Z^-1 A_i       adjugate inverse is safe in f32)
    b_ij = A_j Z^-1 (b_i + C_i eta_j) + b_j
    C_ij = A_j Z^-1 C_i A_j^T + C_j
    eta/J symmetric-dual (see ssm/pkalman.py)

so phase 1's running element is exactly the block's prior-to-posterior
affine-Gaussian map, and phase 2's exclusive prefix gives each block its
filtered init (b, C).

Padding: the series is padded to LANES * T steps; padded steps carry
mask = 0 and are skipped (element unchanged, no ll/alpha contribution).

Returns the same (ll, alpha, sum log S) contract as
``ssm.kalman.decorrelate`` for a single observation column.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpar_at_scale_tpu.ssm.markov import LGSSM

_LOG_2PI = 1.8378770664093453
SUB, LANE = 8, 128
LANES = SUB * LANE  # blocks processed in lockstep


# ---------------------------------------------------------------------------
# Unrolled d x d helpers on (8, 128) tiles.  Matrices are dicts keyed (i, j),
# vectors dicts keyed i — plain Python containers of traced (8, 128) values.
# ---------------------------------------------------------------------------


def _matmul(d, X, Y):
    return {
        (i, j): sum(X[(i, k)] * Y[(k, j)] for k in range(d)) for i in range(d) for j in range(d)
    }


def _matvec(d, X, v):
    return {i: sum(X[(i, k)] * v[k] for k in range(d)) for i in range(d)}


def _transpose(d, X):
    return {(i, j): X[(j, i)] for i in range(d) for j in range(d)}


def _add(d, X, Y):
    return {k: X[k] + Y[k] for k in X}


def _inv(d, Z):
    """Adjugate inverse, unrolled for d in {1, 2, 3}."""
    if d == 1:
        return {(0, 0): 1.0 / Z[(0, 0)]}
    if d == 2:
        det = Z[(0, 0)] * Z[(1, 1)] - Z[(0, 1)] * Z[(1, 0)]
        inv_det = 1.0 / det
        return {
            (0, 0): Z[(1, 1)] * inv_det,
            (0, 1): -Z[(0, 1)] * inv_det,
            (1, 0): -Z[(1, 0)] * inv_det,
            (1, 1): Z[(0, 0)] * inv_det,
        }
    c00 = Z[(1, 1)] * Z[(2, 2)] - Z[(1, 2)] * Z[(2, 1)]
    c01 = Z[(1, 2)] * Z[(2, 0)] - Z[(1, 0)] * Z[(2, 2)]
    c02 = Z[(1, 0)] * Z[(2, 1)] - Z[(1, 1)] * Z[(2, 0)]
    det = Z[(0, 0)] * c00 + Z[(0, 1)] * c01 + Z[(0, 2)] * c02
    inv_det = 1.0 / det
    c10 = Z[(0, 2)] * Z[(2, 1)] - Z[(0, 1)] * Z[(2, 2)]
    c11 = Z[(0, 0)] * Z[(2, 2)] - Z[(0, 2)] * Z[(2, 0)]
    c12 = Z[(0, 1)] * Z[(2, 0)] - Z[(0, 0)] * Z[(2, 1)]
    c20 = Z[(0, 1)] * Z[(1, 2)] - Z[(0, 2)] * Z[(1, 1)]
    c21 = Z[(0, 2)] * Z[(1, 0)] - Z[(0, 0)] * Z[(1, 2)]
    c22 = Z[(0, 0)] * Z[(1, 1)] - Z[(0, 1)] * Z[(1, 0)]
    return {
        (0, 0): c00 * inv_det,
        (0, 1): c10 * inv_det,
        (0, 2): c20 * inv_det,
        (1, 0): c01 * inv_det,
        (1, 1): c11 * inv_det,
        (1, 2): c21 * inv_det,
        (2, 0): c02 * inv_det,
        (2, 1): c12 * inv_det,
        (2, 2): c22 * inv_det,
    }


def _read_mat(ref, d):
    return {(i, j): ref[0, i * d + j] for i in range(d) for j in range(d)}


def _read_vec(ref, d):
    return {i: ref[0, i] for i in range(d)}


def _where_mat(d, m, X, Y):
    return {k: jnp.where(m, X[k], Y[k]) for k in X}


# ---------------------------------------------------------------------------
# Phase 1: per-block element reduction
# ---------------------------------------------------------------------------


def _combine(d, Ai, bi, Ci, etai, Ji, Aj, bj, Cj, etaj, Jj):
    """(i earlier) o (j later) — filtering-element combine, unrolled."""
    CiJj = _matmul(d, Ci, Jj)
    Z = {(i, j): CiJj[(i, j)] + (1.0 if i == j else 0.0) for i in range(d) for j in range(d)}
    Zinv = _inv(d, Z)
    AjZ = _matmul(d, Aj, Zinv)
    A_new = _matmul(d, AjZ, Ai)
    Ci_etaj = _matvec(d, Ci, etaj)
    b_new = _add(d, _matvec(d, AjZ, _add(d, bi, Ci_etaj)), bj)
    C_new = _add(d, _matmul(d, _matmul(d, AjZ, Ci), _transpose(d, Aj)), Cj)

    JjCi = _matmul(d, Jj, Ci)
    Z2 = {(i, j): JjCi[(i, j)] + (1.0 if i == j else 0.0) for i in range(d) for j in range(d)}
    Z2inv = _inv(d, Z2)
    AiTZ2 = _matmul(d, _transpose(d, Ai), Z2inv)
    Jj_bi = _matvec(d, Jj, bi)
    eta_new = _add(d, _matvec(d, AiTZ2, {i: etaj[i] - Jj_bi[i] for i in range(d)}), etai)
    J_new = _add(d, _matmul(d, _matmul(d, AiTZ2, Jj), Ai), Ji)
    return A_new, b_new, C_new, eta_new, J_new


def _phase1_kernel(d, A_ref, Q_ref, R_ref, Y_ref, M_ref, eA, eb, eC, eeta, eJ, s_A, s_b, s_C, s_eta, s_J):
    """Grid step t: combine each block's t-th element into its running
    element held in scratch; final step writes the block elements out."""
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _init():
        for i in range(d):
            s_b[i] = jnp.zeros((SUB, LANE), jnp.float32)
            s_eta[i] = jnp.zeros((SUB, LANE), jnp.float32)
            for j in range(d):
                s_A[i * d + j] = (
                    jnp.ones((SUB, LANE), jnp.float32)
                    if i == j
                    else jnp.zeros((SUB, LANE), jnp.float32)
                )
                s_C[i * d + j] = jnp.zeros((SUB, LANE), jnp.float32)
                s_J[i * d + j] = jnp.zeros((SUB, LANE), jnp.float32)

    # Build the single-step element of step t for all blocks.
    A = _read_mat(A_ref, d)
    Q = _read_mat(Q_ref, d)
    R = R_ref[0]
    y = Y_ref[0]
    m = M_ref[0] > 0.5

    # S = H Q H^T + R = Q[0,0] + R ; K = Q[:,0]/S  (H = e1^T)
    S = Q[(0, 0)] + R
    K = {i: Q[(i, 0)] / S for i in range(d)}
    # A' = (I - K H) A : row i of A minus K_i * row 0
    A_el = {
        (i, j): A[(i, j)] - K[i] * A[(0, j)] for i in range(d) for j in range(d)
    }
    b_el = {i: K[i] * y for i in range(d)}
    C_el = {
        (i, j): Q[(i, j)] - K[i] * Q[(0, j)] for i in range(d) for j in range(d)
    }
    # eta = A^T e1 y / S ; J = A^T e1 e1^T A / S  (row 0 of A)
    eta_el = {i: A[(0, i)] * (y / S) for i in range(d)}
    J_el = {
        (i, j): A[(0, i)] * A[(0, j)] / S for i in range(d) for j in range(d)
    }

    # running element from scratch
    rA = {(i, j): s_A[i * d + j] for i in range(d) for j in range(d)}
    rb = {i: s_b[i] for i in range(d)}
    rC = {(i, j): s_C[i * d + j] for i in range(d) for j in range(d)}
    reta = {i: s_eta[i] for i in range(d)}
    rJ = {(i, j): s_J[i * d + j] for i in range(d) for j in range(d)}

    nA, nb, nC, neta, nJ = _combine(d, rA, rb, rC, reta, rJ, A_el, b_el, C_el, eta_el, J_el)
    nA = _where_mat(d, m, nA, rA)
    nb = _where_mat(d, m, nb, rb)
    nC = _where_mat(d, m, nC, rC)
    neta = _where_mat(d, m, neta, reta)
    nJ = _where_mat(d, m, nJ, rJ)

    for i in range(d):
        s_b[i] = nb[i]
        s_eta[i] = neta[i]
        for j in range(d):
            s_A[i * d + j] = nA[(i, j)]
            s_C[i * d + j] = nC[(i, j)]
            s_J[i * d + j] = nJ[(i, j)]

    @pl.when(t == T - 1)
    def _emit():
        for i in range(d):
            eb[i] = s_b[i]
            eeta[i] = s_eta[i]
            for j in range(d):
                eA[i * d + j] = s_A[i * d + j]
                eC[i * d + j] = s_C[i * d + j]
                eJ[i * d + j] = s_J[i * d + j]


# ---------------------------------------------------------------------------
# Phase 3: per-block replay with known filtered init
# ---------------------------------------------------------------------------


def _phase3_kernel(d, A_ref, Q_ref, R_ref, Y_ref, M_ref, m0_ref, P0_ref, alpha_out, logs_out, K_out, m_out, P_out, ll_ref, ls_ref, s_m, s_P):
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _init():
        for i in range(d):
            s_m[i] = m0_ref[0, i]
            for j in range(d):
                s_P[i * d + j] = P0_ref[0, i * d + j]
        ll_ref[...] = jnp.zeros((SUB, LANE), jnp.float32)
        ls_ref[...] = jnp.zeros((SUB, LANE), jnp.float32)

    A = _read_mat(A_ref, d)
    Q = _read_mat(Q_ref, d)
    R = R_ref[0]
    y = Y_ref[0]
    msk = M_ref[0] > 0.5

    m = {i: s_m[i] for i in range(d)}
    P = {(i, j): s_P[i * d + j] for i in range(d) for j in range(d)}

    mp = _matvec(d, A, m)
    Pp = _add(d, _matmul(d, _matmul(d, A, P), _transpose(d, A)), Q)
    S = Pp[(0, 0)] + R
    v = y - mp[0]
    K = {i: Pp[(i, 0)] / S for i in range(d)}
    m_new = {i: mp[i] + K[i] * v for i in range(d)}
    # Joseph: P = (I - K H) Pp (I - K H)^T + R K K^T  (H = e1^T)
    ImKH_Pp = {
        (i, j): Pp[(i, j)] - K[i] * Pp[(0, j)] for i in range(d) for j in range(d)
    }
    P_new = {
        (i, j): ImKH_Pp[(i, j)] - ImKH_Pp[(i, 0)] * K[j] + R * K[i] * K[j]
        for i in range(d)
        for j in range(d)
    }

    logS = jnp.log(S)
    alpha = v / jnp.sqrt(S)
    alpha_out[0] = jnp.where(msk, alpha, 0.0)
    logs_out[0] = jnp.where(msk, logS, 0.0)
    for i in range(d):
        K_out[0, i] = K[i]
        m_out[0, i] = jnp.where(msk, m_new[i], m[i])
        for j in range(d):
            P_out[0, i * d + j] = jnp.where(msk, P_new[(i, j)], P[(i, j)])
    ll_ref[...] += jnp.where(msk, -0.5 * (_LOG_2PI + logS + alpha * alpha), 0.0)
    ls_ref[...] += jnp.where(msk, logS, 0.0)

    for i in range(d):
        s_m[i] = jnp.where(msk, m_new[i], m[i])
        for j in range(d):
            s_P[i * d + j] = jnp.where(msk, P_new[(i, j)], P[(i, j)])


# ---------------------------------------------------------------------------
# Host-side orchestration
# ---------------------------------------------------------------------------


def _to_lanes(x, T):
    """(LANES*T, ...) -> (T, ..., SUB, LANE): block b's step t lands at
    [t, ..., b // LANE, b % LANE]."""
    trail = x.shape[1:]
    x = x.reshape((LANES, T) + trail)  # block-major
    # -> (T, trail..., SUB, LANE)
    perm = (1,) + tuple(range(2, 2 + len(trail))) + (0,)
    x = jnp.transpose(x, perm)  # (T, trail..., LANES)
    return x.reshape((T,) + trail + (SUB, LANE))


def _flatten_mat(x):
    """(T, d, d, SUB, LANE) -> (T, d*d, SUB, LANE)."""
    T, d, _, s, l = x.shape
    return x.reshape(T, d * d, s, l)


def pallas_supported(lgssm: LGSSM) -> bool:
    """The blocked-scan kernels unroll d <= 3 algebra and hard-code the
    emission row H = e1^T (single Matern block).  Sum-of-Matern SDEs
    (block-diagonal state, H = [1,0,...,1,0,...]) must dispatch to the
    associative engine — including d <= 3 sums like Matern12+Matern12.
    H never depends on traced hyperparameters (it is assembled from
    constants in ``ssm/markov.py``), so this check is static under jit; a
    traced H conservatively returns False."""
    if lgssm.dim > 3:
        return False
    H = lgssm.H
    if isinstance(H, jax.core.Tracer):
        return False
    import numpy as np

    h = np.asarray(H)
    return bool(h[0] == 1.0 and np.all(h[1:] == 0.0))


def _decorrelate_fallback(lgssm: LGSSM, y, return_gains, return_moments, return_full):
    """Associative-scan implementation of the ``pallas_decorrelate``
    contract for SDEs the unrolled kernels cannot express (sum kernels:
    d > 3 or H != e1) — graceful dispatch instead of a ValueError."""
    from gpar_at_scale_tpu.ssm.pkalman import parallel_filter

    res = parallel_filter(lgssm, jnp.asarray(y, jnp.float32))
    S = res.S
    alpha = res.v[:, 0] / jnp.sqrt(S)
    ll = res.ll[0]
    logdet = jnp.sum(jnp.log(S))
    if return_moments or return_full:
        m = res.m[:, :, 0]
        P = res.P
        if not return_full:
            return ll, alpha, logdet, m, P
    if not (return_gains or return_full):
        return ll, alpha, logdet
    K = jnp.einsum("nij,j->ni", res.Pp, lgssm.H.astype(res.Pp.dtype)) / S[:, None]
    if return_full:
        return ll, alpha, logdet, S, K, m, P
    return ll, alpha, logdet, S, K


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "return_gains", "return_moments", "return_full"),
)
def pallas_decorrelate(
    lgssm: LGSSM,
    y,
    interpret: bool = False,
    return_gains: bool = False,
    return_moments: bool = False,
    return_full: bool = False,
):
    """Whitening pass (ll, alpha, sum log S) via the blocked-scan kernel.

    f32, single observation column.  Single-block Matern SDEs (d <= 3,
    H = e1) run the Pallas kernels; sum-kernel SDEs dispatch to the
    associative-scan engine with the same contract.
    With ``return_gains=True`` additionally returns the per-step innovation
    variances S (N,) and Kalman gains K (N, d) — consumed by the batched
    column-whitening kernel (``ops/pallas_whiten.py``).  With
    ``return_moments=True`` returns the filtered moments m (N, d), P (N, d, d)
    — consumed by the blocked-scan smoother (``ops/pallas_smoother.py``).
    With ``return_full=True`` returns (ll, alpha, logdet, S, K, m, P) — the
    disturbance-smoother VJP (``ops/pallas_grad.py``) consumes everything.
    """
    d = lgssm.dim
    if not pallas_supported(lgssm):
        return _decorrelate_fallback(lgssm, y, return_gains, return_moments, return_full)
    n = lgssm.num_steps
    f32 = jnp.float32

    T = -(-n // LANES)  # steps per block
    pad = LANES * T - n

    A = jnp.concatenate([lgssm.A.astype(f32), jnp.zeros((pad, d, d), f32)])
    Q = jnp.concatenate([lgssm.Q.astype(f32), jnp.tile(jnp.eye(d, dtype=f32)[None], (pad, 1, 1))])
    R = jnp.concatenate([lgssm.R.astype(f32), jnp.ones((pad,), f32)])
    Y = jnp.concatenate([jnp.asarray(y, f32), jnp.zeros((pad,), f32)])
    Mask = jnp.concatenate([jnp.ones((n,), f32), jnp.zeros((pad,), f32)])
    out = _decorrelate_core(
        d, T, A, Q, R, Y, Mask, None, interpret, return_gains, return_moments, return_full
    )[0]
    alpha = out[1]
    return (out[0], alpha[:n]) + tuple(
        o if jnp.ndim(o) == 0 else o[:n] for o in out[2:]
    )


def _elem_identity(d, dtype=jnp.float32):
    """Identity of the filtering-element monoid (A, b, C, eta, J)."""
    return (
        jnp.eye(d, dtype=dtype),
        jnp.zeros((d, 1), dtype),
        jnp.zeros((d, d), dtype),
        jnp.zeros((d, 1), dtype),
        jnp.zeros((d, d), dtype),
    )


def _decorrelate_core(
    d, T, A, Q, R, Y, Mask, carry, interpret, return_gains, return_moments, return_full
):
    """Blocked-scan whitening over a padded (LANES*T,) segment.

    carry: None (cold start: x_0 ~ N(0, Q_0), the LGSSM convention) or the
    combined filtering element of everything BEFORE this segment — phase 2's
    exclusive prefix is seeded with it, which is how segments chain exactly
    (``pallas_decorrelate_chunked``).  Returns (outputs, carry_out) with
    outputs in the ``pallas_decorrelate`` order, un-sliced (padded length),
    and carry_out = carry ∘ (this segment's combined element).
    """
    f32 = jnp.float32
    A_l = _flatten_mat(_to_lanes(A, T))  # (T, d*d, 8, 128)
    Q_l = _flatten_mat(_to_lanes(Q, T))
    R_l = _to_lanes(R, T)  # (T, 8, 128)
    Y_l = _to_lanes(Y, T)
    M_l = _to_lanes(Mask, T)

    mat_spec = pl.BlockSpec((1, d * d, SUB, LANE), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, SUB, LANE), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
    out_mat = jax.ShapeDtypeStruct((d * d, SUB, LANE), f32)
    out_vec = jax.ShapeDtypeStruct((d, SUB, LANE), f32)

    # ---- phase 1 ----
    def p1(A_ref, Q_ref, R_ref, Y_ref, M_ref, eA, eb, eC, eeta, eJ, *scratch):
        _phase1_kernel(d, A_ref, Q_ref, R_ref, Y_ref, M_ref, eA, eb, eC, eeta, eJ, *scratch)

    eA, eb, eC, eeta, eJ = pl.pallas_call(
        p1,
        grid=(T,),
        in_specs=[mat_spec, mat_spec, vec_spec, vec_spec, vec_spec],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(out_mat, out_vec, out_mat, out_vec, out_mat),
        scratch_shapes=[
            pltpu.VMEM((d * d, SUB, LANE), f32),
            pltpu.VMEM((d, SUB, LANE), f32),
            pltpu.VMEM((d * d, SUB, LANE), f32),
            pltpu.VMEM((d, SUB, LANE), f32),
            pltpu.VMEM((d * d, SUB, LANE), f32),
        ],
        interpret=interpret,
    )(A_l, Q_l, R_l, Y_l, M_l)

    # ---- phase 2: exclusive prefix over the LANES block elements (XLA) ----
    def unlane_mat(x):  # (d*d, 8, 128) -> (LANES, d, d)
        return x.reshape(d, d, LANES).transpose(2, 0, 1)

    def unlane_vec(x):
        return x.reshape(d, LANES).transpose(1, 0)

    bA = unlane_mat(eA)
    bb = unlane_vec(eb)[:, :, None]  # (LANES, d, 1) batch axis B=1
    bC = unlane_mat(eC)
    beta = unlane_vec(eeta)[:, :, None]
    bJ = unlane_mat(eJ)

    from gpar_at_scale_tpu.ssm.pkalman import _combine as combine_xla

    elems = (bA, bb, bC, beta, bJ)
    with jax.default_matmul_precision("highest"):
        scanned = jax.lax.associative_scan(combine_xla, elems, axis=0)
    # exclusive prefix: shift right, identity at block 0, then compose the
    # cross-segment carry in front (identity when carry is None).
    ident = _elem_identity(d)
    shifted = tuple(
        jnp.concatenate([e0[None], s[:-1]], axis=0)
        for e0, s in zip(ident, scanned)
    )
    if carry is None:
        carry = ident
    carry_b = tuple(jnp.broadcast_to(c[None], (LANES,) + c.shape) for c in carry)
    with jax.default_matmul_precision("highest"):
        prefixed = combine_xla(carry_b, shifted)
        carry_out = tuple(
            c[0]
            for c in combine_xla(
                tuple(c[None] for c in carry), tuple(s[-1:] for s in scanned)
            )
        )
    m0 = prefixed[1][:, :, 0]  # (LANES, d)
    P0 = prefixed[2]  # (LANES, d, d)

    m0_l = m0.transpose(1, 0).reshape(1, d, SUB, LANE)
    P0_l = P0.transpose(1, 2, 0).reshape(1, d, d, LANES).reshape(1, d * d, SUB, LANE)

    # ---- phase 3 ----
    def p3(A_ref, Q_ref, R_ref, Y_ref, M_ref, m0_ref, P0_ref, alpha_out, logs_out, K_out, m_out, P_out, ll_ref, ls_ref, *scratch):
        _phase3_kernel(
            d, A_ref, Q_ref, R_ref, Y_ref, M_ref, m0_ref, P0_ref, alpha_out, logs_out, K_out, m_out, P_out, ll_ref, ls_ref, *scratch
        )

    const_vec = pl.BlockSpec((1, d, SUB, LANE), lambda t: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    const_mat = pl.BlockSpec((1, d * d, SUB, LANE), lambda t: (0, 0, 0, 0), memory_space=pltpu.VMEM)

    kvec_spec = pl.BlockSpec((1, d, SUB, LANE), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM)
    kmat_spec = pl.BlockSpec((1, d * d, SUB, LANE), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM)
    alpha_l, logs_l, K_l, m_l, P_l, ll_l, ls_l = pl.pallas_call(
        p3,
        grid=(T,),
        in_specs=[mat_spec, mat_spec, vec_spec, vec_spec, vec_spec, const_vec, const_mat],
        out_specs=(
            vec_spec,
            vec_spec,
            kvec_spec,
            kvec_spec,
            kmat_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, SUB, LANE), f32),
            jax.ShapeDtypeStruct((T, SUB, LANE), f32),
            jax.ShapeDtypeStruct((T, d, SUB, LANE), f32),
            jax.ShapeDtypeStruct((T, d, SUB, LANE), f32),
            jax.ShapeDtypeStruct((T, d * d, SUB, LANE), f32),
            jax.ShapeDtypeStruct((SUB, LANE), f32),
            jax.ShapeDtypeStruct((SUB, LANE), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, SUB, LANE), f32),
            pltpu.VMEM((d * d, SUB, LANE), f32),
        ],
        interpret=interpret,
    )(A_l, Q_l, R_l, Y_l, M_l, m0_l, P0_l)

    # un-lane alpha: (T, 8, 128) -> (LANES*T,); callers slice to n
    alpha = alpha_l.reshape(T, LANES).transpose(1, 0).reshape(LANES * T)
    ll = jnp.sum(ll_l)
    logdet = jnp.sum(ls_l)
    if return_moments or return_full:
        m = m_l.reshape(T, d, LANES).transpose(2, 0, 1).reshape(LANES * T, d)
        P = (
            P_l.reshape(T, d * d, LANES)
            .transpose(2, 0, 1)
            .reshape(LANES * T, d, d)
        )
        if not return_full:
            return (ll, alpha, logdet, m, P), carry_out
    if not (return_gains or return_full):
        return (ll, alpha, logdet), carry_out
    S = jnp.exp(logs_l.reshape(T, LANES).transpose(1, 0).reshape(LANES * T))
    K = K_l.reshape(T, d, LANES).transpose(2, 0, 1).reshape(LANES * T, d)
    if return_full:
        return (ll, alpha, logdet, S, K, m, P), carry_out
    return (ll, alpha, logdet, S, K), carry_out


@functools.partial(jax.jit, static_argnames=("chunk_size", "interpret"))
def pallas_decorrelate_chunked(
    lgssm: LGSSM, y, chunk_size: int = 32768, interpret: bool = False
):
    """Whitening pass (ll, alpha, logdet) with a BOUNDED per-launch size.

    Splits the series into ``chunk_size``-step segments and runs the
    blocked-scan kernel per segment under ``lax.scan``, threading the
    combined filtering element across segment boundaries — exactly the same
    affine-element composition phase 2 uses across in-segment blocks, so
    the result is bitwise-equivalent math at any chunking.  Use when a
    single huge launch is undesirable (streaming from host, or runtimes
    that bound per-execution size — see BENCHMARKS.md caveats).
    """
    d = lgssm.dim
    if not pallas_supported(lgssm):
        return _decorrelate_fallback(lgssm, y, False, False, False)
    if chunk_size % LANES != 0:
        raise ValueError(f"chunk_size must be a multiple of {LANES}")
    n = lgssm.num_steps
    if n <= chunk_size:
        return pallas_decorrelate(lgssm, y, interpret=interpret)
    f32 = jnp.float32
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n

    A = jnp.concatenate([lgssm.A.astype(f32), jnp.zeros((pad, d, d), f32)])
    Q = jnp.concatenate(
        [lgssm.Q.astype(f32), jnp.tile(jnp.eye(d, dtype=f32)[None], (pad, 1, 1))]
    )
    R = jnp.concatenate(
        [jnp.broadcast_to(lgssm.R.astype(f32), (n,)), jnp.ones((pad,), f32)]
    )
    Y = jnp.concatenate([jnp.asarray(y, f32), jnp.zeros((pad,), f32)])
    Mask = jnp.concatenate([jnp.ones((n,), f32), jnp.zeros((pad,), f32)])

    cs = chunk_size
    T = cs // LANES
    chunks = (
        A.reshape(n_chunks, cs, d, d),
        Q.reshape(n_chunks, cs, d, d),
        R.reshape(n_chunks, cs),
        Y.reshape(n_chunks, cs),
        Mask.reshape(n_chunks, cs),
    )

    def body(carry, ch):
        Ak, Qk, Rk, Yk, Mk = ch
        (ll, alpha, logdet), carry_out = _decorrelate_core(
            d, T, Ak, Qk, Rk, Yk, Mk, carry, interpret, False, False, False
        )
        return carry_out, (ll, alpha, logdet)

    _, (lls, alphas, logdets) = jax.lax.scan(body, _elem_identity(d), chunks)
    return jnp.sum(lls), alphas.reshape(n_chunks * cs)[:n], jnp.sum(logdets)
