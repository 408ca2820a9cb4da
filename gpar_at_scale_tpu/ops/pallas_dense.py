"""Pallas TPU kernels for small dense Cholesky / triangular solves.

Why these exist: the DTC dense-whitening path (``gp/dtc.py::_whiten_all``,
replacing the reference's per-column Kalman loop ``src/gp/dtc.jl:110-117``
at small N) is *latency*-bound, not FLOP-bound.  XLA lowers ``cholesky`` /
``triangular_solve`` on TPU to blocked While-loop algorithms that cost
~30 us each at N=156 — ~100x above the chip's arithmetic capability for
these shapes.

STATUS (measured on v5e, r2): these kernels win isolated, strictly
serialized microbenchmarks — fused chol+solve+logdet 45 us vs XLA's 52 us,
triangular solve 10 us vs 23 us — but LOSE end-to-end on the EEG DTC
pipeline (18.9 ms vs 16.4 ms) and on vmapped batched serving (0.69M vs
1.09M obs/s): XLA overlaps its While-loop linalg latency with independent
ops in the step's dataflow and amortizes batched cholesky across vmapped
requests, both of which a single fused kernel launch serializes.  The
backend is therefore OPT-IN (``GPAR_PALLAS_DENSE=1``; see
``utils/psd._pallas_dense_ok``) — appropriate for strictly latency-critical
un-batched call chains — and the numbers above are kept honest in the
module so the trade-off is re-evaluated, not re-discovered.

These kernels run the entire factorization in VMEM as ONE fused program:

* ``chol_solve(S, B)`` -> ``(U, W, logdet)`` — right-looking blocked
  Cholesky ``S = U^T U`` (U upper) with the forward substitution
  ``W = U^-T B = L^-1 B`` fused into the same panel sweep, plus
  ``logdet S`` from the diagonal.  The three outputs the DTC bound's
  whitening needs, in one kernel launch.
* ``tri_ut(U, B)`` — ``U^-T B`` (= ``solve_lower(L, B)`` with ``L = U^T``).
* ``tri_u(U, B)`` — ``U^-1 B``  (= ``solve_upper(L, B)``).

All three carry custom VJPs built from the same kernels (standard
Cholesky/triangular-solve adjoint algebra), so the DTC objective trains
end-to-end through them.  Design notes:

* Panels are BS=8 rows (one f32 sublane tile).  Within a panel, columns are
  unrolled Python-side: every mask is a compile-time constant and each
  column step is ~5 VPU ops on a (8, Np) panel.
* Cross-panel updates are rank-8 ``dot_general`` calls on the MXU
  (right-looking), never full Gram recomputation.
* No lane-dimension dynamic slicing: rows live on sublanes; per-column
  pivots/coefficients are extracted with constant one-hot lane masks and
  reductions.
* Shapes are padded to multiples of 8 with an identity block so the
  factorization stays well-defined; pad rows/columns contribute log(1)=0
  to the logdet and zeros to the solves.

Float32 only (the TPU production dtype); callers keep f64 oracles on the
XLA path.  Sizes up to ``PALLAS_DENSE_N_MAX`` (VMEM: a 512x512 f32 matrix
is 1 MB; the kernel holds ~4 such buffers).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 8  # panel height: one f32 sublane tile
PALLAS_DENSE_N_MAX = 512


def _resolve_interpret(interpret):
    """interpret=None -> honor the configured dispatch mode
    (``engine.pallas_dense = "interpret"`` or the
    GPAR_PALLAS_DENSE_INTERPRET env hook: lets CPU tests drive the full
    pallas-dispatched dense path)."""
    if interpret is None:
        from gpar_at_scale_tpu.utils.psd import pallas_dense_mode

        return pallas_dense_mode() == "interpret"
    return interpret


def _pad8(n: int) -> int:
    return -(-n // BS) * BS


def _dotT(a, b):
    """dot_general contracting the leading axes: a^T @ b on the MXU."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _panel_cholesky(P, r0, lane):
    """Factor an (BS, Np) panel starting at global row r0.

    Returns the BS rows of U.  P must already contain the residual
    A[r0:r0+BS, :] (all earlier panels' contributions subtracted).
    """
    rows = []
    for jj in range(BS):
        j = r0 + jj
        rowv = P[jj : jj + 1, :]  # (1, Np)
        colmask = (lane == j).astype(jnp.float32)  # constant one-hot
        pivot = jnp.sum(rowv * colmask)
        inv = jax.lax.rsqrt(jnp.maximum(pivot, 1e-30))
        gemask = (lane >= j).astype(jnp.float32)
        urow = rowv * (inv * gemask)
        rows.append(urow)
        if jj + 1 < BS:
            # rank-1 update of the remaining panel rows:
            # A[i, :] -= L[i, j] * urow,  L[i, j] = A_resid[i, j] / U[j, j].
            coef = jnp.sum(P * colmask, axis=1, keepdims=True) * inv  # (BS, 1)
            submask = (
                jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0) > jj
            ).astype(jnp.float32)
            P = P - (coef * submask) * urow
    return jnp.concatenate(rows, axis=0)  # (BS, Np)


def _chol_tile(D):
    """Unrolled Cholesky of ONE (BS, BS) tile.  Returns L lower-triangular.

    Every op touches a single 8x128-lane tile, so the whole column loop is
    ~50 VPU instructions — the wide-panel work happens afterwards as one
    block-inverse matmul (see ``_chol_solve_kernel``).
    """
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0)
    eye = jnp.eye(BS, dtype=jnp.float32)
    L = jnp.zeros((BS, BS), jnp.float32)
    A = D
    for j in range(BS):
        colmask = (lane8 == j).astype(jnp.float32)
        rowmask = (sub8 == j).astype(jnp.float32)
        pivot = jnp.sum(A * colmask * rowmask)
        inv = jax.lax.rsqrt(jnp.maximum(pivot, 1e-30))
        col = jnp.sum(A * colmask, axis=1, keepdims=True) * inv  # (BS, 1)
        col = col * (sub8 >= j).astype(jnp.float32)  # = L[:, j]
        L = L + col * colmask
        col_row = jnp.sum(eye * col, axis=0, keepdims=True)  # col^T, (1, BS)
        A = A - col * col_row  # rank-1 trailing update
    return L


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _tri_inv_blk(T):
    """Exact inverse of a (BS, BS) triangular block via the nilpotent
    log-depth product: T = D (I + N) with N = D^-1 T - I strictly
    triangular (N^BS = 0), so

        T^-1 = (I + M)(I + M^2)(I + M^4) D^-1,   M = -N

    — log2(BS) = 3 squarings + 3 products of one-tile matrices instead of
    BS sequential substitution steps, each a latency-bound tiny MXU op.
    """
    eye = jnp.eye(BS, dtype=jnp.float32)
    d = jnp.sum(T * eye, axis=1, keepdims=True)  # (BS, 1)
    dinv = 1.0 / d
    M = eye - T * dinv  # -N = I - D^-1 T  (rows scaled)
    P = eye + M
    M2 = _mm(M, M)
    P = _mm(P, eye + M2)
    P = _mm(P, eye + _mm(M2, M2))
    # right-multiply by D^-1: scale column b by dinv[b].
    dinv_row = jnp.sum(eye * dinv, axis=0, keepdims=True)  # (1, BS)
    return P * dinv_row


def _chol_solve_kernel(S_ref, B_ref, U_ref, W_ref, ld_ref, A_ref, R_ref, *, np_, n):
    """Fused right-looking blocked Cholesky + forward substitution + logdet.

    Per panel of BS rows: (1) factor the (BS, BS) diagonal tile, (2) emit
    the panel's rows of U as ONE matmul ``L_blk^-1 P`` (for the trailing
    columns this is the textbook panel solve; for the diagonal-block columns
    ``L^-1 D = L^T`` gives the factor rows themselves), (3) rank-BS MXU
    update of the trailing matrix, (4) the same block inverse solves this
    panel's rows of ``W = L^-1 B``.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
    eye = jnp.eye(BS, dtype=jnp.float32)
    A_ref[:] = S_ref[:]
    R_ref[:] = B_ref[:]
    U_ref[:] = jnp.zeros_like(U_ref)
    W_ref[:] = jnp.zeros_like(W_ref)
    logdiag = None
    for k in range(np_ // BS):
        r0 = k * BS
        P = A_ref[r0 : r0 + BS, :]
        Upanel = _panel_cholesky(P, r0, lane)
        U_ref[r0 : r0 + BS, :] = Upanel
        # Trailing update: A -= (L cols of panel)(L cols)^T = Upanel^T Upanel.
        A_ref[:] = A_ref[:] - _dotT(Upanel, Upanel)
        # Fused forward substitution for this panel's rows of W: the panel
        # coupling block is L_blk = Ublk^T, so L_blk^-1 Prhs = (Ublk^-1)^T
        # Prhs with the transpose folded into the dot_general contraction.
        Ublk = Upanel[:, r0 : r0 + BS]  # (BS, BS) static lane slice
        X = _dotT(_tri_inv_blk(Ublk), R_ref[r0 : r0 + BS, :])
        W_ref[r0 : r0 + BS, :] = X
        # Push this panel's contribution to all later rows of the rhs:
        # rhs[i, :] -= sum_j L[i, j] X[j, :] = (Upanel^T X)[i, :].
        R_ref[:] = R_ref[:] - _dotT(Upanel, X)
        # log-diagonal accumulation (pad rows have U[j, j] = 1 -> log 0).
        dpart = jnp.sum(
            Upanel
            * (lane == (r0 + jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0))).astype(
                jnp.float32
            ),
            axis=1,
            keepdims=True,
        )  # (BS, 1)
        lg = jnp.log(jnp.maximum(dpart, 1e-30))
        logdiag = lg if logdiag is None else logdiag + lg
    ld_ref[0, 0] = 2.0 * jnp.sum(logdiag)


def _tri_ut_kernel(U_ref, B_ref, X_ref, R_ref, *, np_):
    """X = U^-T B (forward substitution; U upper).

    Panel solve: L_blk = Ublk^T, so L_blk^-1 Prhs = (Ublk^-1)^T Prhs — the
    transpose folds into the dot_general contraction, no relayout.
    """
    R_ref[:] = B_ref[:]
    X_ref[:] = jnp.zeros_like(X_ref)
    for k in range(np_ // BS):
        r0 = k * BS
        Upanel = U_ref[r0 : r0 + BS, :]
        Prhs = R_ref[r0 : r0 + BS, :]
        Ublk = Upanel[:, r0 : r0 + BS]
        X = _dotT(_tri_inv_blk(Ublk), Prhs)
        X_ref[r0 : r0 + BS, :] = X
        R_ref[:] = R_ref[:] - _dotT(Upanel, X)


def _tri_u_kernel(U_ref, B_ref, X_ref, R_ref, Ut_ref, *, np_):
    """X = U^-1 B (backward substitution; U upper).

    Panel solve: U_blk = Utblk^T, so U_blk^-1 Prhs = (Utblk^-1)^T Prhs.
    """
    R_ref[:] = B_ref[:]
    X_ref[:] = jnp.zeros_like(X_ref)
    # One upfront transpose so panel coupling blocks are sublane slices.
    Ut_ref[:] = _dotT(U_ref[:], jnp.eye(np_, dtype=jnp.float32))
    for k in range(np_ // BS - 1, -1, -1):
        r0 = k * BS
        Utp = Ut_ref[r0 : r0 + BS, :]  # rows r0.. of U^T = cols r0.. of U
        Prhs = R_ref[r0 : r0 + BS, :]
        Utblk = Utp[:, r0 : r0 + BS]
        X = _dotT(_tri_inv_blk(Utblk), Prhs)
        X_ref[r0 : r0 + BS, :] = X
        # rhs[i, :] -= sum_j U[i, r0+j] X[j, :] = (Utp^T X)[i, :].
        R_ref[:] = R_ref[:] - _dotT(Utp, X)


def _pad_spd(S, np_):
    """Pad an SPD matrix to (np_, np_) with an identity block."""
    n = S.shape[0]
    if n == np_:
        return S
    out = jnp.zeros((np_, np_), S.dtype)
    out = out.at[:n, :n].set(S)
    idx = jnp.arange(n, np_)
    return out.at[idx, idx].set(1.0)


def _pad_rows(B, np_):
    n = B.shape[0]
    if n == np_:
        return B
    return jnp.zeros((np_,) + B.shape[1:], B.dtype).at[:n].set(B)


# ---------------------------------------------------------------------------
# chol_solve: (U, W, logdet) = (chol_upper(S), L^-1 B, logdet S)
# ---------------------------------------------------------------------------


def chol_solve(S, B, interpret=None):
    """Fused upper Cholesky ``S = U^T U``, whitening ``W = U^-T B = L^-1 B``,
    and ``logdet S`` — one Pallas kernel launch, f32.

    S: (N, N) SPD (caller adds jitter/ridge), B: (N, K).  N <= 512.
    Returns (U, W, logdet).  Differentiable via a custom VJP built from the
    same kernels.
    """
    return _chol_solve_p(_resolve_interpret(interpret), S, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _chol_solve_p(interpret, S, B):
    return _chol_solve_fwd_impl(S, B, interpret)


def _chol_solve_fwd_impl(S, B, interpret):
    n, k = S.shape[0], B.shape[1]
    np_ = _pad8(n)
    Sp = _pad_spd(S.astype(jnp.float32), np_)
    Bp = _pad_rows(B.astype(jnp.float32), np_)
    kern = functools.partial(_chol_solve_kernel, np_=np_, n=n)
    U, W, ld = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((np_, np_), jnp.float32),
            jax.ShapeDtypeStruct((np_, k), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((np_, np_), jnp.float32),
            pltpu.VMEM((np_, k), jnp.float32),
        ],
        interpret=interpret,
    )(Sp, Bp)
    return U[:n, :n], W[:n], ld[0, 0]


def _chol_solve_fwd(interpret, S, B):
    U, W, ld = _chol_solve_fwd_impl(S, B, interpret)
    return (U, W, ld), (U, W)


def _chol_solve_bwd(interpret, res, cots):
    U, W = res
    U_bar, W_bar, ld_bar = cots
    n = U.shape[0]
    # From W = U^-T B:  B_bar = U^-1 W_bar;  dU gets -triu(W B_bar^T)
    # (adjoint of the transpose-solve: L_bar = -tril(B_bar W^T), U = L^T).
    B_bar = tri_u(U, W_bar, interpret)
    Ub = U_bar - jnp.triu(W @ B_bar.T)
    # From logdet = 2 sum log diag(U).
    Ub = Ub + (2.0 * ld_bar) * jnp.diag(1.0 / jnp.diagonal(U))
    # Cholesky adjoint in U-form (L = U^T, L_bar = Ub^T):
    #   M = L^T L_bar = U Ub^T;  Phi = tril(M) - 0.5 diag(M)
    #   S_bar = L^-T Phi L^-1 = U^-1 Phi U^-T, then symmetrize.
    M = U @ Ub.T
    Phi = jnp.tril(M) - 0.5 * jnp.diag(jnp.diagonal(M))
    X1 = tri_u(U, Phi, interpret)  # U^-1 Phi
    S_bar = tri_u(U, X1.T, interpret).T  # (U^-1 X1^T)^T = X1 U^-T
    S_bar = 0.5 * (S_bar + S_bar.T)
    return S_bar, B_bar


_chol_solve_p.defvjp(_chol_solve_fwd, _chol_solve_bwd)


# ---------------------------------------------------------------------------
# Triangular solves
# ---------------------------------------------------------------------------


def tri_ut(U, B, interpret=None):
    """X = U^-T B = L^-1 B (forward substitution, U upper, f32)."""
    return _tri_ut_p(_resolve_interpret(interpret), U, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tri_ut_p(interpret, U, B):
    return _tri_ut_impl(U, B, interpret)


def _tri_ut_impl(U, B, interpret):
    n, k = U.shape[0], B.shape[1]
    np_ = _pad8(n)
    Up = _pad_spd(U.astype(jnp.float32), np_)
    Bp = _pad_rows(B.astype(jnp.float32), np_)
    kern = functools.partial(_tri_ut_kernel, np_=np_)
    X = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((np_, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((np_, k), jnp.float32)],
        interpret=interpret,
    )(Up, Bp)
    return X[:n]


def _tri_ut_fwd(interpret, U, B):
    X = _tri_ut_impl(U, B, interpret)
    return X, (U, X)


def _tri_ut_bwd(interpret, res, X_bar):
    U, X = res
    B_bar = tri_u(U, X_bar, interpret)
    U_bar = -jnp.triu(X @ B_bar.T)
    return U_bar, B_bar


_tri_ut_p.defvjp(_tri_ut_fwd, _tri_ut_bwd)


def tri_u(U, B, interpret=None):
    """X = U^-1 B = L^-T B (backward substitution, U upper, f32)."""
    return _tri_u_p(_resolve_interpret(interpret), U, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tri_u_p(interpret, U, B):
    return _tri_u_impl(U, B, interpret)


def _tri_u_impl(U, B, interpret):
    n, k = U.shape[0], B.shape[1]
    np_ = _pad8(n)
    Up = _pad_spd(U.astype(jnp.float32), np_)
    Bp = _pad_rows(B.astype(jnp.float32), np_)
    kern = functools.partial(_tri_u_kernel, np_=np_)
    X = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((np_, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((np_, k), jnp.float32),
            pltpu.VMEM((np_, np_), jnp.float32),
        ],
        interpret=interpret,
    )(Up, Bp)
    return X[:n]


def _tri_u_fwd(interpret, U, B):
    X = _tri_u_impl(U, B, interpret)
    return X, (U, X)


def _tri_u_bwd(interpret, res, X_bar):
    U, X = res
    B_bar = tri_ut(U, X_bar, interpret)
    U_bar = -jnp.triu(B_bar @ X.T)
    return U_bar, B_bar


_tri_u_p.defvjp(_tri_u_fwd, _tri_u_bwd)
