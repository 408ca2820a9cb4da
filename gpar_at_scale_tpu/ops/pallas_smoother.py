"""Pallas TPU kernel: lane-parallel blocked-scan RTS smoother.

Backward companion of ``pallas_kalman.pallas_decorrelate`` — the same
two-level-scan structure run in reverse over per-step *smoothing elements*

    e_k = (E_k, g_k, L_k),   E_k = P_k A_{k+1}^T Pp_{k+1}^-1,
    g_k = m_k - E_k mp_{k+1},  L_k = P_k - E_k Pp_{k+1} E_k^T
    (terminal step: (0, m_N, P_N);  padded step: identity (I, 0, 0))

with the associative combine (earlier o later) = (E_e E_l, g_e + E_e g_l,
L_e + E_e L_l E_e^T), so the smoothed moments at step k are the combined
suffix element's (g, L).

  phase F   -- forward blocked-scan filter emitting filtered moments (m, P)
  phase R1  -- per-block suffix reduction of smoothing elements (reversed
               grid, 1024 blocks in the VPU lanes)
  phase R2  -- reverse exclusive combine over the 1024 block elements (XLA)
  phase R3  -- per-block backward replay emitting the smoothed state
               moments per step

Phases R1-R3 are generic over any affine+congruence element algebra and are
exposed as ``pallas_suffix_scan`` — also the backward engine of the
disturbance-smoother gradient (``ops/pallas_grad.py``).

Single observation column, f32, d <= 3.  ``pallas_smooth`` returns the
``rts_smooth`` (mean, var, ll) contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpar_at_scale_tpu.ops.pallas_kalman import (
    LANE,
    LANES,
    SUB,
    _flatten_mat,
    _to_lanes,
    pallas_decorrelate,
)
from gpar_at_scale_tpu.ssm.markov import LGSSM


def _batched_inv(Z, d):
    """Adjugate inverse of a batch of small SPD matrices, elementwise."""
    if d == 1:
        return 1.0 / Z
    if d == 2:
        det = Z[:, 0, 0] * Z[:, 1, 1] - Z[:, 0, 1] * Z[:, 1, 0]
        inv = jnp.stack(
            [
                jnp.stack([Z[:, 1, 1], -Z[:, 0, 1]], axis=-1),
                jnp.stack([-Z[:, 1, 0], Z[:, 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        return inv / det[:, None, None]
    c00 = Z[:, 1, 1] * Z[:, 2, 2] - Z[:, 1, 2] * Z[:, 2, 1]
    c01 = Z[:, 1, 2] * Z[:, 2, 0] - Z[:, 1, 0] * Z[:, 2, 2]
    c02 = Z[:, 1, 0] * Z[:, 2, 1] - Z[:, 1, 1] * Z[:, 2, 0]
    det = Z[:, 0, 0] * c00 + Z[:, 0, 1] * c01 + Z[:, 0, 2] * c02
    c10 = Z[:, 0, 2] * Z[:, 2, 1] - Z[:, 0, 1] * Z[:, 2, 2]
    c11 = Z[:, 0, 0] * Z[:, 2, 2] - Z[:, 0, 2] * Z[:, 2, 0]
    c12 = Z[:, 0, 1] * Z[:, 2, 0] - Z[:, 0, 0] * Z[:, 2, 1]
    c20 = Z[:, 0, 1] * Z[:, 1, 2] - Z[:, 0, 2] * Z[:, 1, 1]
    c21 = Z[:, 0, 2] * Z[:, 1, 0] - Z[:, 0, 0] * Z[:, 1, 2]
    c22 = Z[:, 0, 0] * Z[:, 1, 1] - Z[:, 0, 1] * Z[:, 1, 0]
    rows = [
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2) / det[:, None, None]


def _bmm(X, Y):  # (N,d,d) @ (N,d,d), unrolled elementwise
    d = X.shape[-1]
    return jnp.stack(
        [
            jnp.stack(
                [sum(X[:, i, k] * Y[:, k, j] for k in range(d)) for j in range(d)], axis=-1
            )
            for i in range(d)
        ],
        axis=-2,
    )


def _bmmT(X, Y):  # (N,d,d) @ (N,d,d)^T
    d = X.shape[-1]
    return jnp.stack(
        [
            jnp.stack(
                [sum(X[:, i, k] * Y[:, j, k] for k in range(d)) for j in range(d)], axis=-1
            )
            for i in range(d)
        ],
        axis=-2,
    )


def _bmv(X, v):  # (N,d,d) @ (N,d)
    d = X.shape[-1]
    return jnp.stack(
        [sum(X[:, i, k] * v[:, k] for k in range(d)) for i in range(d)], axis=-1
    )


def _unlane(x_l, T):
    """(T, SUB, LANE) -> (LANES*T,) linear series order (block-major)."""
    return x_l.reshape(T, LANES).transpose(1, 0).reshape(LANES * T)


def _unlane_vec(x_l, T, d):
    """(T, d, SUB, LANE) -> (LANES*T, d)."""
    return x_l.reshape(T, d, LANES).transpose(2, 0, 1).reshape(LANES * T, d)


def _rev_spec(T, comps):
    """BlockSpec streaming step (T-1-t) at grid step t."""
    return pl.BlockSpec(
        (1, comps, SUB, LANE), lambda t: (T - 1 - t, 0, 0, 0), memory_space=pltpu.VMEM
    )


def _read(ref, d):
    return {(i, j): ref[0, i * d + j] for i in range(d) for j in range(d)}


def _r1_kernel(d, E_ref, g_ref, L_ref, oE, og, oL, sE, sg, sL):
    """Reversed grid: combine block-local suffix (in scratch) with the new
    earlier element: new = e_t o suffix."""
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _init():
        for i in range(d):
            sg[i] = jnp.zeros((SUB, LANE), jnp.float32)
            for j in range(d):
                sE[i * d + j] = (
                    jnp.ones((SUB, LANE), jnp.float32) if i == j else jnp.zeros((SUB, LANE), jnp.float32)
                )
                sL[i * d + j] = jnp.zeros((SUB, LANE), jnp.float32)

    E_e = _read(E_ref, d)
    g_e = {i: g_ref[0, i] for i in range(d)}
    L_e = _read(L_ref, d)
    E_s = {(i, j): sE[i * d + j] for i in range(d) for j in range(d)}
    g_s = {i: sg[i] for i in range(d)}
    L_s = {(i, j): sL[i * d + j] for i in range(d) for j in range(d)}

    # new = e o suffix
    E_n = {
        (i, j): sum(E_e[(i, k)] * E_s[(k, j)] for k in range(d)) for i in range(d) for j in range(d)
    }
    g_n = {i: g_e[i] + sum(E_e[(i, k)] * g_s[k] for k in range(d)) for i in range(d)}
    EL = {
        (i, j): sum(E_e[(i, k)] * L_s[(k, j)] for k in range(d)) for i in range(d) for j in range(d)
    }
    L_n = {
        (i, j): L_e[(i, j)] + sum(EL[(i, k)] * E_e[(j, k)] for k in range(d))
        for i in range(d)
        for j in range(d)
    }

    for i in range(d):
        sg[i] = g_n[i]
        for j in range(d):
            sE[i * d + j] = E_n[(i, j)]
            sL[i * d + j] = L_n[(i, j)]

    @pl.when(t == T - 1)
    def _emit():
        for i in range(d):
            og[i] = sg[i]
            for j in range(d):
                oE[i * d + j] = sE[i * d + j]
                oL[i * d + j] = sL[i * d + j]


def _r3_kernel(d, E_ref, g_ref, L_ref, g0_ref, L0_ref, ms_out, Ps_out, s_m, s_P):
    """Reversed grid: carry the running suffix (g, L); emit it per step."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        for i in range(d):
            s_m[i] = g0_ref[0, i]
            for j in range(d):
                s_P[i * d + j] = L0_ref[0, i * d + j]

    E = _read(E_ref, d)
    g = {i: g_ref[0, i] for i in range(d)}
    L = _read(L_ref, d)

    ms = {i: s_m[i] for i in range(d)}
    Ps = {(i, j): s_P[i * d + j] for i in range(d) for j in range(d)}

    ms_n = {i: g[i] + sum(E[(i, k)] * ms[k] for k in range(d)) for i in range(d)}
    EP = {
        (i, j): sum(E[(i, k)] * Ps[(k, j)] for k in range(d)) for i in range(d) for j in range(d)
    }
    Ps_n = {
        (i, j): L[(i, j)] + sum(EP[(i, k)] * E[(j, k)] for k in range(d))
        for i in range(d)
        for j in range(d)
    }

    for i in range(d):
        ms_out[0, i] = ms_n[i]
        s_m[i] = ms_n[i]
        for j in range(d):
            Ps_out[0, i * d + j] = Ps_n[(i, j)]
            s_P[i * d + j] = Ps_n[(i, j)]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_suffix_scan(E, g, L, interpret: bool = False):
    """Per-step inclusive suffix combine of affine+congruence elements.

    Given per-step elements e_k = (E_k (d,d), g_k (d,), L_k (d,d)),
    k = 0..n-1, with the associative combine

        (earlier o later) = (E_e E_l, g_e + E_e g_l, L_e + E_e L_l E_e^T),

    returns for every k the (g, L) components of e_k o e_{k+1} o ... o
    e_{n-1} — i.e. the solution of the backward recursions

        v_k = g_k + E_k v_{k+1},   M_k = L_k + E_k M_{k+1} E_k^T,
        v_n = 0, M_n = 0

    as (v (n, d), M (n, d, d)).  This is the shared backward engine of the
    RTS smoother (elements = smoothing gains, ``pallas_smooth``) and of the
    disturbance-smoother gradient (elements = (L_k^T, H^T e_k/S_k,
    H^T H/S_k) — the De Jong/Koopman r/N recursions, ``ops/pallas_grad.py``).
    f32, d <= 3; two streaming passes (R1 suffix-reduce + R3 replay) plus an
    O(LANES) XLA combine (R2)."""
    n, d = g.shape
    f32 = jnp.float32
    T = -(-n // LANES)
    pad = LANES * T - n

    eye = jnp.eye(d, dtype=f32)[None]
    E = jnp.concatenate([E.astype(f32), jnp.tile(eye, (pad, 1, 1))])
    g = jnp.concatenate([g.astype(f32), jnp.zeros((pad, d), f32)])
    L = jnp.concatenate([L.astype(f32), jnp.zeros((pad, d, d), f32)])

    # ---- lane layouts ----------------------------------------------------
    E_l = _flatten_mat(_to_lanes(E, T))
    g_l = _to_lanes(g, T)  # (T, d, 8, 128)
    L_l = _flatten_mat(_to_lanes(L, T))

    mat_rev = _rev_spec(T, d * d)
    vec_rev = _rev_spec(T, d)
    out_mat = jax.ShapeDtypeStruct((d * d, SUB, LANE), f32)
    out_vec = jax.ShapeDtypeStruct((d, SUB, LANE), f32)

    # ---- phase R1: per-block suffix elements ----------------------------
    r1 = functools.partial(_r1_kernel, d)
    bE, bg, bL = pl.pallas_call(
        r1,
        grid=(T,),
        in_specs=[mat_rev, vec_rev, mat_rev],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(out_mat, out_vec, out_mat),
        scratch_shapes=[
            pltpu.VMEM((d * d, SUB, LANE), f32),
            pltpu.VMEM((d, SUB, LANE), f32),
            pltpu.VMEM((d * d, SUB, LANE), f32),
        ],
        interpret=interpret,
    )(E_l, g_l, L_l)

    # ---- phase R2: reverse exclusive combine over blocks (XLA) ----------
    def unlane_mat(x):
        return x.reshape(d, d, LANES).transpose(2, 0, 1)

    def unlane_v(x):
        return x.reshape(d, LANES).transpose(1, 0)

    Eb, gb, Lb = unlane_mat(bE), unlane_v(bg), unlane_mat(bL)

    def comb(later, earlier):
        E_l_, g_l_, L_l_ = later
        E_e, g_e, L_e = earlier
        with jax.default_matmul_precision("highest"):
            E_n = E_e @ E_l_
            g_n = g_e + jnp.einsum("...ij,...j->...i", E_e, g_l_)
            L_n = L_e + E_e @ L_l_ @ jnp.swapaxes(E_e, -1, -2)
        return E_n, g_n, L_n

    inc = jax.lax.associative_scan(comb, (Eb, gb, Lb), axis=0, reverse=True)
    # exclusive suffix for block b = inclusive suffix of block b+1
    _, g_inc, L_inc = inc
    g0 = jnp.concatenate([g_inc[1:], jnp.zeros((1, d), f32)], axis=0)
    L0 = jnp.concatenate([L_inc[1:], jnp.zeros((1, d, d), f32)], axis=0)

    g0_l = g0.transpose(1, 0).reshape(1, d, SUB, LANE)
    L0_l = L0.transpose(1, 2, 0).reshape(1, d * d, SUB, LANE)

    # ---- phase R3: backward replay --------------------------------------
    const_vec = pl.BlockSpec((1, d, SUB, LANE), lambda t: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    const_mat = pl.BlockSpec(
        (1, d * d, SUB, LANE), lambda t: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    vec_rev_out = pl.BlockSpec(
        (1, d, SUB, LANE), lambda t: (T - 1 - t, 0, 0, 0), memory_space=pltpu.VMEM
    )
    mat_rev_out = pl.BlockSpec(
        (1, d * d, SUB, LANE), lambda t: (T - 1 - t, 0, 0, 0), memory_space=pltpu.VMEM
    )
    r3 = functools.partial(_r3_kernel, d)
    ms_l, Ps_l = pl.pallas_call(
        r3,
        grid=(T,),
        in_specs=[mat_rev, vec_rev, mat_rev, const_vec, const_mat],
        out_specs=(vec_rev_out, mat_rev_out),
        out_shape=(
            jax.ShapeDtypeStruct((T, d, SUB, LANE), f32),
            jax.ShapeDtypeStruct((T, d * d, SUB, LANE), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, SUB, LANE), f32),
            pltpu.VMEM((d * d, SUB, LANE), f32),
        ],
        interpret=interpret,
    )(E_l, g_l, L_l, g0_l, L0_l)

    ms = _unlane_vec(ms_l, T, d)[:n]
    Ps = (
        Ps_l.reshape(T, d * d, LANES).transpose(2, 0, 1).reshape(LANES * T, d, d)[:n]
    )
    return ms, Ps


@functools.partial(jax.jit, static_argnames=("interpret", "return_state"))
def pallas_smooth(lgssm: LGSSM, y, interpret: bool = False, return_state: bool = False):
    """Blocked-scan RTS smoother: (f_mean (N,), f_var (N,), ll scalar).

    With ``return_state=True`` additionally returns the full smoothed state
    moments ms (N, d), Ps (N, d, d) and the smoother gains E (N, d, d)
    (E[k] maps step k+1's smoothed moments back to step k).

    Sum-kernel SDEs (d > 3 or H != e1) dispatch to the associative-scan
    smoother with the same contract."""
    d = lgssm.dim
    n = lgssm.num_steps
    f32 = jnp.float32

    from gpar_at_scale_tpu.ops.pallas_kalman import pallas_supported

    if not pallas_supported(lgssm):
        from gpar_at_scale_tpu.ssm.pkalman import parallel_smooth

        sm = parallel_smooth(lgssm, jnp.asarray(y, f32))
        if not return_state:
            return sm.mean, sm.var, sm.ll[0]
        # Smoother gains are internal to the associative combine; callers
        # using return_state consume (ms, Ps) — return zeros for E.
        return sm.mean, sm.var, sm.ll[0], sm.ms[:, :, 0], sm.Ps, jnp.zeros_like(sm.Ps)

    # ---- phase F: forward filter with moments ---------------------------
    ll, _alpha, _logdet, m, P = pallas_decorrelate(
        lgssm, y, interpret=interpret, return_moments=True
    )  # m (N, d), P (N, d, d)

    A = lgssm.A.astype(f32)
    Q = lgssm.Q.astype(f32)
    m = m.astype(f32)
    P = P.astype(f32)

    # ---- smoothing elements in linear order (XLA, elementwise) ----------
    # All element algebra fully unrolled into (N,)-elementwise ops: batched
    # d x d einsums/matmuls pad each tiny operand onto MXU tiles (and
    # batched linalg.solve takes the LU path) — both pathological on TPU.
    A_next = jnp.concatenate([A[1:], jnp.zeros((1, d, d), f32)])
    Q_next = jnp.concatenate([Q[1:], jnp.eye(d, dtype=f32)[None]])

    mp_next = _bmv(A_next, m)
    Pp_next = _bmmT(_bmm(A_next, P), A_next) + Q_next
    PAt = _bmmT(P, A_next)  # P_k A_{k+1}^T
    E = _bmm(PAt, _batched_inv(Pp_next, d))
    g = m - _bmv(E, mp_next)
    L = P - _bmmT(_bmm(E, Pp_next), E)

    # terminal step: element (0, m_N, P_N)
    is_term = (jnp.arange(n) == n - 1)[:, None, None]
    E = jnp.where(is_term, jnp.zeros_like(E), E)
    L = jnp.where(is_term, P, L)
    g = jnp.where(is_term[:, :, 0], m, g)

    ms, Ps = pallas_suffix_scan(E, g, L, interpret=interpret)
    f_mean = ms[:, 0]
    f_var = jnp.maximum(Ps[:, 0, 0], 0.0)
    if not return_state:
        return f_mean, f_var, ll
    return f_mean, f_var, ll, ms, Ps, E
