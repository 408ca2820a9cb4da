"""Pallas TPU kernel: many-column Kalman whitening (the DTC hot path).

``decorrelate`` with B right-hand sides shares one covariance/gain recursion
(y-independent) across all columns; only the affine mean recursion

    m_k = M_k m_{k-1} + K_k y_k,      M_k = (I - K_k H) A_k
    v_k = y_k - A_k[0, :] . m_{k-1},  alpha_k = v_k / sqrt(S_k)

depends on y, and it is identical per column.  This kernel puts the COLUMNS
in the vector lanes: a (8, 128) tile advances 1024 columns per instruction,
time runs sequentially in VMEM-resident chunks (one DMA per chunk, not per
step).  The per-step gains (S, K, M, A-row, mask) are precomputed once by
the lane-parallel blocked-scan filter (``pallas_kalman.pallas_decorrelate``
with ``return_gains=True``) — so the whole batched whitening makes ~3
streaming passes over the N-sized gain stream plus one pass over (N, B).

This replaces the reference's M sequential O(N) filter passes
(``src/gp/dtc.jl:110-117``, defect K6) with hardware-speed column batching.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpar_at_scale_tpu.ops.pallas_kalman import pallas_decorrelate
from gpar_at_scale_tpu.ssm.markov import LGSSM

_LOG_2PI = 1.8378770664093453
SUB, LANE = 8, 128
COLS = SUB * LANE  # columns per tile
CHUNK = 256  # time steps per grid iteration (compiled path)


def _whiten_kernel(d, CHUNK, unroll, gains_ref, y_ref, alpha_ref, ll_ref, m_scratch, ll_scratch):
    """Grid (col_tiles, n_chunks); chunks innermost so the per-column state
    in scratch carries across chunks of the same column tile."""
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _init():
        for i in range(d):
            m_scratch[i] = jnp.zeros((SUB, LANE), jnp.float32)
        ll_scratch[...] = jnp.zeros((SUB, LANE), jnp.float32)

    def step(t, carry):
        # gains layout: [S, logS, mask, K(0..d-1), A0(0..d-1), M(d*d)]
        m = list(carry[:d])
        ll = carry[d]
        S = gains_ref[0, t, 0]
        logS = gains_ref[0, t, 1]
        mask = gains_ref[0, t, 2]
        y = y_ref[0, 0, t]  # (8, 128) columns tile

        v = y - sum(gains_ref[0, t, 3 + d + j] * m[j] for j in range(d))  # y - A0 . m
        alpha = v * jax.lax.rsqrt(S) * mask
        m_new = [
            sum(gains_ref[0, t, 3 + 2 * d + i * d + j] * m[j] for j in range(d))
            + gains_ref[0, t, 3 + i] * y
            for i in range(d)
        ]
        m = [jnp.where(mask > 0.5, m_new[i], m[i]) for i in range(d)]
        ll = ll - 0.5 * mask * (_LOG_2PI + logS + alpha * alpha)
        alpha_ref[0, 0, t] = alpha
        return tuple(m) + (ll,)

    carry = tuple(m_scratch[i] for i in range(d)) + (ll_scratch[...],)
    if unroll:
        # Statically unrolled for the compiled path: static indices keep
        # Mosaic from inserting per-step relayouts.
        for t in range(CHUNK):
            carry = step(t, carry)
    else:
        # Interpret mode walks a fori_loop (the unrolled body would execute
        # tens of thousands of eager ops per grid step).
        carry = jax.lax.fori_loop(0, CHUNK, step, carry)
    for i in range(d):
        m_scratch[i] = carry[i]
    ll_scratch[...] = carry[d]

    @pl.when(c == n_chunks - 1)
    def _emit():
        ll_ref[0] = ll_scratch[...]


@functools.partial(jax.jit, static_argnames=("interpret", "return_aux"))
def pallas_whiten_columns(lgssm: LGSSM, Y, interpret: bool = False, return_aux: bool = False):
    """Batched whitening: Y (N, B) -> (ll (B,), alpha (N, B), logdet).

    f32; d <= 3.  Gains come from the blocked-scan filter (2 passes), the
    column sweep is one more pass with columns in the vector lanes.

    return_aux=True additionally returns (S (N,), K (N, d), P (N, d, d)) —
    the per-step innovation variances, gains, and filtered covariances the
    batched disturbance-smoother VJP consumes (``ops/pallas_grad.py``).
    """
    d = lgssm.dim
    n = lgssm.num_steps
    Y = jnp.asarray(Y, jnp.float32)
    if Y.ndim == 1:
        Y = Y[:, None]
    B = Y.shape[1]
    f32 = jnp.float32
    CHUNK = globals()["CHUNK"]

    # --- per-step gains from the lane-parallel filter (y = 0) -------------
    _, _, logdet, S, K, _, P_filt = pallas_decorrelate(
        lgssm, jnp.zeros((n,), f32), return_full=True, interpret=interpret
    )
    A = lgssm.A.astype(f32)
    M = A - K[:, :, None] * A[:, None, 0, :]  # (I - K H) A
    A0 = A[:, 0, :]
    logS = jnp.log(S)

    # --- pad time to chunks, columns to tiles ----------------------------
    n_chunks = -(-n // CHUNK)
    pad_t = n_chunks * CHUNK - n
    col_tiles = -(-B // COLS)
    pad_b = col_tiles * COLS - B

    G = 3 + 2 * d + d * d
    gains = jnp.concatenate(
        [
            S[:, None],
            logS[:, None],
            jnp.ones((n, 1), f32),
            K,
            A0,
            M.reshape(n, d * d),
        ],
        axis=1,
    )
    gains = jnp.concatenate([gains, jnp.zeros((pad_t, G), f32).at[:, 0].set(1.0)], axis=0)
    gains = gains.reshape(n_chunks, CHUNK, G)

    Yp = jnp.pad(Y, ((0, pad_t), (0, pad_b)))
    # (N', B') -> (col_tiles, n_chunks, CHUNK, SUB, LANE)
    Yl = (
        Yp.reshape(n_chunks * CHUNK, col_tiles, SUB, LANE)
        .transpose(1, 0, 2, 3)
        .reshape(col_tiles, n_chunks, CHUNK, SUB, LANE)
    )

    # Gains live in SMEM: the kernel reads them as scalars every step, and
    # scalar loads from VMEM cost tens of cycles each (measured ~100x
    # slowdown); SMEM is the scalar memory.
    gain_spec = pl.BlockSpec((1, CHUNK, G), lambda b, c: (c, 0, 0), memory_space=pltpu.SMEM)
    y_spec = pl.BlockSpec(
        (1, 1, CHUNK, SUB, LANE), lambda b, c: (b, c, 0, 0, 0), memory_space=pltpu.VMEM
    )
    ll_spec = pl.BlockSpec((1, SUB, LANE), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_whiten_kernel, d, CHUNK, not interpret)
    alpha_l, ll_l = pl.pallas_call(
        kernel,
        grid=(col_tiles, n_chunks),
        in_specs=[gain_spec, y_spec],
        out_specs=(y_spec, ll_spec),
        out_shape=(
            jax.ShapeDtypeStruct((col_tiles, n_chunks, CHUNK, SUB, LANE), f32),
            jax.ShapeDtypeStruct((col_tiles, SUB, LANE), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, SUB, LANE), f32),
            pltpu.VMEM((SUB, LANE), f32),
        ],
        interpret=interpret,
    )(gains, Yl)

    alpha = (
        alpha_l.reshape(col_tiles, n_chunks * CHUNK, SUB * LANE)
        .transpose(1, 0, 2)
        .reshape(n_chunks * CHUNK, col_tiles * COLS)[:n, :B]
    )
    ll = ll_l.reshape(col_tiles * COLS)[:B]
    if return_aux:
        return ll, alpha, logdet, S, K, P_filt
    return ll, alpha, logdet
