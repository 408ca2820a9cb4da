"""Segmented (bounded-plan, streaming) execution of the blocked engine.

Motivation (measured, r4): XLA:TPU's buffer planner allocates ~14.4 GB of
HBM *plan* per 1M steps for ONE blocked filter pass — independent of rep
count and lockstep block count (``results_r4/scale_filter_2m.err``: N=2e6
plans 28.82 G > 15.75 G and is a compile-time OOM) — roughly 60x the live
data.  A single dispatch therefore caps at N ~ 1.1e6 on a 16 GB v5e.

This module streams the series through the chip in fixed-size segments,
each its own dispatch, with EXACT state carry:

* filter: the previous segment's last filtered (m, P) is injected into the
  next segment's phase-2 prefix (``blocked_filter(init=...)``) — the
  innovations decomposition makes per-segment log-likelihoods additive;
* smoother: a reverse segment loop carries the later segment's first
  smoothed state into the suffix scan's terminal element
  (``blocked_smooth(boundary=...)``).

Segmented == fused exactly (same per-step quantities), asserted against the
sequential oracle in ``tests/test_segmented.py``.  Beyond this sandbox, the
same mechanism is how a series larger than HBM streams through a chip:
only per-segment arrays plus carries need residency during compute.

Reference equivalent: the O(N)-sequential ``decorrelate``/``smooth``
consumed at ``src/gp/dtc.jl:106-117`` / ``src/gp/temporal_gp_inference.jl:109``
— here at N bounded only by host/HBM storage of the results, not by the
compiler.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.ssm.blocked import (
    NUM_BLOCKS,
    blocked_filter,
    blocked_smooth,
)
from gpar_at_scale_tpu.ssm.kalman import FilterResult, SmoothResult, _ensure_batch
from gpar_at_scale_tpu.ssm.markov import LGSSM

SEGMENT_SIZE = 500_000  # ~7.2 GB plan per dispatch: half the v5e ceiling


@partial(jax.jit, static_argnums=(2,))
def _dslice(x, i, seg):
    return jax.lax.dynamic_slice_in_dim(x, i, seg, 0)


def _seg_bounds(n, segment_size):
    seg = max(1, min(segment_size, n))
    starts = list(range(0, n, seg))
    return [(s, min(seg, n - s)) for s in starts]


# Module-level jits (cached across calls/reps by shape + init structure).
@partial(jax.jit, static_argnums=(5,))
def _seg_filter_jit(A, Q, R, Y, H, num_blocks, init):
    lg = LGSSM(A=A, Q=Q, H=H, R=R)
    return blocked_filter(lg, Y, num_blocks, init=init)


def segmented_filter(
    lgssm: LGSSM,
    y,
    segment_size: int = SEGMENT_SIZE,
    num_blocks: int = NUM_BLOCKS,
    _return_pieces: bool = False,
):
    """Forward filter in segment dispatches; FilterResult parity with
    ``blocked_filter``/``kalman_filter`` (batched columns supported)."""
    Y, single = _ensure_batch(y)
    n = lgssm.num_steps
    dtype = lgssm.A.dtype
    H = lgssm.H.astype(dtype)
    R = jnp.broadcast_to(jnp.asarray(lgssm.R, dtype), (n,))
    Y = Y.astype(dtype)

    pieces, bounds = [], _seg_bounds(n, segment_size)
    init = None
    for s, ln in bounds:
        res = _seg_filter_jit(
            _dslice(lgssm.A, s, ln),
            _dslice(lgssm.Q, s, ln),
            _dslice(R, s, ln),
            _dslice(Y, s, ln),
            H,
            num_blocks,
            init,
        )
        init = (res.m[-1], res.P[-1])
        pieces.append(res)

    if _return_pieces:
        return pieces, bounds, single

    cat = lambda xs: jnp.concatenate(xs, axis=0)
    return FilterResult(
        m=cat([p.m for p in pieces]),
        P=cat([p.P for p in pieces]),
        mp=cat([p.mp for p in pieces]),
        Pp=cat([p.Pp for p in pieces]),
        S=cat([p.S for p in pieces]),
        v=cat([p.v for p in pieces]),
        ll=sum(p.ll for p in pieces),
    )


def segmented_logpdf(lgssm: LGSSM, y, segment_size: int = SEGMENT_SIZE,
                     num_blocks: int = NUM_BLOCKS):
    pieces, _, single = segmented_filter(
        lgssm, y, segment_size, num_blocks, _return_pieces=True
    )
    ll = sum(p.ll for p in pieces)
    return ll[0] if single else ll


def segmented_decorrelate(lgssm: LGSSM, y, segment_size: int = SEGMENT_SIZE,
                          num_blocks: int = NUM_BLOCKS):
    """Whitening pass (lml, alpha) — per-segment alphas are exact because
    the innovation sequence conditions on the carried state.

    Only (v, S, ll) are consumed, so segments are concatenated piecewise —
    the full (N, d)/(N, d, d) moment arrays are never made resident (at
    N=1e7, d=3 that is ~1 GB of avoided HBM/host memory)."""
    single = jnp.ndim(y) == 1
    pieces, _, _ = segmented_filter(
        lgssm, y, segment_size, num_blocks, _return_pieces=True
    )
    ll = sum(p.ll for p in pieces)
    alpha = jnp.concatenate(
        [p.v / jnp.sqrt(p.S)[:, None] for p in pieces], axis=0
    )
    if single:
        return ll[0], alpha[:, 0]
    return ll, alpha


# ---------------------------------------------------------------------------
# Segmented closed-form gradient (single observation column): the De Jong /
# Koopman r/N adjoint recursions of ``blocked_grad.loglik_bwd`` with EXACT
# boundary carries, so million_grad-style training runs at N far beyond the
# ~1.1e6-step single-dispatch plan ceiling.  Carries: forward (m, P) of the
# previous segment's last step; backward (r, N) of the next segment's first
# step (injected as the suffix scan's terminal element) plus that segment's
# first transition A (the C_k element of a segment's last step crosses the
# boundary).  The same program serves interior and edge segments: zero
# carries are exact identities of the recursions.
# ---------------------------------------------------------------------------


@jax.default_matmul_precision("highest")
def _seg_bwd_core(A, H, e, S, K, m, P, mP_prev, num_blocks, A_b, r_b, N_b):
    """One segment's backward math: (dA, dQ, dR, dy, r0, N0).

    A_b: (d, d) transition of the NEXT segment's first step (zeros if none).
    r_b (d,), N_b (d, d): adjoints of that step (zeros if none).
    mP_prev: (m_prev (d,), P_prev (d, d)) filtered state before this
    segment (zeros for the global first segment)."""
    from gpar_at_scale_tpu.ssm.blocked import blocked_suffix_scan

    n, d = K.shape
    dtype = A.dtype
    I = jnp.eye(d, dtype=dtype)
    m_pr, P_pr = mP_prev

    A_next = jnp.concatenate([A[1:], A_b.reshape(1, d, d)])
    ImKH = I[None] - K[:, :, None] * H[None, None, :]
    C = jnp.swapaxes(A_next @ ImKH, -1, -2)
    b = H[None, :] * (e / S)[:, None]  # (n, d)
    W = (1.0 / S)[:, None, None] * (H[:, None] * H[None, :])[None]

    _, r, N = blocked_suffix_scan(
        C, b[:, :, None], W, num_blocks=num_blocks,
        terminal=(r_b.reshape(d, 1), N_b),
    )
    r = r[:, :, 0]

    outer = lambda a, bb: a[:, :, None] * bb[:, None, :]
    rrN = outer(r, r) - N

    m_prev = jnp.concatenate([m_pr.reshape(1, d), m[:-1]])
    P_prev = jnp.concatenate([P_pr.reshape(1, d, d), P[:-1]])
    dQ = 0.5 * rrN
    dA = rrN @ (A @ P_prev) + outer(r, m_prev)

    r_next = jnp.concatenate([r[1:], r_b.reshape(1, d)])
    N_next = jnp.concatenate([N[1:], N_b.reshape(1, d, d)])
    AK = jnp.einsum("nij,nj->ni", A_next, K)
    u = e / S - jnp.sum(AK * r_next, axis=-1)
    D = 1.0 / S + jnp.einsum("ni,nij,nj->n", AK, N_next, AK)
    dR = 0.5 * (u * u - D)
    dy = -u
    return dA, dQ, dR, dy, r[0], N[0]


@partial(jax.jit, static_argnums=(8,))
def _seg_bwd_jit(A, H, e, S, K, m, P, mP_prev, num_blocks, A_b, r_b, N_b):
    return _seg_bwd_core(A, H, e, S, K, m, P, mP_prev, num_blocks, A_b, r_b, N_b)


def segmented_loglik_grad(
    lgssm: LGSSM, y, segment_size: int = SEGMENT_SIZE, num_blocks: int = NUM_BLOCKS
):
    """(ll, dA, dQ, dR, dy) of log N(y | 0, Sigma) — the closed-form
    disturbance-smoother gradient of ``blocked_grad.loglik_bwd``, streamed
    in segment dispatches (exact; asserted vs one-shot in tests).  Single
    observation column; H structural."""
    y = jnp.asarray(y)
    dtype = lgssm.A.dtype
    H = lgssm.H.astype(dtype)
    d = lgssm.dim

    pieces, bounds, _ = segmented_filter(
        lgssm, y[:, None], segment_size, num_blocks, _return_pieces=True
    )
    ll = sum(p.ll for p in pieces)[0]

    zerod = jnp.zeros((d,), dtype)
    zerodd = jnp.zeros((d, d), dtype)
    outs = [None] * len(bounds)
    A_b, r_b, N_b = zerodd, zerod, zerodd
    for k in range(len(bounds) - 1, -1, -1):
        s, ln = bounds[k]
        p = pieces[k]
        with jax.default_matmul_precision("highest"):
            K = jnp.einsum("nij,j->ni", p.Pp, H) / p.S[:, None]
        if k > 0:
            prev = pieces[k - 1]
            mP_prev = (prev.m[-1, :, 0], prev.P[-1])
        else:
            mP_prev = (zerod, zerodd)
        A_seg = _dslice(lgssm.A, s, ln)
        dA, dQ, dR, dy, r0, N0 = _seg_bwd_jit(
            A_seg,
            H,
            p.v[:, 0],
            p.S,
            K,
            p.m[:, :, 0],
            p.P,
            mP_prev,
            num_blocks,
            A_b,
            r_b,
            N_b,
        )
        outs[k] = (dA, dQ, dR, dy)
        A_b, r_b, N_b = A_seg[0], r0, N0

    cat = lambda i: jnp.concatenate([o[i] for o in outs], axis=0)
    return ll, cat(0), cat(1), cat(2), cat(3)


@partial(jax.jit, static_argnums=(6,))
def _seg_smooth_jit(A, Q, R, Y, res, H, num_blocks, boundary):
    lg = LGSSM(A=A, Q=Q, H=H, R=R)
    return blocked_smooth(
        lg, Y, filter_result=res, num_blocks=num_blocks, boundary=boundary
    )


# ---------------------------------------------------------------------------
# Time-parameterized variants: the LGSSM is DISCRETIZED PER SEGMENT inside
# each segment's dispatch.  Root cause (measured r4, scale_filter_4m.err):
# on TPU, (N, 3, 3) buffers inside the discretization program are tiled
# T(4, 128) — a 56.9x padding expansion, 7.6 GB per temp at N=4e6 — so a
# full-length ``lgssm_of`` caps at N ~ 2.5e6 no matter how the filter is
# dispatched.  Slicing the TIME VECTOR (N,) instead of (A, Q) keeps every
# padded buffer segment-sized; continuation segments carry the left-neighbor
# time point so the boundary transition is exact.
# ---------------------------------------------------------------------------


def _lg_seg(kernel, t_ext, nv_ext, first):
    """Discretize one segment.  For continuation segments t_ext/nv_ext carry
    the left-neighbor point and the prior-row [0] is dropped."""
    from gpar_at_scale_tpu.ssm.markov import discretize, to_sde

    lg_e = discretize(to_sde(kernel, t_ext.dtype), t_ext, nv_ext)
    if first:
        return lg_e
    return LGSSM(A=lg_e.A[1:], Q=lg_e.Q[1:], H=lg_e.H, R=lg_e.R[1:])


@partial(jax.jit, static_argnums=(4, 5))
def _seg_filter_t_jit(kernel, t_ext, nv_ext, Y, first, num_blocks, init):
    return blocked_filter(
        _lg_seg(kernel, t_ext, nv_ext, first), Y, num_blocks, init=init
    )


def _t_prep(t, noise_var, y, dtype):
    t = jnp.asarray(t)
    dtype = dtype or t.dtype
    t = t.astype(dtype)
    Y, single = _ensure_batch(y)
    n = t.shape[0]
    nv = jnp.broadcast_to(jnp.asarray(noise_var, dtype), (n,))
    return t, nv, Y.astype(dtype), n, single


def _t_slices(t, nv, s, ln, first):
    if first:
        return _dslice(t, s, ln), _dslice(nv, s, ln)
    return _dslice(t, s - 1, ln + 1), _dslice(nv, s - 1, ln + 1)


def segmented_filter_t(
    kernel,
    t,
    noise_var,
    y,
    segment_size: int = SEGMENT_SIZE,
    num_blocks: int = NUM_BLOCKS,
    dtype=None,
    _return_pieces: bool = False,
):
    """``segmented_filter`` with per-segment discretization: the Markovian
    kernel + time grid + noise replace a prebuilt LGSSM, so no full-length
    (N, d, d) array ever exists — neither on HBM nor in any compile plan."""
    t, nv, Y, n, single = _t_prep(t, noise_var, y, dtype)
    pieces, bounds = [], _seg_bounds(n, segment_size)
    init = None
    for s, ln in bounds:
        first = s == 0
        t_ext, nv_ext = _t_slices(t, nv, s, ln, first)
        res = _seg_filter_t_jit(
            kernel, t_ext, nv_ext, _dslice(Y, s, ln), first, num_blocks, init
        )
        init = (res.m[-1], res.P[-1])
        pieces.append(res)
    if _return_pieces:
        return pieces, bounds, single
    cat = lambda xs: jnp.concatenate(xs, axis=0)
    return FilterResult(
        m=cat([p.m for p in pieces]),
        P=cat([p.P for p in pieces]),
        mp=cat([p.mp for p in pieces]),
        Pp=cat([p.Pp for p in pieces]),
        S=cat([p.S for p in pieces]),
        v=cat([p.v for p in pieces]),
        ll=sum(p.ll for p in pieces),
    )


def segmented_decorrelate_t(kernel, t, noise_var, y, segment_size: int = SEGMENT_SIZE,
                            num_blocks: int = NUM_BLOCKS, dtype=None):
    single = jnp.ndim(y) == 1
    pieces, _, _ = segmented_filter_t(
        kernel, t, noise_var, y, segment_size, num_blocks, dtype,
        _return_pieces=True,
    )
    ll = sum(p.ll for p in pieces)
    alpha = jnp.concatenate(
        [p.v / jnp.sqrt(p.S)[:, None] for p in pieces], axis=0
    )
    if single:
        return ll[0], alpha[:, 0]
    return ll, alpha


@partial(jax.jit, static_argnums=(5, 6))
def _seg_smooth_t_jit(kernel, t_ext, nv_ext, Y, res, first, num_blocks, boundary):
    lg = _lg_seg(kernel, t_ext, nv_ext, first)
    sm = blocked_smooth(
        lg, Y, filter_result=res, num_blocks=num_blocks, boundary=boundary
    )
    return sm, lg.A[0]


def segmented_smooth_t(
    kernel,
    t,
    noise_var,
    y,
    segment_size: int = SEGMENT_SIZE,
    num_blocks: int = NUM_BLOCKS,
    dtype=None,
) -> SmoothResult:
    """``segmented_smooth`` with per-segment discretization."""
    t, nv, Y, n, single = _t_prep(t, noise_var, y, dtype)
    pieces, bounds, _ = segmented_filter_t(
        kernel, t, nv, Y, segment_size, num_blocks, dtype, _return_pieces=True
    )
    outs = [None] * len(bounds)
    boundary = None
    for k in range(len(bounds) - 1, -1, -1):
        s, ln = bounds[k]
        first = s == 0
        t_ext, nv_ext = _t_slices(t, nv, s, ln, first)
        sm, A0 = _seg_smooth_t_jit(
            kernel, t_ext, nv_ext, _dslice(Y, s, ln), pieces[k], first,
            num_blocks, boundary,
        )
        outs[k] = sm
        if k > 0:
            boundary = (A0, pieces[k].mp[0], pieces[k].Pp[0], sm.ms[0], sm.Ps[0])
    cat = lambda xs: jnp.concatenate(xs, axis=0)
    mean = cat([o.mean for o in outs])
    var = cat([o.var for o in outs])
    ms = cat([o.ms for o in outs])
    Ps = cat([o.Ps for o in outs])
    ll = sum(p.ll for p in pieces)
    if single and mean.ndim == 2:
        mean = mean[:, 0]
    return SmoothResult(mean=mean, var=var, ll=ll, ms=ms, Ps=Ps)


def make_segmented_nll_grad(
    kernel_fn,
    t,
    y,
    segment_size: int = SEGMENT_SIZE,
    num_blocks: int = NUM_BLOCKS,
    dtype=None,
):
    """Closed-form log-likelihood gradient factory, everything segment-sized.

    kernel_fn: p -> (markov_kernel, noise_var).  Returns ``grad_fn(p) ->
    (ll, g)`` with g = d ll / d p.  Per segment, ONE backward dispatch fuses
    discretization, the r/N adjoint suffix scan, the score contractions,
    AND the pullback of (dA, dQ, dR) into p through the segment's own
    discretization vjp (transitions depend only on local time gaps, so
    per-segment pullbacks with the left-neighbor point sum to the exact
    full-series gradient — verified to 1e-12 vs jax.grad in tests)."""
    t = jnp.asarray(t)
    dtype = dtype or t.dtype
    t = t.astype(dtype)
    y = jnp.asarray(y, dtype)
    n = t.shape[0]
    bounds = _seg_bounds(n, segment_size)

    def _lg_of(p, t_ext, first):
        k, nv = kernel_fn(p)
        nv_ext = jnp.broadcast_to(jnp.asarray(nv, dtype), t_ext.shape)
        return _lg_seg(k, t_ext, nv_ext, first)

    @partial(jax.jit, static_argnums=(3, 4))
    def fwd_seg(p, t_ext, y_seg, first, num_blocks, init):
        return blocked_filter(
            _lg_of(p, t_ext, first), y_seg[:, None], num_blocks, init=init
        )

    @partial(jax.jit, static_argnums=(7, 8))
    @jax.default_matmul_precision("highest")
    def bwd_seg(p, t_ext, piece, mP_prev, A_b, r_b, N_b, first, num_blocks):
        lg = _lg_of(p, t_ext, first)
        H = lg.H
        K = jnp.einsum("nij,j->ni", piece.Pp, H) / piece.S[:, None]
        dA, dQ, dR, _, r0, N0 = _seg_bwd_core(
            lg.A, H, piece.v[:, 0], piece.S, K, piece.m[:, :, 0], piece.P,
            mP_prev, num_blocks, A_b, r_b, N_b,
        )
        _, vjp = jax.vjp(
            lambda pp: (lambda l: (l.A, l.Q, l.R))(_lg_of(pp, t_ext, first)), p
        )
        (g,) = vjp((dA, dQ, dR))
        return g, r0, N0, lg.A[0]

    def grad_fn(p):
        pieces, init = [], None
        for s, ln in bounds:
            first = s == 0
            t_ext = _dslice(t, s, ln) if first else _dslice(t, s - 1, ln + 1)
            piece = fwd_seg(p, t_ext, _dslice(y, s, ln), first, num_blocks, init)
            init = (piece.m[-1], piece.P[-1])
            pieces.append(piece)
        ll = sum(pc.ll for pc in pieces)[0]
        d = pieces[0].P.shape[-1]
        A_b = jnp.zeros((d, d), dtype)
        r_b = jnp.zeros((d,), dtype)
        N_b = jnp.zeros((d, d), dtype)
        g = None
        for k in range(len(bounds) - 1, -1, -1):
            s, ln = bounds[k]
            first = s == 0
            t_ext = _dslice(t, s, ln) if first else _dslice(t, s - 1, ln + 1)
            if k > 0:
                mP_prev = (pieces[k - 1].m[-1, :, 0], pieces[k - 1].P[-1])
            else:
                mP_prev = (jnp.zeros((d,), dtype), jnp.zeros((d, d), dtype))
            gs, r0, N0, A0 = bwd_seg(
                p, t_ext, pieces[k], mP_prev, A_b, r_b, N_b, first, num_blocks
            )
            g = gs if g is None else g + gs
            A_b, r_b, N_b = A0, r0, N0
        return ll, g

    return grad_fn


@partial(jax.jit, static_argnums=(5,))
def _seg_sample_jit(A, Q, R, piece, H, num_blocks, xi, next_step, x_term):
    from gpar_at_scale_tpu.ssm.blocked import _smoother_elements_fast, ffbs_draw

    lg = LGSSM(A=A, Q=Q, H=H, R=R)
    E, g, L = _smoother_elements_fast(lg, piece, next_step=next_step)
    return ffbs_draw(E, g, L, xi, num_blocks, x_term=x_term)


def segmented_posterior_sample(
    key,
    lgssm: LGSSM,
    y,
    num_samples: int = 1,
    segment_size: int = SEGMENT_SIZE,
    num_blocks: int = NUM_BLOCKS,
    xi=None,
):
    """Joint posterior samples of f = H x in segment dispatches — the
    million-step ``posterior_rand`` (``src/gp/tmp.jl:167``): forward
    segmented filter, then a reverse segment loop where the later segment's
    FIRST sampled state is injected as the affine suffix scan's terminal
    element (the same carry mechanism as ``segmented_smooth``; a segment's
    last FFBS conditional crosses the boundary via the ``next_step`` hook).
    Exact: identical to ``blocked_posterior_sample`` given the same xi.

    Returns (num_samples, N).  xi: optional (N, d, num_samples) standard
    normals (deterministic test hook)."""
    single = jnp.ndim(y) == 1
    if not single and jnp.shape(y)[1] != 1:
        raise ValueError("segmented_posterior_sample expects one observation column")
    n = lgssm.num_steps
    d = lgssm.dim
    dtype = lgssm.A.dtype
    H = lgssm.H.astype(dtype)
    R = jnp.broadcast_to(jnp.asarray(lgssm.R, dtype), (n,))

    pieces, bounds, _ = segmented_filter(
        lgssm, y, segment_size, num_blocks, _return_pieces=True
    )
    if xi is None:
        xi = jax.random.normal(key, (n, d, num_samples), dtype)
    else:
        xi = jnp.asarray(xi, dtype)

    outs = [None] * len(bounds)
    next_step, x_term = None, None
    for k in range(len(bounds) - 1, -1, -1):
        s, ln = bounds[k]
        A_seg = _dslice(lgssm.A, s, ln)
        x = _seg_sample_jit(
            A_seg,
            _dslice(lgssm.Q, s, ln),
            _dslice(R, s, ln),
            pieces[k],
            H,
            num_blocks,
            _dslice(xi, s, ln),
            next_step,
            x_term,
        )
        outs[k] = x
        if k > 0:
            next_step = (A_seg[0], pieces[k].mp[0], pieces[k].Pp[0])
            x_term = x[0]
    x_full = jnp.concatenate(outs, axis=0)  # (N, d, S)
    return jnp.einsum("d,nds->sn", H, x_full)


def segmented_smooth(
    lgssm: LGSSM,
    y,
    segment_size: int = SEGMENT_SIZE,
    num_blocks: int = NUM_BLOCKS,
) -> SmoothResult:
    """RTS smoother in segment dispatches: forward segmented filter, then a
    reverse segment loop with the smoothing carry injected as the suffix
    scan's terminal element.  Parity with ``rts_smooth``/``blocked_smooth``."""
    Y, single = _ensure_batch(y)
    n = lgssm.num_steps
    dtype = lgssm.A.dtype
    H = lgssm.H.astype(dtype)
    R = jnp.broadcast_to(jnp.asarray(lgssm.R, dtype), (n,))
    Yc = Y.astype(dtype)

    pieces, bounds, _ = segmented_filter(
        lgssm, Yc, segment_size, num_blocks, _return_pieces=True
    )
    outs = [None] * len(bounds)
    boundary = None
    for k in range(len(bounds) - 1, -1, -1):
        s, ln = bounds[k]
        sm = _seg_smooth_jit(
            _dslice(lgssm.A, s, ln),
            _dslice(lgssm.Q, s, ln),
            _dslice(R, s, ln),
            _dslice(Yc, s, ln),
            pieces[k],
            H,
            num_blocks,
            boundary,
        )
        outs[k] = sm
        if k > 0:
            s_next = bounds[k][0]
            boundary = (
                _dslice(lgssm.A, s_next, 1)[0],
                pieces[k].mp[0],
                pieces[k].Pp[0],
                sm.ms[0],
                sm.Ps[0],
            )

    cat = lambda xs: jnp.concatenate(xs, axis=0)
    mean = cat([o.mean for o in outs])
    var = cat([o.var for o in outs])
    ms = cat([o.ms for o in outs])
    Ps = cat([o.Ps for o in outs])
    ll = sum(p.ll for p in pieces)
    if single:
        # blocked_smooth already squeezed per segment when given (n, 1) Y?
        # No: we passed batched Yc, so mean is (n, 1); squeeze here.
        mean = mean[:, 0] if mean.ndim == 2 else mean
    return SmoothResult(mean=mean, var=var, ll=ll, ms=ms, Ps=Ps)
