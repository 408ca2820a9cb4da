"""Explicit time-block-sharded Kalman filter (sequence parallelism).

``ssm/pkalman.py`` expresses the filter as one global
``jax.lax.associative_scan`` and leaves the cross-device decomposition to
XLA's GSPMD partitioner.  This module is the *explicit* formulation of the
same parallel-prefix algorithm over a named mesh axis (SURVEY.md §5.7 build
mapping, hard part #2: "sharding the scan across hosts — block-boundary
combine via collective permute without serializing"):

  phase 1 (local):   each device builds the filtering elements for its time
                     block and runs a device-local inclusive associative scan
                     — O(N/B) work, no communication.
  phase 2 (global):  the B per-block *total* elements (one (d,d)-sized tuple
                     per device — tiny) are all-gathered along the axis and
                     exclusively prefix-combined; device k keeps the combined
                     element of blocks 0..k-1.  Cost: one all_gather of
                     O(B d^2) floats riding ICI.
  phase 3 (local):   the block-prefix element is combined into every local
                     scanned element in one vectorized ``_combine`` — the
                     prefix-scan "downsweep".  Predicted moments need the
                     *previous step's* filtered moments, whose block-boundary
                     value arrives from the left neighbour via ``ppermute``.

The result is bit-for-bit the associative-scan filter's output with
communication restricted to one small all_gather + one ppermute per call,
independent of N — the GP-world analogue of ring-attention-style sequence
parallelism (the reference's recursion is strictly sequential,
``src/gp/temporal_gp_inference.jl:15-39``; its per-column whitening loop is
``src/gp/dtc.jl:110-117``).

Blocks need not divide N: the tail is padded with the combine's identity
element (A=I, b=0, C=0, eta=0, J=0) and the pad's lml contribution masked.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpar_at_scale_tpu.ssm.kalman import FilterResult, SmoothResult, _ensure_batch
from gpar_at_scale_tpu.ssm.markov import LGSSM
from gpar_at_scale_tpu.ssm.pkalman import _combine, _combine_smooth, _filter_elements

_LOG_2PI = 1.8378770664093453


def _identity_element(d, B, dtype):
    """Identity of the filtering-element combine: behaves as a no-op step."""
    return (
        jnp.eye(d, dtype=dtype),
        jnp.zeros((d, B), dtype),
        jnp.zeros((d, d), dtype),
        jnp.zeros((d, B), dtype),
        jnp.zeros((d, d), dtype),
    )


def _exclusive_prefix(totals, identity):
    """Exclusive prefix-combine over the leading (block) axis.

    totals: tuple of arrays with leading axis nblocks.  Returns the same
    structure where entry k = combine(totals[0], ..., totals[k-1]) and
    entry 0 = identity.  nblocks is small (== mesh axis size), so a
    sequential ``lax.scan`` is the right tool.
    """

    def step(carry, elem):
        nxt = _combine(carry, elem)  # carry is the earlier aggregate
        return nxt, carry

    _, prefixes = jax.lax.scan(step, identity, totals)
    return prefixes


def _block_filter(axis, nblocks, A_b, Q_b, R_b, H_r, Y_b, valid_b) -> FilterResult:
    """Per-device body of the 3-phase block-parallel filter (runs inside
    shard_map; all arrays are the local time block)."""
    d = A_b.shape[-1]
    B = Y_b.shape[-1]
    dtype = A_b.dtype
    lgssm_b = LGSSM(A=A_b, Q=Q_b, H=H_r, R=R_b)
    elems = _filter_elements(lgssm_b, Y_b)

    # Phase 1: local inclusive scan.
    scanned = jax.lax.associative_scan(_combine, elems, axis=0)
    block_total = jax.tree.map(lambda x: x[-1], scanned)

    # Phase 2: tiny all_gather of block totals + exclusive prefix.
    totals = jax.tree.map(
        lambda x: jax.lax.all_gather(x, axis), block_total
    )  # leading axis nblocks
    # pvary: the identity is a replicated constant but the scan carry
    # becomes device-varying after the first combine — align the vma types
    # so check_vma=True can verify the rest of the collectives.
    ident = jax.tree.map(
        lambda x: jax.lax.pcast(x, axis, to="varying"),
        _identity_element(d, B, dtype),
    )
    prefixes = _exclusive_prefix(totals, ident)
    idx = jax.lax.axis_index(axis)
    my_prefix = jax.tree.map(
        lambda x: jax.lax.dynamic_index_in_dim(x, idx, 0, keepdims=False),
        prefixes,
    )

    # Phase 3: fold the earlier-blocks prefix into every local element.
    pfx = jax.tree.map(lambda x: x[None], my_prefix)
    _, b_s, C_s, _, _ = _combine(pfx, scanned)
    m = b_s  # (nb, d, B) filtered means
    Pf = C_s  # (nb, d, d) filtered covariances

    # Previous step's filtered moments: local shift; boundary value is the
    # left neighbour's last step, fetched with one ppermute ring hop.
    perm = [(i, (i + 1) % nblocks) for i in range(nblocks)]
    m_brd = jax.lax.ppermute(m[-1], axis, perm)  # (d, B) from left
    P_brd = jax.lax.ppermute(Pf[-1], axis, perm)
    first = jnp.where(idx == 0, 0.0, 1.0).astype(dtype)  # block 0: x_0 prior = 0
    m_prev = jnp.concatenate([(first * m_brd)[None], m[:-1]], axis=0)
    P_prev = jnp.concatenate([(first * P_brd)[None], Pf[:-1]], axis=0)

    mp = jnp.einsum("nab,nbB->naB", A_b, m_prev)
    Pp = jnp.einsum("nab,nbc,ndc->nad", A_b, P_prev, A_b) + Q_b

    S = jnp.einsum("a,nab,b->n", H_r, Pp, H_r) + R_b
    v = Y_b - jnp.einsum("a,naB->nB", H_r, mp)
    ll_local = -0.5 * jnp.sum(
        valid_b[:, None] * (_LOG_2PI + jnp.log(S)[:, None] + v * v / S[:, None]),
        axis=0,
    )
    ll = jax.lax.psum(ll_local, axis)
    return FilterResult(m=m, P=Pf, mp=mp, Pp=Pp, S=S, v=v, ll=ll)


def _pad_inputs(A, Q, R, Y, n, pad):
    d = A.shape[-1]
    B = Y.shape[-1]
    dtype = A.dtype
    if pad:
        A = jnp.concatenate([A, jnp.broadcast_to(jnp.eye(d, dtype=dtype), (pad, d, d))])
        Q = jnp.concatenate([Q, jnp.zeros((pad, d, d), dtype)])
        R = jnp.concatenate([R, jnp.ones((pad,), dtype)])
        Y = jnp.concatenate([Y, jnp.zeros((pad, B), dtype)])
    valid = (jnp.arange(n + pad) < n).astype(dtype)
    return A, Q, R, Y, valid


@partial(jax.jit, static_argnames=("mesh", "axis"))
@jax.default_matmul_precision("highest")
def _sharded_filter_impl(mesh: Mesh, axis: str, A, Q, R, H, Y) -> FilterResult:
    n = Y.shape[0]
    nblocks = mesh.shape[axis]
    pad = (-n) % nblocks
    A, Q, R, Y, valid = _pad_inputs(A, Q, R, Y, n, pad)

    spec_t = P(axis)  # sharded along time
    in_specs = (
        P(axis, None, None),  # A
        P(axis, None, None),  # Q
        spec_t,  # R
        P(None),  # H (replicated)
        P(axis, None),  # Y
        spec_t,  # valid
    )
    out_specs = FilterResult(
        m=P(axis, None, None),
        P=P(axis, None, None),
        mp=P(axis, None, None),
        Pp=P(axis, None, None),
        S=spec_t,
        v=P(axis, None),
        ll=P(None),
    )

    def block_fn(A_b, Q_b, R_b, H_r, Y_b, valid_b):
        return _block_filter(axis, nblocks, A_b, Q_b, R_b, H_r, Y_b, valid_b)

    res = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=True,
    )(A, Q, R, H, Y, valid)

    if pad:
        res = FilterResult(
            m=res.m[:n], P=res.P[:n], mp=res.mp[:n], Pp=res.Pp[:n],
            S=res.S[:n], v=res.v[:n], ll=res.ll,
        )
    return res


def make_sharded_filter(mesh: Mesh, axis: str = "data"):
    """Return ``filter_fn(lgssm, y) -> FilterResult`` running the explicit
    3-phase block-parallel filter over ``mesh[axis]``.  Drop-in for the
    ``filter_fn`` hook of ``gp/dtc.py`` (so the whole DTC objective trains
    with a genuinely time-sharded whitening pass)."""

    def filter_fn(lgssm: LGSSM, y) -> FilterResult:
        Y, _ = _ensure_batch(y)
        return _sharded_filter_impl(mesh, axis, lgssm.A, lgssm.Q, lgssm.R, lgssm.H, Y)

    return filter_fn


def make_sharded_decorrelate(mesh: Mesh, axis: str = "data"):
    """(lml, alpha) whitening through the block-parallel filter — the
    sequence-sharded replacement for ``decorrelate`` (``src/gp/dtc.jl:106``)."""
    filter_fn = make_sharded_filter(mesh, axis)

    def dec(lgssm: LGSSM, y):
        single = jnp.ndim(y) == 1
        res = filter_fn(lgssm, y)
        alpha = res.v / jnp.sqrt(res.S)[:, None]
        if single:
            return res.ll[0], alpha[:, 0]
        return res.ll, alpha

    return dec


def make_sharded_logpdf(mesh: Mesh, axis: str = "data"):
    filter_fn = make_sharded_filter(mesh, axis)

    def lp(lgssm: LGSSM, y):
        res = filter_fn(lgssm, y)
        return res.ll[0] if jnp.ndim(y) == 1 else res.ll

    return lp


def _smooth_identity(d, B, dtype):
    """Identity of the smoothing combine: (E=I, g=0, L=0)."""
    return (
        jnp.eye(d, dtype=dtype),
        jnp.zeros((d, B), dtype),
        jnp.zeros((d, d), dtype),
    )


@partial(jax.jit, static_argnames=("mesh", "axis"))
@jax.default_matmul_precision("highest")
def _sharded_smooth_impl(mesh: Mesh, axis: str, A, Q, R, H, Y) -> SmoothResult:
    n = Y.shape[0]
    d = A.shape[-1]
    B = Y.shape[-1]
    dtype = A.dtype
    nblocks = mesh.shape[axis]
    pad = (-n) % nblocks
    A, Q, R, Y, valid = _pad_inputs(A, Q, R, Y, n, pad)
    nb = (n + pad) // nblocks

    spec_t = P(axis)
    in_specs = (
        P(axis, None, None),
        P(axis, None, None),
        spec_t,
        P(None),
        P(axis, None),
        spec_t,
    )
    out_specs = SmoothResult(
        mean=P(axis, None),
        var=spec_t,
        ll=P(None),
        ms=P(axis, None, None),
        Ps=P(axis, None, None),
    )

    def block_fn(A_b, Q_b, R_b, H_r, Y_b, valid_b):
        res = _block_filter(axis, nblocks, A_b, Q_b, R_b, H_r, Y_b, valid_b)
        idx = jax.lax.axis_index(axis)
        gidx = idx * nb + jnp.arange(nb)  # global step indices of this block

        # Smoothing elements need the NEXT step's (A, mp, Pp): local shift
        # left; the block-boundary value arrives from the right neighbour.
        perm = [(i, (i - 1) % nblocks) for i in range(nblocks)]
        A_from_r = jax.lax.ppermute(A_b[0], axis, perm)
        mp_from_r = jax.lax.ppermute(res.mp[0], axis, perm)
        Pp_from_r = jax.lax.ppermute(res.Pp[0], axis, perm)
        A_next = jnp.concatenate([A_b[1:], A_from_r[None]], axis=0)
        mp_next = jnp.concatenate([res.mp[1:], mp_from_r[None]], axis=0)
        Pp_next = jnp.concatenate([res.Pp[1:], Pp_from_r[None]], axis=0)

        # E_k = P_k A_{k+1}^T Pp_{k+1}^-1 ; g_k = m_k - E_k mp_{k+1} ;
        # L_k = P_k - E_k Pp_{k+1} E_k^T   (pkalman._smoother_elements).
        PAt = jnp.einsum("nab,ncb->nac", res.P, A_next)
        E = jnp.swapaxes(jnp.linalg.solve(Pp_next, jnp.swapaxes(PAt, -1, -2)), -1, -2)
        g = res.m - jnp.einsum("nab,nbB->naB", E, mp_next)
        L = res.P - E @ Pp_next @ jnp.swapaxes(E, -1, -2)

        # Terminal element (0, m_{n-1}, P_{n-1}) at the last REAL step; pad
        # steps carry the combine's identity so they are inert.
        is_last = (gidx == (n - 1))[:, None, None]
        is_pad = (gidx > (n - 1))[:, None, None]
        I = jnp.broadcast_to(jnp.eye(d, dtype=dtype), E.shape)
        E = jnp.where(is_last, 0.0, jnp.where(is_pad, I, E))
        g = jnp.where(is_last[..., :1], res.m, jnp.where(is_pad[..., :1], 0.0, g))
        L = jnp.where(is_last, res.P, jnp.where(is_pad, 0.0, L))

        # Phase 1: local reverse inclusive scan.
        scanned = jax.lax.associative_scan(
            _combine_smooth, (E, g, L), axis=0, reverse=True
        )
        block_total = jax.tree.map(lambda x: x[0], scanned)

        # Phase 2: all_gather block totals; exclusive SUFFIX combine so
        # device k holds the aggregate of blocks k+1..B-1.
        totals = jax.tree.map(lambda x: jax.lax.all_gather(x, axis), block_total)
        ident = jax.tree.map(
            lambda x: jax.lax.pcast(x, axis, to="varying"),
            _smooth_identity(d, B, dtype),
        )

        def step(carry, elem):
            nxt = _combine_smooth(carry, elem)  # carry = later aggregate
            return nxt, carry

        _, suffixes = jax.lax.scan(step, ident, totals, reverse=True)
        my_suffix = jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(x, idx, 0, keepdims=False),
            suffixes,
        )

        # Phase 3: fold the later-blocks suffix into every local element.
        sfx = jax.tree.map(lambda x: x[None], my_suffix)
        _, g_s, L_s = _combine_smooth(sfx, scanned)
        ms = g_s
        Ps = L_s
        f_mean = jnp.einsum("d,ndb->nb", H_r, ms)
        f_var = jnp.einsum("d,nde,e->n", H_r, Ps, H_r)
        return SmoothResult(
            mean=f_mean, var=jnp.maximum(f_var, 0.0), ll=res.ll, ms=ms, Ps=Ps
        )

    res = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=True,
    )(A, Q, R, H, Y, valid)

    if pad:
        res = SmoothResult(
            mean=res.mean[:n], var=res.var[:n], ll=res.ll,
            ms=res.ms[:n], Ps=res.Ps[:n],
        )
    return res


def make_sharded_smooth(mesh: Mesh, axis: str = "data"):
    """Time-block-sharded RTS smoother — the sequence-parallel replacement
    for ``smooth`` (``src/gp/temporal_gp_inference.jl:109``): the reverse
    prefix scan runs device-locally, later-block aggregates arrive via one
    all_gather, and next-step boundary values via one ppermute."""

    def smooth_fn(lgssm: LGSSM, y) -> SmoothResult:
        Y, single = _ensure_batch(y)
        res = _sharded_smooth_impl(mesh, axis, lgssm.A, lgssm.Q, lgssm.R, lgssm.H, Y)
        if single:
            res = res._replace(mean=res.mean[:, 0])
        return res

    return smooth_fn
