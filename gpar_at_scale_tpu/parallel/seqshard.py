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

from gpar_at_scale_tpu.ssm.kalman import FilterResult, _ensure_batch
from gpar_at_scale_tpu.ssm.markov import LGSSM
from gpar_at_scale_tpu.ssm.pkalman import _combine, _filter_elements

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


@partial(jax.jit, static_argnames=("mesh", "axis"))
@jax.default_matmul_precision("highest")
def _sharded_filter_impl(mesh: Mesh, axis: str, A, Q, R, H, Y) -> FilterResult:
    n = Y.shape[0]
    d = A.shape[-1]
    B = Y.shape[1]
    dtype = A.dtype
    nblocks = mesh.shape[axis]
    pad = (-n) % nblocks

    if pad:
        A = jnp.concatenate([A, jnp.broadcast_to(jnp.eye(d, dtype=dtype), (pad, d, d))])
        Q = jnp.concatenate([Q, jnp.zeros((pad, d, d), dtype)])
        R = jnp.concatenate([R, jnp.ones((pad,), dtype)])
        Y = jnp.concatenate([Y, jnp.zeros((pad, B), dtype)])
    npad = n + pad

    valid = (jnp.arange(npad) < n).astype(dtype)  # lml mask for padded steps

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
        lgssm_b = LGSSM(A=A_b, Q=Q_b, H=H_r, R=R_b)
        elems = _filter_elements(lgssm_b, Y_b)

        # Phase 1: local inclusive scan.
        scanned = jax.lax.associative_scan(_combine, elems, axis=0)
        block_total = jax.tree.map(lambda x: x[-1], scanned)

        # Phase 2: tiny all_gather of block totals + exclusive prefix.
        totals = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis), block_total
        )  # leading axis nblocks
        ident = _identity_element(d, B, dtype)
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

    res = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
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
