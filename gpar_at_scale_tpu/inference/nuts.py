"""No-U-Turn Sampler — iterative, bounded-depth, fixed-shape for TPU.

Multinomial NUTS (Betancourt 2017) with the memory-efficient iterative tree
building of Phan & Pradhan (numpyro) so there is no recursion and no
data-dependent Python control flow (SURVEY.md §8 hard part 5): the doubling
loop and the per-subtree leapfrog loop are ``lax.while_loop``s, and the
in-subtree U-turn checks use an O(max_depth) checkpoint stack:

* streaming leaves i = 0..2^j-1 of a subtree, an even leaf i writes its
  momentum and the momentum prefix-sum *before* it into slot popcount(i);
* an odd leaf b closes the subtrees of size 2^k for k = 1..trailing_ones(b),
  whose left edges live in slots popcount(b) - k — exactly the slots still
  holding their values (popcount-slot invariant).

Dual-averaging step-size and diagonal mass adaptation are shared with the
HMC module.  vmap over chains; shard the chain axis over the mesh.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.inference.hmc import (
    da_init,
    da_update,
    welford_init,
    welford_update,
    welford_variance,
)


class _TreeState(NamedTuple):
    # trajectory edges
    q_left: jnp.ndarray
    p_left: jnp.ndarray
    g_left: jnp.ndarray
    q_right: jnp.ndarray
    p_right: jnp.ndarray
    g_right: jnp.ndarray
    # multinomial proposal
    q_prop: jnp.ndarray
    lp_prop: jnp.ndarray
    log_weight: jnp.ndarray  # log sum of exp(-energy) over trajectory
    p_sum: jnp.ndarray  # momentum sum over trajectory
    depth: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray  # for dual averaging
    num_leaves: jnp.ndarray


def _popcount(x):
    return jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.int32)


def _is_turning(p_sum, p_first, p_last, inv_mass):
    v = p_sum * inv_mass
    return jnp.logical_or(jnp.sum(v * p_first) < 0.0, jnp.sum(v * p_last) < 0.0)


def nuts_kernel(
    logprob_grad_fn: Callable,
    q,
    lp,
    g,
    key,
    eps,
    inv_mass,
    max_depth: int = 8,
):
    """One NUTS transition. Returns (q, lp, g, mean_accept_prob, diverging,
    depth_reached)."""
    dim = q.shape[-1]
    dtype = q.dtype
    k_mom, k_dir, k_tree = jax.random.split(key, 3)
    p0 = jax.random.normal(k_mom, (dim,), dtype) / jnp.sqrt(inv_mass)
    h0 = -lp + 0.5 * jnp.sum(p0 * p0 * inv_mass)

    def leapfrog_one(q, p, g, direction):
        e = direction * eps
        p_half = p + 0.5 * e * g
        q_new = q + e * inv_mass * p_half
        lp_new, g_new = logprob_grad_fn(q_new)
        p_new = p_half + 0.5 * e * g_new
        return q_new, p_new, lp_new, g_new

    def build_subtree(state: _TreeState, direction, key):
        """Extend the trajectory by 2^depth leaves in ``direction``."""
        num_leaves = jnp.asarray(1, jnp.int32) << state.depth

        # checkpoint stacks for the in-subtree U-turn test
        p_ckpt = jnp.zeros((max_depth + 1, dim), dtype)
        psum_ckpt = jnp.zeros((max_depth + 1, dim), dtype)

        q_edge = jnp.where(direction > 0, state.q_right, state.q_left)
        p_edge = jnp.where(direction > 0, state.p_right, state.p_left)
        g_edge = jnp.where(direction > 0, state.g_right, state.g_left)

        init = dict(
            i=jnp.asarray(0, jnp.int32),
            q=q_edge,
            p=p_edge,
            g=g_edge,
            q_first=q_edge,
            p_first=p_edge,
            g_first=g_edge,
            q_prop=state.q_prop,
            lp_prop=state.lp_prop,
            log_w=jnp.asarray(-jnp.inf, dtype),
            p_sum=jnp.zeros((dim,), dtype),
            p_ckpt=p_ckpt,
            psum_ckpt=psum_ckpt,
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            sum_accept=jnp.asarray(0.0, dtype),
            key=key,
        )

        def cond(c):
            return jnp.logical_and(
                c["i"] < num_leaves,
                jnp.logical_not(jnp.logical_or(c["turning"], c["diverging"])),
            )

        def body(c):
            i = c["i"]
            # checkpoint write BEFORE stepping leaf i (even leaves only):
            # slot popcount(i) records the momentum prefix-sum before leaf i.
            slot = _popcount(i)
            write = (i % 2) == 0
            psum_ckpt = jnp.where(
                write, c["psum_ckpt"].at[slot].set(c["p_sum"]), c["psum_ckpt"]
            )

            q_new, p_new, lp_new, g_new = leapfrog_one(c["q"], c["p"], c["g"], direction)
            h_new = -lp_new + 0.5 * jnp.sum(p_new * p_new * inv_mass)
            delta = h0 - h_new
            diverging = jnp.logical_or(jnp.isnan(delta), delta < -1000.0)
            log_w_leaf = jnp.where(diverging, -jnp.inf, delta)  # propto exp(-h+h0)
            # NaN-safe acceptance: a NaN energy (f32 chol overflow at extreme
            # hyperparameters) must count as accept=0, NOT poison sum_accept
            # -> dual averaging -> step size for the rest of the run.
            accept_leaf = jnp.where(
                diverging, 0.0, jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0)))
            )

            p_ckpt = jnp.where(write, c["p_ckpt"].at[slot].set(p_new), c["p_ckpt"])
            p_sum = c["p_sum"] + p_new

            # first leaf of the subtree
            is_first = i == 0
            q_first = jnp.where(is_first, q_new, c["q_first"])
            p_first = jnp.where(is_first, p_new, c["p_first"])
            g_first = jnp.where(is_first, g_new, c["g_first"])

            # progressive multinomial proposal within the subtree
            log_w = jnp.logaddexp(c["log_w"], log_w_leaf)
            key, k_u = jax.random.split(c["key"])
            take = jnp.log(jax.random.uniform(k_u, dtype=dtype)) < (log_w_leaf - log_w)
            q_prop = jnp.where(take, q_new, c["q_prop"])
            lp_prop = jnp.where(take, lp_new, c["lp_prop"])

            # U-turn checks for every subtree closed at odd leaf i:
            # sizes 2^k, k = 1..trailing_ones(i), left edges in slots
            # popcount(i) - k; the subtree momentum sum is p_sum - psum_ckpt.
            t_ones = _popcount(jnp.bitwise_and(~i, i + 1) - 1)  # trailing ones
            pc = _popcount(i)

            def check_k(k, turning):
                active = k <= t_ones
                slot_k = pc - k
                rho = p_sum - c["psum_ckpt"][slot_k]
                turn_k = _is_turning(rho, c["p_ckpt"][slot_k], p_new, inv_mass)
                return jnp.logical_or(turning, jnp.logical_and(active, turn_k))

            turning = jax.lax.fori_loop(1, max_depth + 1, check_k, jnp.asarray(False))

            return dict(
                i=i + 1,
                q=q_new,
                p=p_new,
                g=g_new,
                q_first=q_first,
                p_first=p_first,
                g_first=g_first,
                q_prop=q_prop,
                lp_prop=lp_prop,
                log_w=log_w,
                p_sum=p_sum,
                p_ckpt=p_ckpt,
                psum_ckpt=psum_ckpt,
                turning=turning,
                diverging=jnp.logical_or(c["diverging"], diverging),
                sum_accept=c["sum_accept"] + accept_leaf,
                key=key,
            )

        out = jax.lax.while_loop(cond, body, init)
        return out

    def doubling_cond(state: _TreeState):
        return jnp.logical_and(
            state.depth < max_depth,
            jnp.logical_not(jnp.logical_or(state.turning, state.diverging)),
        )

    def doubling_body(state: _TreeState):
        key_d, key_t, key_b, key_next = jax.random.split(
            jax.random.fold_in(k_tree, state.depth), 4
        )
        direction = jnp.where(jax.random.bernoulli(key_d), 1.0, -1.0).astype(dtype)
        sub = build_subtree(state, direction, key_t)

        completed = jnp.logical_not(jnp.logical_or(sub["turning"], sub["diverging"]))

        # biased progressive sampling between old trajectory and new subtree
        log_w_new = sub["log_w"]
        accept_subtree = jnp.exp(jnp.minimum(log_w_new - state.log_weight, 0.0))
        take = jax.random.uniform(key_b, dtype=dtype) < accept_subtree
        take = jnp.logical_and(take, completed)
        q_prop = jnp.where(take, sub["q_prop"], state.q_prop)
        lp_prop = jnp.where(take, sub["lp_prop"], state.lp_prop)

        # new trajectory edges
        q_left = jnp.where(direction > 0, state.q_left, sub["q"])
        p_left = jnp.where(direction > 0, state.p_left, sub["p"])
        g_left = jnp.where(direction > 0, state.g_left, sub["g"])
        q_right = jnp.where(direction > 0, sub["q"], state.q_right)
        p_right = jnp.where(direction > 0, sub["p"], state.p_right)
        g_right = jnp.where(direction > 0, sub["g"], state.g_right)

        p_sum = state.p_sum + sub["p_sum"]
        turning_ends = _is_turning(p_sum, p_left, p_right, inv_mass)
        turning = jnp.logical_or(sub["turning"], jnp.logical_and(completed, turning_ends))

        return _TreeState(
            q_left=q_left,
            p_left=p_left,
            g_left=g_left,
            q_right=q_right,
            p_right=p_right,
            g_right=g_right,
            q_prop=q_prop,
            lp_prop=lp_prop,
            log_weight=jnp.logaddexp(state.log_weight, jnp.where(completed, log_w_new, -jnp.inf)),
            p_sum=p_sum,
            depth=state.depth + 1,
            turning=turning,
            diverging=sub["diverging"],
            sum_accept=state.sum_accept + sub["sum_accept"],
            num_leaves=state.num_leaves + sub["i"],
        )

    init_state = _TreeState(
        q_left=q,
        p_left=p0,
        g_left=g,
        q_right=q,
        p_right=p0,
        g_right=g,
        q_prop=q,
        lp_prop=lp,
        log_weight=jnp.asarray(0.0, dtype),  # root leaf has delta = 0
        p_sum=p0,
        depth=jnp.asarray(0, jnp.int32),
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        sum_accept=jnp.asarray(0.0, dtype),
        num_leaves=jnp.asarray(1, jnp.int32),
    )

    final = jax.lax.while_loop(doubling_cond, doubling_body, init_state)
    lp_new, g_new = logprob_grad_fn(final.q_prop)
    mean_accept = final.sum_accept / jnp.maximum(final.num_leaves - 1, 1).astype(dtype)
    return final.q_prop, lp_new, g_new, mean_accept, final.diverging, final.depth


class NUTSResult(NamedTuple):
    samples: jnp.ndarray
    log_probs: jnp.ndarray
    accept_prob: jnp.ndarray
    step_size: jnp.ndarray
    inv_mass: jnp.ndarray
    num_divergent: jnp.ndarray
    mean_tree_depth: jnp.ndarray


def nuts_chunked(
    key,
    logprob_fn: Callable,
    x0s,
    *,
    num_samples: int = 1000,
    num_warmup: int = 500,
    segment_size: int = 100,
    max_depth: int = 8,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
    adapt_mass: bool = True,
) -> NUTSResult:
    """Vmapped-chain NUTS run in bounded-size device executions.

    Semantically identical to ``jax.vmap(nuts)`` but each device call scans
    at most ``segment_size`` transitions, with a host sync between segments
    — for runtimes that bound single-execution duration (this sandbox's TPU
    tunnel kills executions over ~1-3 min, which is what crashed the r2
    ``ess.py --chains=32`` run).  x0s: (C, dim); returns chain-stacked
    NUTSResult with samples (C, S, dim).
    """
    import numpy as np

    x0s = jnp.asarray(x0s)
    chains, dim = x0s.shape
    dtype = x0s.dtype
    vg = jax.value_and_grad(logprob_fn)

    keys = jax.vmap(
        lambda k: jax.random.split(k, num_warmup + num_samples)
    )(jax.random.split(key, chains))  # (C, total, 2)

    def warm_seg(carry, seg_keys):
        def body(c, k):
            q, lp, g, da, wf = c
            eps = jnp.exp(da.log_eps)
            inv_mass = welford_variance(wf) if adapt_mass else jnp.ones((dim,), dtype)
            q, lp, g, aprob, div, depth = nuts_kernel(
                vg, q, lp, g, k, eps, inv_mass, max_depth
            )
            da = da_update(da, aprob, target=target_accept)
            wf = welford_update(wf, q) if adapt_mass else wf
            return (q, lp, g, da, wf), None

        carry, _ = jax.lax.scan(body, carry, seg_keys)
        return carry

    def sample_seg(carry, seg_keys, eps_f, inv_mass_f):
        def body(c, k):
            q, lp, g = c
            q, lp, g, aprob, div, depth = nuts_kernel(
                vg, q, lp, g, k, eps_f, inv_mass_f, max_depth
            )
            return (q, lp, g), (q, lp, aprob, div, depth)

        return jax.lax.scan(body, carry, seg_keys)

    warm_seg_j = jax.jit(jax.vmap(warm_seg))
    sample_seg_j = jax.jit(jax.vmap(sample_seg))

    def _sync(tree):
        return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), tree)

    lp0, g0 = jax.vmap(vg)(x0s)
    da0 = jax.vmap(lambda _: da_init(jnp.asarray(initial_step_size, dtype)))(x0s)
    wf0 = jax.vmap(lambda _: welford_init(dim, dtype))(x0s)
    carry = (x0s, lp0, g0, da0, wf0)
    for s in range(0, num_warmup, segment_size):
        e = min(s + segment_size, num_warmup)
        carry = _sync(warm_seg_j(carry, keys[:, s:e]))

    q, lp, g, da, wf = carry
    eps_f = jnp.exp(da.log_eps_avg)
    inv_mass_f = (
        jax.vmap(welford_variance)(wf)
        if adapt_mass
        else jnp.ones((chains, dim), dtype)
    )
    carry = (q, lp, g)
    chunks = []
    for s in range(num_warmup, num_warmup + num_samples, segment_size):
        e = min(s + segment_size, num_warmup + num_samples)
        carry, out = _sync(sample_seg_j(carry, keys[:, s:e], eps_f, inv_mass_f))
        chunks.append(out)
    qs, lps, aprobs, divs, depths = (
        jnp.concatenate([c[i] for c in chunks], axis=1) for i in range(5)
    )
    return NUTSResult(
        samples=qs,
        log_probs=lps,
        accept_prob=jnp.mean(aprobs, axis=1),
        step_size=eps_f,
        inv_mass=inv_mass_f,
        num_divergent=jnp.sum(divs, axis=1),
        mean_tree_depth=jnp.mean(depths.astype(dtype), axis=1),
    )


def nuts(
    key,
    logprob_fn: Callable,
    x0,
    *,
    num_samples: int = 1000,
    num_warmup: int = 500,
    max_depth: int = 8,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
    adapt_mass: bool = True,
) -> NUTSResult:
    """Adaptive NUTS: warmup adapts step size + diagonal mass, then samples.
    vmap over (key, x0) for chains."""
    x0 = jnp.asarray(x0)
    dim = x0.shape[-1]
    dtype = x0.dtype
    vg = jax.value_and_grad(logprob_fn)
    lp0, g0 = vg(x0)

    def warm_body(carry, key):
        q, lp, g, da, wf = carry
        eps = jnp.exp(da.log_eps)
        inv_mass = welford_variance(wf) if adapt_mass else jnp.ones((dim,), dtype)
        q, lp, g, aprob, div, depth = nuts_kernel(vg, q, lp, g, key, eps, inv_mass, max_depth)
        da = da_update(da, aprob, target=target_accept)
        wf = welford_update(wf, q) if adapt_mass else wf
        return (q, lp, g, da, wf), None

    keys = jax.random.split(key, num_warmup + num_samples)
    da0 = da_init(jnp.asarray(initial_step_size, dtype))
    wf0 = welford_init(dim, dtype)
    (q, lp, g, da, wf), _ = jax.lax.scan(warm_body, (x0, lp0, g0, da0, wf0), keys[:num_warmup])

    eps_f = jnp.exp(da.log_eps_avg)
    inv_mass_f = welford_variance(wf) if adapt_mass else jnp.ones((dim,), dtype)

    def sample_body(carry, key):
        q, lp, g = carry
        q, lp, g, aprob, div, depth = nuts_kernel(vg, q, lp, g, key, eps_f, inv_mass_f, max_depth)
        return (q, lp, g), (q, lp, aprob, div, depth)

    (_, _, _), (qs, lps, aprobs, divs, depths) = jax.lax.scan(
        sample_body, (q, lp, g), keys[num_warmup:]
    )
    return NUTSResult(
        samples=qs,
        log_probs=lps,
        accept_prob=jnp.mean(aprobs),
        step_size=eps_f,
        inv_mass=inv_mass_f,
        num_divergent=jnp.sum(divs),
        mean_tree_depth=jnp.mean(depths.astype(dtype)),
    )
