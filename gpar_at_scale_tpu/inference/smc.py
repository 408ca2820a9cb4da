"""Sequential Monte Carlo sampler over hyperparameters.

Adaptive-tempering SMC (prior -> posterior annealing) with systematic
resampling and random-walk Metropolis mutations whose proposal scale comes
from the current particle cloud — the north-star "SMC with resampling"
capability (BASELINE.json); the reference has no sampler at all.

Fixed-shape for TPU: the tempering loop is a bounded ``lax.while_loop``, the
next inverse temperature is found by bisection on the ESS criterion (also a
fixed-iteration loop), and particles vmap on-chip / shard over the mesh
"chain" axis.  Returns a log-evidence estimate as a byproduct.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class SMCResult(NamedTuple):
    particles: jnp.ndarray  # (P, dim) final (posterior) particles
    log_evidence: jnp.ndarray  # log Z estimate
    num_stages: jnp.ndarray
    final_beta: jnp.ndarray
    acceptance: jnp.ndarray  # mean mutation acceptance at the final stage


def _systematic_resample(key, log_weights, n):
    w = jax.nn.softmax(log_weights)
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), dtype=w.dtype)
    points = (u0 + jnp.arange(n, dtype=w.dtype)) / n
    return jnp.searchsorted(cum, points)


def _ess(log_w):
    lw = log_w - jax.scipy.special.logsumexp(log_w)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw))


def smc(
    key,
    log_prior_fn: Callable,
    log_lik_fn: Callable,
    x0: jnp.ndarray,
    *,
    ess_threshold: float = 0.5,
    num_mutations: int = 5,
    max_stages: int = 50,
    rw_scale: float = 0.5,
) -> SMCResult:
    """Adaptive tempered SMC from the prior sample ``x0`` (P, dim).

    At stage s with inverse temperature beta_s, incremental weights are
    (beta_{s+1} - beta_s) * log_lik; beta_{s+1} is the largest temperature
    keeping ESS >= ess_threshold * P (bisection).  After reweighting:
    systematic resample + ``num_mutations`` RWM steps targeting
    prior * lik^beta with proposal std = rw_scale * particle std.
    """
    P, dim = x0.shape
    dtype = x0.dtype

    log_lik_v = jax.vmap(log_lik_fn)
    log_prior_v = jax.vmap(log_prior_fn)

    def next_beta(beta, loglik):
        """Largest b in (beta, 1] with ESS(incremental) >= threshold."""

        def ess_at(b):
            return _ess((b - beta) * loglik)

        target = ess_threshold * P

        def bisect_body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            ok = ess_at(mid) >= target
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

        full = ess_at(jnp.asarray(1.0, dtype)) >= target
        lo, hi = jax.lax.fori_loop(
            0, 30, bisect_body, (beta, jnp.asarray(1.0, dtype))
        )
        return jnp.where(full, jnp.asarray(1.0, dtype), lo)

    def mutate(key, particles, beta):
        """num_mutations RWM steps targeting prior * lik^beta."""
        std = jnp.std(particles, axis=0) + 1e-6

        def target_lp(x):
            return log_prior_fn(x) + beta * log_lik_fn(x)

        target_v = jax.vmap(target_lp)

        def step(carry, key):
            xs, lps = carry
            k1, k2 = jax.random.split(key)
            prop = xs + rw_scale * std[None, :] * jax.random.normal(k1, xs.shape, dtype)
            lps_prop = target_v(prop)
            accept = (
                jnp.log(jax.random.uniform(k2, (P,), dtype=dtype)) < lps_prop - lps
            )
            xs = jnp.where(accept[:, None], prop, xs)
            lps = jnp.where(accept, lps_prop, lps)
            return (xs, lps), jnp.mean(accept.astype(dtype))

        lps0 = target_v(particles)
        (xs, _), acc = jax.lax.scan(step, (particles, lps0), jax.random.split(key, num_mutations))
        return xs, jnp.mean(acc)

    def cond(carry):
        _, _, beta, _, stage, _, _ = carry
        return jnp.logical_and(beta < 1.0, stage < max_stages)

    def body(carry):
        key, particles, beta, logZ, stage, _, _ = carry
        key, k_res, k_mut = jax.random.split(key, 3)
        loglik = log_lik_v(particles)
        beta_new = next_beta(beta, loglik)
        inc = (beta_new - beta) * loglik
        logZ = logZ + jax.scipy.special.logsumexp(inc) - jnp.log(P * 1.0)
        idx = _systematic_resample(k_res, inc, P)
        particles = particles[idx]
        particles, acc = mutate(k_mut, particles, beta_new)
        return key, particles, beta_new, logZ, stage + 1, acc, beta_new

    init = (
        key,
        x0,
        jnp.asarray(0.0, dtype),
        jnp.asarray(0.0, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0.0, dtype),
        jnp.asarray(0.0, dtype),
    )
    _, particles, beta, logZ, stages, acc, _ = jax.lax.while_loop(cond, body, init)
    return SMCResult(
        particles=particles,
        log_evidence=logZ,
        num_stages=stages,
        final_beta=beta,
        acceptance=acc,
    )
