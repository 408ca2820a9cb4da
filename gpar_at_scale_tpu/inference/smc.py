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


class SMCHostResult(NamedTuple):
    particles: "object"  # (P, dim) numpy posterior particles
    log_evidence: float
    num_stages: int
    final_beta: float
    acceptance: float
    num_lik_evals: int


def smc_host(
    seed: int,
    log_prior_batch: Callable,
    log_lik_batch: Callable,
    x0,
    *,
    ess_threshold: float = 0.5,
    num_mutations: int = 3,
    max_stages: int = 20,
    rw_scale: float = 0.5,
    verbose: bool = False,
) -> SMCHostResult:
    """Host-driven adaptive tempered SMC for likelihoods too large to fuse
    into one device program.

    Same algorithm as ``smc`` (adaptive beta by ESS bisection, systematic
    resampling, random-walk mutations), but the stage loop, resampling, and
    accept/reject bookkeeping run in numpy on the host; the expensive part —
    the likelihood of a particle batch — goes through the caller-supplied
    ``log_lik_batch(particles) -> (P,)``, which the caller jits (and chunks)
    however the runtime requires.  Motivation: a jitted ``smc`` over 64
    particles of a 1M-step Kalman likelihood is a single XLA program with
    ~8 GB of live scan state that this sandbox's remote compile service
    never finishes compiling; host-driven staging needs only the vmapped
    likelihood program itself (``benchmarks/million_smc.py --host``).

    Bookkeeping is O(P·dim) per stage on the host — noise next to one
    1M-step filter pass — so nothing of value is lost off-device.
    """
    import sys
    import time as _time

    import numpy as np

    t_start = _time.time()

    def _log(msg):
        if verbose:
            print(f"[smc_host +{_time.time()-t_start:7.1f}s] {msg}",
                  file=sys.stderr, flush=True)

    def logsumexp(a):
        a = np.asarray(a, np.float64)
        m = a.max()
        return float(m + np.log(np.exp(a - m).sum()))

    rng = np.random.default_rng(seed)
    x = np.array(x0, np.float64, copy=True)
    P, dim = x.shape
    _log(f"initial likelihood batch: {P} evals...")
    loglik = np.asarray(log_lik_batch(x), np.float64)
    n_evals = P
    _log(f"initial batch done ({(_time.time()-t_start)/P:.2f} s/eval incl. compile)")
    beta, logZ, stage, acc = 0.0, 0.0, 0, 0.0

    def ess_of(lw):
        lw = lw - logsumexp(lw)
        return float(np.exp(-logsumexp(2.0 * lw)))

    while beta < 1.0 and stage < max_stages:
        target = ess_threshold * P
        if ess_of((1.0 - beta) * loglik) >= target:
            beta_new = 1.0
        else:
            lo, hi = beta, 1.0
            for _ in range(40):
                mid = 0.5 * (lo + hi)
                if ess_of((mid - beta) * loglik) >= target:
                    lo = mid
                else:
                    hi = mid
            beta_new = lo
        inc = (beta_new - beta) * loglik
        logZ += logsumexp(inc) - np.log(P)

        # systematic resample on the incremental weights
        w = np.exp(inc - logsumexp(inc))
        cum = np.cumsum(w)
        pts = (rng.uniform() + np.arange(P)) / P
        idx = np.searchsorted(cum, pts)
        x, loglik = x[idx], loglik[idx]

        std = x.std(axis=0) + 1e-6
        lp = np.asarray(log_prior_batch(x), np.float64) + beta_new * loglik
        accs = []
        for _ in range(num_mutations):
            prop = x + rw_scale * std[None, :] * rng.normal(size=x.shape)
            ll_prop = np.asarray(log_lik_batch(prop), np.float64)
            n_evals += P
            lp_prop = np.asarray(log_prior_batch(prop), np.float64) + beta_new * ll_prop
            a = np.log(rng.uniform(size=P)) < lp_prop - lp
            x[a], loglik[a], lp[a] = prop[a], ll_prop[a], lp_prop[a]
            accs.append(float(a.mean()))
        acc = float(np.mean(accs))
        beta = beta_new
        stage += 1
        _log(
            f"stage {stage}: beta={beta:.4f}  logZ={logZ:.2f}  "
            f"accept={acc:.2f}  evals={n_evals}"
        )

    return SMCHostResult(
        particles=x,
        log_evidence=float(logZ),
        num_stages=stage,
        final_beta=float(beta),
        acceptance=acc,
        num_lik_evals=n_evals,
    )
