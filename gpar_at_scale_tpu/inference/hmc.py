"""Hamiltonian Monte Carlo with dual-averaging step-size and diagonal mass
adaptation — fully jit-compiled, fixed-shape, vmappable across chains.

North-star capability (BASELINE.json): samplers over kernel hyperparameters.
The reference has no sampler at all (single Nelder-Mead trajectory,
SURVEY.md §2c "chain parallelism: absent"); chains here vmap on one chip and
shard over the mesh "chain" axis.

Design rules for TPU: no data-dependent Python control flow — the sampling
loop is ``lax.scan`` over steps, the integrator ``lax.fori_loop``, warmup
adaptation a pure function of the carried state.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class DAState(NamedTuple):
    """Nesterov dual-averaging state for log step size (Hoffman & Gelman
    2014, Algorithm 5)."""

    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    h_avg: jnp.ndarray
    mu: jnp.ndarray
    step: jnp.ndarray


def da_init(eps0) -> DAState:
    log_eps = jnp.log(eps0)
    return DAState(
        log_eps=log_eps,
        log_eps_avg=jnp.zeros_like(log_eps),
        h_avg=jnp.zeros_like(log_eps),
        mu=jnp.log(10.0) + log_eps,
        step=jnp.zeros_like(log_eps, dtype=jnp.int32) if jnp.ndim(log_eps) else jnp.asarray(0),
    )


def da_update(state: DAState, accept_prob, target=0.8, gamma=0.05, t0=10.0, kappa=0.75) -> DAState:
    step = state.step + 1
    eta_h = 1.0 / (step + t0)
    h_avg = (1.0 - eta_h) * state.h_avg + eta_h * (target - accept_prob)
    log_eps = state.mu - jnp.sqrt(step.astype(h_avg.dtype)) / gamma * h_avg
    eta = step.astype(h_avg.dtype) ** (-kappa)
    log_eps_avg = eta * log_eps + (1.0 - eta) * state.log_eps_avg
    return DAState(log_eps=log_eps, log_eps_avg=log_eps_avg, h_avg=h_avg, mu=state.mu, step=step)


class WelfordState(NamedTuple):
    """Streaming mean/variance for diagonal mass-matrix adaptation."""

    mean: jnp.ndarray
    m2: jnp.ndarray
    count: jnp.ndarray


def welford_init(dim, dtype=jnp.float64) -> WelfordState:
    return WelfordState(
        mean=jnp.zeros((dim,), dtype), m2=jnp.zeros((dim,), dtype), count=jnp.asarray(0.0, dtype)
    )


def welford_update(state: WelfordState, x) -> WelfordState:
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean=mean, m2=m2, count=count)


def welford_variance(state: WelfordState, regularize: bool = True):
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularize:  # Stan-style shrink toward 1e-3
        n = state.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


def leapfrog(logprob_grad_fn: Callable, q, p, eps, inv_mass, num_steps):
    """num_steps leapfrog steps with diagonal mass; returns (q, p, logprob, grad)."""

    def body(_, carry):
        q, p, lp, g = carry
        p_half = p + 0.5 * eps * g
        q_new = q + eps * inv_mass * p_half
        lp_new, g_new = logprob_grad_fn(q_new)
        p_new = p_half + 0.5 * eps * g_new
        return q_new, p_new, lp_new, g_new

    lp0, g0 = logprob_grad_fn(q)
    return jax.lax.fori_loop(0, num_steps, body, (q, p, lp0, g0))


def _kinetic(p, inv_mass):
    return 0.5 * jnp.sum(p * p * inv_mass)


class HMCResult(NamedTuple):
    samples: jnp.ndarray  # (num_samples, dim)
    log_probs: jnp.ndarray  # (num_samples,)
    accept_prob: jnp.ndarray  # mean acceptance over the kept samples
    step_size: jnp.ndarray  # adapted step size
    inv_mass: jnp.ndarray  # adapted diagonal inverse mass
    num_divergent: jnp.ndarray


def hmc(
    key,
    logprob_fn: Callable,
    x0,
    *,
    num_samples: int = 1000,
    num_warmup: int = 500,
    num_leapfrog: int = 16,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
    adapt_mass: bool = True,
) -> HMCResult:
    """Adaptive HMC.  Warmup adapts step size (dual averaging) and diagonal
    mass (Welford); sampling runs with both frozen.  One jit-compiled scan.

    vmap over ``key``/``x0`` for multiple chains; shard the chain axis over
    the mesh for multi-device (see ``gpar_at_scale_tpu/parallel``).
    """
    x0 = jnp.asarray(x0)
    dim = x0.shape[-1]
    dtype = x0.dtype
    vg = jax.value_and_grad(logprob_fn)

    def lg(q):
        v, g = vg(q)
        return v, g

    def one_step(q, lp, g, key, eps, inv_mass):
        k_mom, k_acc = jax.random.split(key)
        p = jax.random.normal(k_mom, (dim,), dtype) / jnp.sqrt(inv_mass)
        q_new, p_new, lp_new, g_new = leapfrog(lg, q, p, eps, inv_mass, num_leapfrog)
        h0 = -lp + _kinetic(p, inv_mass)
        h1 = -lp_new + _kinetic(p_new, inv_mass)
        delta = h0 - h1
        divergent = jnp.logical_or(jnp.isnan(delta), delta < -1000.0)
        accept_prob = jnp.where(divergent, 0.0, jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0))))
        accept = jax.random.uniform(k_acc, dtype=dtype) < accept_prob
        q = jnp.where(accept, q_new, q)
        lp = jnp.where(accept, lp_new, lp)
        g = jnp.where(accept[..., None] if jnp.ndim(accept) else accept, g_new, g)
        return q, lp, g, accept_prob, divergent

    lp0, g0 = lg(x0)

    # ---- warmup: adapt eps + mass --------------------------------------
    def warmup_body(carry, key):
        q, lp, g, da, wf = carry
        eps = jnp.exp(da.log_eps)
        inv_mass = welford_variance(wf) if adapt_mass else jnp.ones((dim,), dtype)
        q, lp, g, aprob, _ = one_step(q, lp, g, key, eps, inv_mass)
        da = da_update(da, aprob, target=target_accept)
        wf = welford_update(wf, q) if adapt_mass else wf
        return (q, lp, g, da, wf), None

    keys_w = jax.random.split(key, num_warmup + num_samples + 1)
    da0 = da_init(jnp.asarray(initial_step_size, dtype))
    wf0 = welford_init(dim, dtype)
    (q, lp, g, da, wf), _ = jax.lax.scan(
        warmup_body, (x0, lp0, g0, da0, wf0), keys_w[:num_warmup]
    )

    eps_final = jnp.exp(da.log_eps_avg)
    inv_mass_final = welford_variance(wf) if adapt_mass else jnp.ones((dim,), dtype)

    # ---- sampling ------------------------------------------------------
    def sample_body(carry, key):
        q, lp, g = carry
        q, lp, g, aprob, div = one_step(q, lp, g, key, eps_final, inv_mass_final)
        return (q, lp, g), (q, lp, aprob, div)

    (_, _, _), (qs, lps, aprobs, divs) = jax.lax.scan(
        sample_body, (q, lp, g), keys_w[num_warmup : num_warmup + num_samples]
    )
    return HMCResult(
        samples=qs,
        log_probs=lps,
        accept_prob=jnp.mean(aprobs),
        step_size=eps_final,
        inv_mass=inv_mass_final,
        num_divergent=jnp.sum(divs),
    )


def effective_sample_size(samples: jnp.ndarray) -> jnp.ndarray:
    """Per-dimension ESS via the initial-monotone-positive-sequence estimator
    (Geyer). samples: (N, dim) -> (dim,). Used for the ESS/s metric
    (BASELINE.md)."""
    x = samples - samples.mean(axis=0, keepdims=True)
    n = x.shape[0]
    # autocovariance by FFT (n is static under jit)
    nfft = 1 << (2 * n - 1).bit_length()
    f = jnp.fft.rfft(x, n=nfft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[:n].real / n
    acorr = acov / acov[:1]
    # pairwise sums Gamma_k = rho_{2k} + rho_{2k+1}
    m = n // 2
    gamma = acorr[0 : 2 * m : 2] + acorr[1 : 2 * m : 2]
    # initial positive sequence, made monotone nonincreasing
    positive = gamma > 0
    first_nonpos = jnp.argmin(positive.astype(jnp.int32), axis=0)
    first_nonpos = jnp.where(jnp.all(positive, axis=0), m, first_nonpos)
    idx = jnp.arange(m)[:, None]
    gamma = jnp.where(idx < first_nonpos[None, :], gamma, 0.0)
    gamma = jax.lax.associative_scan(jnp.minimum, gamma, axis=0)  # enforce monotone
    tau = -1.0 + 2.0 * jnp.sum(gamma, axis=0)
    return n / jnp.maximum(tau, 1.0)
