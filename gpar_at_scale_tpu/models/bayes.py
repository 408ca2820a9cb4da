"""Fully-Bayesian GPAR: samplers over kernel hyperparameters.

North-star capability: NUTS/HMC/SMC over the exact, temporal, and DTC
log-densities (BASELINE.json), marginalizing the predictive over the
hyperparameter posterior instead of the reference's type-II point estimate.

The log-posterior of one conditional =
    log p(y | theta)  [exact NLML | Kalman lml | DTC bound]
  + log p(theta)      [N(0, prior_scale^2) on the log-params]

Chains vmap on one chip and shard over the mesh "chain" axis.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.gp import exact as exact_gp
from gpar_at_scale_tpu.gp.dtc import compute_q_u, dtc_objective, predict_scaled
from gpar_at_scale_tpu.inference.nuts import nuts
from gpar_at_scale_tpu.kernels import Matern52, gpar_kernel, time_kernel_only
from gpar_at_scale_tpu.ssm.kalman import logpdf as ssm_logpdf
from gpar_at_scale_tpu.ssm.markov import lgssm_of
from gpar_at_scale_tpu.utils.params import unpack_gp, unpack_gpar


def make_conditional_logpost(
    t,
    X_prev,
    y,
    *,
    likelihood: str = "dtc",  # 'exact' | 'dtc'
    Z=None,
    time_family=Matern52,
    out_family=Matern52,
    prior_scale: float = 2.0,
    dtype=jnp.float64,
    uu_ridge="auto",
) -> Callable:
    """Log-posterior over the (5,) log-params of one conditional GP.

    uu_ridge: forwarded to ``dtc_objective`` — pass None for the un-ridged
    bound (exact Z->V equality with the additive-kernel likelihood, the
    north-star posterior-parity configuration)."""
    t = jnp.asarray(t, dtype)
    order = jnp.argsort(t)
    t_s = t[order]
    X_s = jnp.asarray(X_prev, dtype)[order]
    y_s = jnp.asarray(y, dtype)[order]
    input_dim = 1 + X_s.shape[1]
    if likelihood == "dtc" and Z is None:
        raise ValueError("dtc likelihood requires inducing inputs Z")
    if Z is not None:
        Z = jnp.asarray(Z, dtype)

    def logpost(params):
        tl, ts, ol, osig, ns = unpack_gpar(params)
        prior = -0.5 * jnp.sum(params**2) / prior_scale**2
        if likelihood == "exact":
            k = gpar_kernel(time_family, out_family, input_dim, tl, ts, ol, osig)
            Xfull = jnp.concatenate([t_s[:, None], X_s], axis=1)
            return exact_gp.log_marginal_likelihood(k, Xfull, y_s, ns**2) + prior
        time_k = time_kernel_only(time_family, tl, ts)
        out_k = out_family(lengthscale=ol, variance=osig**2)
        lgssm = lgssm_of(time_k, t_s, ns**2, dtype)
        ridge = ns**2 if uu_ridge == "auto" else uu_ridge
        return (
            dtc_objective(
                out_k, lgssm, X_s, Z, y_s, uu_ridge=ridge,
                time_kernel=time_k, t=t_s,  # size-dispatched dense whitening
            )
            + prior
        )

    return logpost


def make_temporal_logpost(
    t, y, *, time_family=Matern52, prior_scale: float = 2.0, dtype=jnp.float64
) -> Callable:
    """Log-posterior over the (3,) log-params of the 1-D temporal GP (O(N))."""
    t = jnp.asarray(t, dtype)
    order = jnp.argsort(t)
    t_s, y_s = t[order], jnp.asarray(y, dtype)[order]

    def logpost(params):
        l, sf, sn = unpack_gp(params)
        k = time_kernel_only(time_family, l, sf)
        prior = -0.5 * jnp.sum(params**2) / prior_scale**2
        return ssm_logpdf(lgssm_of(k, t_s, sn**2, dtype), y_s) + prior

    return logpost


def bounded_reparam(logpost: Callable, bound: float = 3.0):
    """Smooth bounded reparameterization of a log-posterior over log-params.

    Sample in unconstrained u-space with  p = bound * tanh(u / bound)  and
    the exact log-Jacobian  sum_i log sech^2(u_i/bound); draws constrained
    back to p-space are EXACT samples from the posterior restricted to
    (-bound, bound)^d (renormalized).  Why: the f32 DTC/exact likelihoods
    have a Cholesky cliff at extreme log-hyperparameters (long lengthscale
    + huge signal variance + tiny noise -> cond(K) > 1/eps_f32 -> NaN), and
    NUTS warmup trajectories that overshoot into it count as divergences —
    24.5% of transitions in the r2 EEG benchmark.  Bounding the *effective*
    params keeps cond(K) in f32 range everywhere the integrator can reach,
    so divergences measure real energy error only.  bound=3.0 keeps
    exp(p) in [0.05, 20] (vs the N(0, 2^2) prior's 3-sigma range ~ e^6):
    worst-case cond ~ M * e^6 / (e^-3+1e-3)^2 ~ 5e6 < 1/eps_f32.

    Returns (logpost_u, constrain): the u-space log-density and the map
    u -> p for post-processing samples.
    """
    b = float(bound)

    def constrain(u):
        return b * jnp.tanh(u / b)

    def logpost_u(u):
        x = u / b
        # log sech^2(x) = 2*(log 2 - x - softplus(-2x)), stable for |x| large
        log_jac = jnp.sum(2.0 * (jnp.log(2.0) - x - jax.nn.softplus(-2.0 * x)))
        return logpost(constrain(u)) + log_jac

    return logpost_u, constrain


class BayesConditionalResult(NamedTuple):
    samples: jnp.ndarray  # (C, S, 5) posterior log-param draws
    accept_prob: jnp.ndarray
    num_divergent: jnp.ndarray


def sample_conditional_posterior(
    key,
    logpost: Callable,
    *,
    num_chains: int = 4,
    num_samples: int = 500,
    num_warmup: int = 300,
    max_depth: int = 7,
    init_scale: float = 0.3,
    dim: int = 5,
) -> BayesConditionalResult:
    """Run vmapped NUTS chains over a conditional's hyperparameters."""
    k_init, k_run = jax.random.split(key)
    x0s = init_scale * jax.random.normal(k_init, (num_chains, dim))
    keys = jax.random.split(k_run, num_chains)
    res = jax.vmap(
        lambda k, x: nuts(
            k,
            logpost,
            x,
            num_samples=num_samples,
            num_warmup=num_warmup,
            max_depth=max_depth,
        )
    )(keys, x0s)
    return BayesConditionalResult(
        samples=res.samples,
        accept_prob=jnp.mean(res.accept_prob),
        num_divergent=jnp.sum(res.num_divergent),
    )


def predictive_mixture_scaled(
    key,
    samples,
    t,
    X_prev,
    y,
    Z,
    t_star,
    X_star,
    *,
    time_family=Matern52,
    out_family=Matern52,
    num_theta: int = 16,
    dtype=jnp.float64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior-predictive mixture over hyperparameter draws (scaled path):
    mean = E_theta[mu(theta)], var = E[var] + Var[mu].  Uses ``num_theta``
    thinned draws; each draw's predictive is the analytic one."""
    flat = samples.reshape(-1, samples.shape[-1])
    idx = jnp.linspace(0, flat.shape[0] - 1, num_theta).astype(jnp.int32)
    thetas = flat[idx]

    t = jnp.asarray(t, dtype)
    order = jnp.argsort(t)
    t_s = t[order]
    X_s = jnp.asarray(X_prev, dtype)[order]
    y_s = jnp.asarray(y, dtype)[order]
    Z = jnp.asarray(Z, dtype)

    def one(theta):
        tl, ts, ol, osig, ns = unpack_gpar(theta)
        time_k = time_kernel_only(time_family, tl, ts)
        out_k = out_family(lengthscale=ol, variance=osig**2)
        nv = ns**2
        lgssm = lgssm_of(time_k, t_s, nv, dtype)
        qu = compute_q_u(out_k, lgssm, X_s, Z, y_s, uu_ridge=nv)
        pred = predict_scaled(
            out_k, time_k, qu, X_s, t_s, y_s,
            jnp.asarray(t_star, dtype), jnp.asarray(X_star, dtype), nv, dtype=dtype,
        )
        return pred.mean, pred.var

    mus, vars_ = jax.lax.map(one, thetas)
    mean = jnp.mean(mus, axis=0)
    var = jnp.mean(vars_, axis=0) + jnp.var(mus, axis=0)
    return mean, var
