"""Fully-Bayesian GPAR conditionals: NUTS posteriors + predictive mixtures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.data.toy import generate_small_dataset
from gpar_at_scale_tpu.models.bayes import (
    make_conditional_logpost,
    make_temporal_logpost,
    predictive_mixture_scaled,
    sample_conditional_posterior,
)


def test_temporal_posterior_concentrates(key, rng):
    t = np.sort(rng.uniform(0, 5, 60))
    y = np.sin(2 * t) + 0.1 * rng.normal(size=60)
    logpost = make_temporal_logpost(t, y)
    res = sample_conditional_posterior(
        key, logpost, num_chains=2, num_samples=300, num_warmup=200, dim=3, max_depth=6
    )
    assert int(res.num_divergent) == 0
    noise = np.exp(np.asarray(res.samples[..., 2]).ravel()) + 1e-3
    med = np.median(noise)
    assert 0.05 < med < 0.2, med


def test_dtc_posterior_and_predictive_mixture(key):
    ds = generate_small_dataset(seed=0)
    V = ds.y_obs[:, :1]
    Z = V[::3]
    logpost = make_conditional_logpost(ds.x, V, ds.y_obs[:, 1], likelihood="dtc", Z=Z)
    res = sample_conditional_posterior(
        key, logpost, num_chains=2, num_samples=200, num_warmup=200, max_depth=6
    )
    assert float(res.accept_prob) > 0.5
    noise = np.exp(np.asarray(res.samples[..., 4]).ravel()) + 1e-3
    assert 0.01 < np.median(noise) < 0.3

    mean, var = predictive_mixture_scaled(
        key, res.samples, ds.x, V, ds.y_obs[:, 1], Z, ds.x, V, num_theta=8
    )
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - ds.y_obs[:, 1]) ** 2)))
    assert rmse < 0.35, rmse
    assert np.all(np.asarray(var) > 0)


def test_eeg_bounded_reparam_divergence_rate(key):
    """The production EEG sampling path (bounded tanh reparam + chunked
    NUTS, f32 likelihood — benchmarks/ess.py) keeps divergences < 2%.

    r2 measured 24.5% divergent transitions sampling the raw log-params:
    warmup overshoots into the f32 Cholesky cliff (cond(K) > 1/eps_f32 at
    extreme prior tails).  ``bounded_reparam`` makes that region unreachable;
    this asserts the fix on the same posterior family (VERDICT r2 item 3)."""
    from gpar_at_scale_tpu.data.eeg import TRAIN_POINTS, load_eeg
    from gpar_at_scale_tpu.inference.nuts import nuts_chunked
    from gpar_at_scale_tpu.models.bayes import bounded_reparam

    ds = load_eeg(None, seed=0)
    n_tr = TRAIN_POINTS
    obs = [ds.channels.index(c) for c in ("F3", "F4", "F5", "F6")]
    X = np.stack([ds.Y[:n_tr, i] for i in obs], axis=1)
    y = ds.Y[:n_tr, ds.channels.index("FZ")]
    logpost = make_conditional_logpost(
        ds.t[:n_tr], X, y, likelihood="dtc", Z=X[:: n_tr // 16], dtype=jnp.float32
    )
    logpost_u, constrain = bounded_reparam(logpost, bound=3.0)

    chains, samples = 2, 150
    x0s = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (chains, 5), jnp.float32)
    res = nuts_chunked(
        key, logpost_u, x0s, num_samples=samples, num_warmup=100,
        segment_size=50, max_depth=6,
    )
    n_div = int(np.sum(np.asarray(res.num_divergent)))
    assert n_div / (chains * samples) < 0.02, n_div
    # constrained draws stay strictly inside the bound (finite likelihood)
    p = np.asarray(jax.vmap(jax.vmap(constrain))(res.samples))
    assert np.all(np.abs(p) < 3.0)
    assert np.all(np.isfinite(p))


def test_exact_likelihood_logpost_finite(key):
    ds = generate_small_dataset(seed=0)
    logpost = make_conditional_logpost(
        ds.x, ds.y_obs[:, :1], ds.y_obs[:, 1], likelihood="exact"
    )
    v = logpost(jnp.zeros(5))
    g = jax.grad(logpost)(jnp.zeros(5))
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_nuts_and_smc_posteriors_agree_blocked(key, rng):
    """The benchmarks/nuts_vs_smc.py cross-check at CPU scale: NUTS (chunked,
    closed-form-VJP gradients through the blocked engine) and host-driven SMC
    sample the SAME temporal-GP hyperparameter posterior; their moments must
    agree within MC error (BASELINE.md; r3 verdict item 7)."""
    from gpar_at_scale_tpu.inference.diagnostics import means_agree_within_mc_error
    from gpar_at_scale_tpu.inference.nuts import nuts_chunked
    from gpar_at_scale_tpu.inference.smc import smc_host
    from gpar_at_scale_tpu.kernels import Matern52
    from gpar_at_scale_tpu.ssm.blocked_grad import blocked_loglik
    from gpar_at_scale_tpu.ssm.markov import lgssm_of

    n = 400
    t_np = np.cumsum(rng.uniform(0.5, 1.5, n)) / 100.0
    f = 1.2 * np.sin(2 * np.pi * t_np / 7.0) * np.cos(2 * np.pi * t_np / 1.3)
    y_np = f + 0.3 * rng.normal(size=n)
    t = jnp.asarray(t_np, jnp.float32)
    y = jnp.asarray(y_np, jnp.float32)

    def loglik(p):
        l, sf, sn = (jnp.exp(p[i]) + 1e-3 for i in range(3))
        k = Matern52(lengthscale=l, variance=sf**2)
        return blocked_loglik(lgssm_of(k, t, sn**2, jnp.float32), y, num_blocks=32)

    def logpost(p):
        return -0.5 * jnp.sum(p**2) / 4.0 + loglik(p)

    res = nuts_chunked(
        key, logpost, 0.3 * jax.random.normal(jax.random.PRNGKey(1), (2, 3)),
        num_samples=150, num_warmup=100, segment_size=50, max_depth=6,
    )
    nuts_chains = np.exp(np.asarray(res.samples)) + 1e-3

    jll = jax.jit(loglik)
    res_s = smc_host(
        0,
        lambda xs: -0.5 * np.sum(np.asarray(xs) ** 2, axis=1) / 4.0,
        lambda xs: np.array([float(np.asarray(jll(jnp.asarray(x, jnp.float32)))) for x in xs]),
        np.asarray(jax.random.normal(jax.random.PRNGKey(2), (48, 3))) * 0.5,
        num_mutations=3, max_stages=25,
    )
    cloud = np.exp(np.asarray(res_s.particles)) + 1e-3
    assert res_s.final_beta >= 0.999
    assert means_agree_within_mc_error(nuts_chains, cloud[None])
