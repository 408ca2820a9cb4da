"""Sampler correctness on analytically-known targets + a GP-hyperparameter
posterior smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.inference.hmc import effective_sample_size, hmc
from gpar_at_scale_tpu.inference.nuts import nuts
from gpar_at_scale_tpu.inference.smc import smc


def std_normal_lp(x):
    return -0.5 * jnp.sum(x * x)


def corr_gauss_lp(x):
    # 2-D correlated Gaussian, rho = 0.9
    prec = jnp.array([[1.0, -0.9], [-0.9, 1.0]]) / (1 - 0.81)
    return -0.5 * x @ prec @ x


def test_hmc_std_normal(key):
    res = hmc(
        key,
        std_normal_lp,
        jnp.ones(3),
        num_samples=2000,
        num_warmup=500,
        num_leapfrog=8,
    )
    s = np.asarray(res.samples)
    assert res.num_divergent == 0
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(s.var(0), 1.0, atol=0.2)
    assert 0.6 < float(res.accept_prob) <= 1.0


def test_nuts_std_normal(key):
    res = nuts(
        key,
        std_normal_lp,
        jnp.ones(3),
        num_samples=2000,
        num_warmup=500,
        max_depth=6,
    )
    s = np.asarray(res.samples)
    assert res.num_divergent == 0
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(s.var(0), 1.0, atol=0.2)
    assert float(res.mean_tree_depth) >= 1.0


def test_nuts_correlated_gaussian(key):
    res = nuts(
        key,
        corr_gauss_lp,
        jnp.zeros(2),
        num_samples=3000,
        num_warmup=800,
        max_depth=8,
    )
    s = np.asarray(res.samples)
    cov = np.cov(s.T)
    np.testing.assert_allclose(cov, [[1.0, 0.9], [0.9, 1.0]], atol=0.25)


def test_nuts_vmapped_chains(key):
    keys = jax.random.split(key, 4)
    x0s = jnp.ones((4, 2))
    run = jax.vmap(
        lambda k, x: nuts(k, std_normal_lp, x, num_samples=500, num_warmup=300, max_depth=5)
    )
    res = run(keys, x0s)
    assert res.samples.shape == (4, 500, 2)
    pooled = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(pooled.var(0), 1.0, atol=0.25)


def test_ess_iid_close_to_n(key):
    x = jax.random.normal(key, (4000, 2))
    ess = np.asarray(effective_sample_size(x))
    assert np.all(ess > 1500), ess


def test_smc_gaussian_evidence(key):
    """Prior N(0, 1), likelihood N(x | 1, 0.5^2) per dim: posterior and
    evidence are closed-form."""
    dim = 2
    s2 = 0.25

    def log_prior(x):
        return -0.5 * jnp.sum(x * x) - 0.5 * dim * jnp.log(2 * jnp.pi)

    def log_lik(x):
        return -0.5 * jnp.sum((x - 1.0) ** 2) / s2 - 0.5 * dim * jnp.log(2 * jnp.pi * s2)

    k_init, k_smc = jax.random.split(key)
    x0 = jax.random.normal(k_init, (2000, dim))
    res = smc(k_smc, log_prior, log_lik, x0, num_mutations=8)

    # analytic: posterior mean = 1/(1+s2), var = s2/(1+s2); logZ per dim =
    # log N(1 | 0, 1 + s2)
    post_mean = 1.0 / (1.0 + s2)
    post_var = s2 / (1.0 + s2)
    logZ = dim * (-0.5 * np.log(2 * np.pi * (1 + s2)) - 0.5 * 1.0 / (1 + s2))

    p = np.asarray(res.particles)
    assert float(res.final_beta) == 1.0
    np.testing.assert_allclose(p.mean(0), post_mean, atol=0.08)
    np.testing.assert_allclose(p.var(0), post_var, atol=0.08)
    np.testing.assert_allclose(float(res.log_evidence), logZ, atol=0.15)


def test_smc_host_matches_analytic_posterior():
    """Host-driven SMC (``smc_host`` — the million-step staging scheme) hits
    the same closed-form Gaussian posterior and evidence as the on-device
    ``smc``."""
    from gpar_at_scale_tpu.inference.smc import smc_host

    dim = 2
    s2 = 0.25

    def log_prior_batch(x):
        x = np.asarray(x)
        return -0.5 * np.sum(x * x, axis=1) - 0.5 * dim * np.log(2 * np.pi)

    def log_lik_batch(x):
        x = np.asarray(x)
        return -0.5 * np.sum((x - 1.0) ** 2, axis=1) / s2 - 0.5 * dim * np.log(
            2 * np.pi * s2
        )

    x0 = np.random.default_rng(0).normal(size=(2000, dim))
    res = smc_host(1, log_prior_batch, log_lik_batch, x0, num_mutations=8)

    post_mean = 1.0 / (1.0 + s2)
    post_var = s2 / (1.0 + s2)
    logZ = dim * (-0.5 * np.log(2 * np.pi * (1 + s2)) - 0.5 * 1.0 / (1 + s2))
    p = res.particles
    assert res.final_beta == 1.0
    assert res.num_lik_evals == 2000 * (1 + 8 * res.num_stages)
    np.testing.assert_allclose(p.mean(0), post_mean, atol=0.08)
    np.testing.assert_allclose(p.var(0), post_var, atol=0.08)
    np.testing.assert_allclose(res.log_evidence, logZ, atol=0.15)


def test_nuts_gp_hyperparam_posterior(key, rng):
    """NUTS over (log_l, log_sigma_f, log_sigma_n) of an exact GP — the EEG
    config 3 shape (hyperparameter posteriors, BASELINE.json)."""
    from gpar_at_scale_tpu.gp.exact import log_marginal_likelihood
    from gpar_at_scale_tpu.kernels import Matern52
    from gpar_at_scale_tpu.utils.params import unpack_gp

    t = np.sort(rng.uniform(0, 4, 40))
    y = np.sin(2 * t) + 0.1 * rng.normal(size=40)
    tj, yj = jnp.array(t), jnp.array(y)

    def lp(params):
        l, sf, sn = unpack_gp(params)
        k = Matern52(lengthscale=l, variance=sf**2)
        # weak N(0, 2^2) prior on the log-params
        return log_marginal_likelihood(k, tj[:, None], yj, sn**2) - jnp.sum(params**2) / 8.0

    res = nuts(key, lp, jnp.zeros(3), num_samples=400, num_warmup=300, max_depth=6)
    assert res.num_divergent == 0
    med = np.exp(np.median(np.asarray(res.samples), axis=0)) + 1e-3
    # noise posterior concentrates near the true 0.1
    assert 0.05 < med[2] < 0.2, med


def test_nuts_nan_logpost_does_not_poison_stats(key):
    """A logpost that returns NaN in part of the space (f32 Cholesky
    overflow at extreme hyperparameters does this) must register as
    divergences with accept=0 — NOT leak NaN into the acceptance stats and
    dual-averaging step size (r2 regression: every EEG ESS chain diverged
    with accept=nan)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpar_at_scale_tpu.inference.nuts import nuts

    def lp(q):
        base = -0.5 * jnp.sum(q**2)
        return jnp.where(jnp.sum(q**2) > 9.0, jnp.nan, base)

    res = nuts(
        key, lp, jnp.zeros(3, jnp.float32) + 0.1, num_samples=100, num_warmup=100
    )
    acc = float(jnp.mean(res.accept_prob))
    assert np.isfinite(acc) and acc > 0.3
    assert np.all(np.isfinite(np.asarray(res.samples)))
    assert np.isfinite(float(res.step_size)) and float(res.step_size) > 0
