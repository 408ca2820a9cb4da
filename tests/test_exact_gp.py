"""Exact GP: NLML and posterior vs. dense numpy oracle."""

import jax.numpy as jnp
import numpy as np

from gpar_at_scale_tpu.gp.exact import condition, log_marginal_likelihood
from gpar_at_scale_tpu.kernels import EQ, Matern52


def dense_oracle_lml(K, noise, y):
    n = len(y)
    Ky = K + np.diag(np.broadcast_to(noise, (n,)))
    L = np.linalg.cholesky(Ky)
    a = np.linalg.solve(L, y)
    return -0.5 * (n * np.log(2 * np.pi) + 2 * np.sum(np.log(np.diag(L))) + a @ a)


def test_lml_matches_oracle(rng):
    x = rng.normal(size=(20, 2))
    y = rng.normal(size=20)
    k = Matern52(lengthscale=0.8, variance=1.5)
    K = np.asarray(k(jnp.array(x)))
    got = log_marginal_likelihood(k, jnp.array(x), jnp.array(y), 0.1**2)
    want = dense_oracle_lml(K, 0.1**2, y)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_posterior_interpolates_noiseless(rng):
    x = np.linspace(0, 1, 15)[:, None]
    y = np.sin(4 * x[:, 0])
    k = EQ(lengthscale=0.3, variance=1.0)
    post = condition(k, jnp.array(x), jnp.array(y), 1e-10)
    mu, var = post.predict_f(jnp.array(x))
    np.testing.assert_allclose(mu, y, atol=1e-4)
    assert np.all(np.asarray(var) < 1e-4)


def test_posterior_matches_oracle(rng):
    x = rng.normal(size=(25, 1))
    y = rng.normal(size=25)
    xs = rng.normal(size=(7, 1))
    nv = 0.05
    k = Matern52(lengthscale=1.2, variance=0.9)
    K = np.asarray(k(jnp.array(x))) + nv * np.eye(25)
    Ks = np.asarray(k(jnp.array(xs), jnp.array(x)))
    Kss = np.asarray(k(jnp.array(xs)))
    mu_o = Ks @ np.linalg.solve(K, y)
    cov_o = Kss - Ks @ np.linalg.solve(K, Ks.T)

    post = condition(k, jnp.array(x), jnp.array(y), nv)
    mu, var = post.predict_f(jnp.array(xs))
    np.testing.assert_allclose(mu, mu_o, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(var, np.diag(cov_o), rtol=1e-4, atol=1e-7)
    mu2, cov = post.predict_f(jnp.array(xs), diag=False)
    np.testing.assert_allclose(cov, cov_o, rtol=1e-4, atol=2e-6)


def test_posterior_mean_reverts_to_prior_far_away():
    x = np.zeros((5, 1))
    y = np.ones(5)
    k = EQ(lengthscale=0.1, variance=2.0)
    post = condition(k, jnp.array(x), jnp.array(y), 0.01)
    mu, var = post.predict_f(jnp.array([[100.0]]))
    np.testing.assert_allclose(mu, 0.0, atol=1e-6)
    np.testing.assert_allclose(var, 2.0, rtol=1e-5)


def test_sample_f_moments(key, rng):
    x = rng.normal(size=(10, 1))
    y = rng.normal(size=10)
    xs = rng.normal(size=(4, 1))
    k = EQ(lengthscale=1.0, variance=1.0)
    post = condition(k, jnp.array(x), jnp.array(y), 0.1)
    samples = post.sample_f(key, jnp.array(xs), num_samples=4000)
    mu, var = post.predict_f(jnp.array(xs))
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.1)
    np.testing.assert_allclose(samples.var(0), var, atol=0.1)
