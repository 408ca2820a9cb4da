"""Kernel library correctness vs. brute-force numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.kernels import (
    EQ,
    Matern12,
    Matern32,
    Matern52,
    RQ,
    Sum,
    gpar_kernel,
    sq_dist,
)


def brute_sq_dist(x, z):
    return ((x[:, None, :] - z[None, :, :]) ** 2).sum(-1)


def test_sq_dist_matches_bruteforce(rng):
    x = rng.normal(size=(7, 3))
    z = rng.normal(size=(5, 3))
    np.testing.assert_allclose(sq_dist(jnp.array(x), jnp.array(z)), brute_sq_dist(x, z), atol=1e-10)


@pytest.mark.parametrize(
    "family,rho",
    [
        (EQ, lambda r: np.exp(-0.5 * r**2)),
        (Matern12, lambda r: np.exp(-r)),
        (Matern32, lambda r: (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)),
        (
            Matern52,
            lambda r: (1 + np.sqrt(5) * r + 5 * r**2 / 3) * np.exp(-np.sqrt(5) * r),
        ),
    ],
)
def test_stationary_families(family, rho, rng):
    x = rng.normal(size=(6, 2))
    z = rng.normal(size=(4, 2))
    l, s = 0.7, 2.3
    k = family(lengthscale=l, variance=s)
    r = np.sqrt(brute_sq_dist(x / l, z / l))
    np.testing.assert_allclose(k(jnp.array(x), jnp.array(z)), s * rho(r), rtol=1e-8, atol=1e-10)
    # diag
    np.testing.assert_allclose(k.diag_part(jnp.array(x)), np.full(6, s), rtol=1e-8)


def test_rq_limit_to_eq(rng):
    # RQ -> EQ as alpha -> inf
    x = rng.normal(size=(5, 2))
    krq = RQ(lengthscale=1.0, variance=1.0, alpha=1e7)
    keq = EQ(lengthscale=1.0, variance=1.0)
    np.testing.assert_allclose(krq(jnp.array(x)), keq(jnp.array(x)), atol=1e-5)


def test_select_dims_equals_manual_masking(rng):
    """Mirrors the docstring mask-equivalence example at src/util.jl:61-96."""
    x = rng.normal(size=(5, 3))
    z = rng.normal(size=(4, 3))
    k = EQ(lengthscale=1.0, variance=1.0)
    time_k = k.select((0,))
    out_k = k.select((1, 2))
    np.testing.assert_allclose(
        time_k(jnp.array(x), jnp.array(z)), np.asarray(k(jnp.array(x[:, :1]), jnp.array(z[:, :1])))
    )
    np.testing.assert_allclose(
        out_k(jnp.array(x), jnp.array(z)), np.asarray(k(jnp.array(x[:, 1:]), jnp.array(z[:, 1:])))
    )


def test_gpar_kernel_is_masked_sum(rng):
    x = rng.normal(size=(5, 3))
    z = rng.normal(size=(4, 3))
    tl, ts, ol, os_ = 0.5, 1.2, 2.0, 0.8
    k = gpar_kernel(EQ, Matern52, 3, tl, ts, ol, os_)
    ref = ts**2 * np.asarray(
        EQ(lengthscale=tl, variance=1.0)(jnp.array(x[:, :1]), jnp.array(z[:, :1]))
    ) + os_**2 * np.asarray(
        Matern52(lengthscale=ol, variance=1.0)(jnp.array(x[:, 1:]), jnp.array(z[:, 1:]))
    )
    np.testing.assert_allclose(k(jnp.array(x), jnp.array(z)), ref, rtol=1e-8)


def test_kernel_is_differentiable():
    x = jnp.linspace(0, 1, 10)[:, None]

    def loss(l):
        return jnp.sum(Matern52(lengthscale=l, variance=1.0)(x, x))

    g = jax.grad(loss)(0.5)
    assert np.isfinite(g)
    assert abs(g) > 0


def test_kernel_pytree_flattens():
    k = Sum(left=EQ(lengthscale=1.0, variance=2.0), right=Matern12(lengthscale=0.3, variance=0.1))
    leaves = jax.tree_util.tree_leaves(k)
    assert len(leaves) == 4
