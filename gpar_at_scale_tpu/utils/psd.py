"""Positive-semi-definite linear-algebra helpers shared across the engine.

All dense factorizations route through XLA's fused ``cholesky`` /
``triangular_solve`` (MXU-resident on TPU).  The reference reached LAPACK via
Julia's ``LinearAlgebra`` (``src/gp/dtc.jl:119-124``); here the same algebra is
jit-compiled and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def default_jitter(dtype) -> float:
    """Relative jitter scaled for the working precision."""
    if dtype == jnp.float64:
        return 1e-10
    return 1e-6


def add_jitter(K, jitter=None):
    """K + jitter * mean(diag(K)) * I — relative jitter keeps conditioning
    scale-free across kernel variances."""
    if jitter is None:
        jitter = default_jitter(K.dtype)
    n = K.shape[-1]
    scale = jnp.mean(jnp.diagonal(K, axis1=-2, axis2=-1), axis=-1)
    eye = jnp.eye(n, dtype=K.dtype)
    return K + (jitter * scale)[..., None, None] * eye


def cholesky_psd(K, jitter=None):
    """Lower Cholesky of a PSD matrix with relative jitter."""
    return jnp.linalg.cholesky(add_jitter(K, jitter))


def solve_lower(L, b):
    """Solve L x = b with L lower triangular."""
    return jax.scipy.linalg.solve_triangular(L, b, lower=True)


def solve_upper(L, b):
    """Solve L^T x = b with L lower triangular (i.e. upper solve)."""
    return jax.scipy.linalg.solve_triangular(L, b, lower=True, trans=1)


def cho_solve(L, b):
    """Solve (L L^T) x = b."""
    return solve_upper(L, solve_lower(L, b))


def logdet_from_chol(L):
    """log det(L L^T) = 2 * sum(log diag L)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
