"""Exact dense Gaussian-process regression — the trusted oracle.

Capability parity with the Stheno GP calculus the reference consumes
(SURVEY.md §2b rows 3-5): prior ``GP(kernel)``, ``logpdf(f(x, s2), y)`` exact
NLML, posterior conditioning ``f | (f(x, s2) <- y)``
(``src/gp/optimized.jl:94,236``) and predictive ``marginals``.

All algebra is one jit graph: K build (MXU matmul) → Cholesky →
triangular solves.  Differentiable w.r.t. kernel hyperparameters — the basis
for gradient-based type-II ML replacing the reference's Nelder-Mead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.kernels.base import Kernel, _as_2d, kernel_dataclass
from gpar_at_scale_tpu.utils.psd import (
    cholesky_psd,
    cho_solve,
    logdet_from_chol,
    solve_lower,
)

_LOG_2PI = 1.8378770664093453


@jax.default_matmul_precision("highest")
def log_marginal_likelihood(kernel: Kernel, x, y, noise_var, mean=0.0):
    """Exact GP log marginal likelihood log N(y | mean, K + noise_var * I).

    ``noise_var`` may be a scalar or an (N,) per-point vector (the reference
    only uses scalars on the exact path; vectors mirror the LGSSM noise-vector
    trick for cross-checking).  Equivalent of Stheno ``logpdf(f(x, s2), y)``
    (``src/gp/optimized.jl:150-152``).
    """
    x = _as_2d(x)
    y = jnp.asarray(y)
    n = y.shape[0]
    K = kernel(x, x)
    noise = jnp.broadcast_to(jnp.asarray(noise_var, K.dtype), (n,))
    Ky = K + jnp.diag(noise)
    L = cholesky_psd(Ky)
    resid = y - mean
    alpha = solve_lower(L, resid)
    quad = jnp.sum(alpha * alpha)
    return -0.5 * (n * _LOG_2PI + logdet_from_chol(L) + quad)


def nlml(kernel: Kernel, x, y, noise_var, mean=0.0):
    return -log_marginal_likelihood(kernel, x, y, noise_var, mean)


@kernel_dataclass()
class GPPosterior:
    """Conditioned GP with cached Cholesky factors.

    Predictive mean  = K*f alpha
    Predictive var   = k** - ||L^-1 Kf*||^2   (+ noise if observation space)

    Equivalent of the Stheno posterior object produced by
    ``gp | (gp(x, s2) <- y)`` (``src/gp/optimized.jl:94``).
    """

    kernel: Kernel
    x_train: jnp.ndarray  # (N, D)
    chol: jnp.ndarray  # (N, N) lower
    alpha: jnp.ndarray  # (N,)  = (K + S)^-1 (y - mean)
    mean_const: jnp.ndarray  # scalar prior mean

    def predict_f(self, x_star, diag: bool = True):
        """Latent-function posterior at x_star: (mean, var-or-cov)."""
        xs = _as_2d(x_star)
        Ksf = self.kernel(xs, self.x_train)  # (N*, N)
        mean = self.mean_const + Ksf @ self.alpha
        V = solve_lower(self.chol, Ksf.T)  # (N, N*)
        if diag:
            var = self.kernel.diag_part(xs) - jnp.sum(V * V, axis=0)
            return mean, jnp.maximum(var, 0.0)
        cov = self.kernel(xs, xs) - V.T @ V
        return mean, cov

    def predict_y(self, x_star, noise_var):
        """Observation-space posterior (adds observation noise to variances)."""
        mean, var = self.predict_f(x_star, diag=True)
        return mean, var + noise_var

    def logpdf_train(self, y):
        """Convenience: nlml of the training data under the cached factor."""
        resid = jnp.asarray(y) - self.mean_const
        a = solve_lower(self.chol, resid)
        n = resid.shape[0]
        return -0.5 * (n * _LOG_2PI + logdet_from_chol(self.chol) + jnp.sum(a * a))

    def sample_f(self, key, x_star, num_samples: int = 1):
        """Joint posterior samples at x_star, (num_samples, N*)."""
        mean, cov = self.predict_f(x_star, diag=False)
        L = cholesky_psd(cov)
        eps = jax.random.normal(key, (num_samples, mean.shape[0]), dtype=mean.dtype)
        return mean[None, :] + eps @ L.T


@jax.default_matmul_precision("highest")
def condition(kernel: Kernel, x, y, noise_var, mean=0.0) -> GPPosterior:
    """Build the posterior ``f | (f(x, noise_var) <- y)``."""
    x = _as_2d(x)
    y = jnp.asarray(y)
    n = y.shape[0]
    K = kernel(x, x)
    noise = jnp.broadcast_to(jnp.asarray(noise_var, K.dtype), (n,))
    L = cholesky_psd(K + jnp.diag(noise))
    alpha = cho_solve(L, y - mean)
    return GPPosterior(
        kernel=kernel,
        x_train=x,
        chol=L,
        alpha=alpha,
        mean_const=jnp.asarray(mean, K.dtype),
    )
