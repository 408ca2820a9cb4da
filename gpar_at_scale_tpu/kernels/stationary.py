"""Stationary kernel families: EQ (squared-exponential), Matern 1/2, 3/2, 5/2,
and Rational Quadratic.

Parity surface: the reference uses ``EQ()``, ``Matern12()``, ``Matern52()``
from Stheno with the scaling wrapper ``kernel(k; l=l, s=s) == s * k(x/l)``
(``src/gp/optimized.jl:30-31``, ``src/gp/dtc.jl:31,37``).  Here lengthscale
and variance are fields of the kernel itself (leaves of the pytree, so
differentiable), and each family exposes its exact LTI-SDE state-space form
(used by the LGSSM engine, see ``gpar_at_scale_tpu/ssm/markov.py``).

Each gram is one fused XLA computation: matmul-based squared distance →
elementwise covariance on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from gpar_at_scale_tpu.kernels.base import Kernel, kernel_dataclass, sq_dist, _as_2d

_SQRT3 = 1.7320508075688772
_SQRT5 = 2.23606797749979


class StationaryKernel(Kernel):
    """k(x, z) = variance * rho(||(x - z)/lengthscale||)."""

    def _rho_r2(self, r2):  # covariance as function of squared scaled distance
        raise NotImplementedError

    def gram(self, x, z):
        l = self.lengthscale
        r2 = sq_dist(x / l, z / l)
        return self.variance * self._rho_r2(r2)

    def diag_part(self, x):
        x = _as_2d(x)
        n = x.shape[0]
        return jnp.broadcast_to(jnp.asarray(self.variance, x.dtype), (n,))


@kernel_dataclass()
class EQ(StationaryKernel):
    """Squared-exponential: exp(-r^2 / 2)."""

    lengthscale: jnp.ndarray = 1.0
    variance: jnp.ndarray = 1.0

    def _rho_r2(self, r2):
        return jnp.exp(-0.5 * r2)


@kernel_dataclass()
class Matern12(StationaryKernel):
    """Exponential kernel: exp(-r). Markov order 1."""

    lengthscale: jnp.ndarray = 1.0
    variance: jnp.ndarray = 1.0

    def _rho_r2(self, r2):
        r = jnp.sqrt(r2 + 1e-36)  # guarded sqrt: grad at 0 stays finite
        return jnp.exp(-r)


@kernel_dataclass()
class Matern32(StationaryKernel):
    """(1 + sqrt3 r) exp(-sqrt3 r). Markov order 2."""

    lengthscale: jnp.ndarray = 1.0
    variance: jnp.ndarray = 1.0

    def _rho_r2(self, r2):
        r = jnp.sqrt(r2 + 1e-36)
        s = _SQRT3 * r
        return (1.0 + s) * jnp.exp(-s)


@kernel_dataclass()
class Matern52(StationaryKernel):
    """(1 + sqrt5 r + 5 r^2/3) exp(-sqrt5 r). Markov order 3.

    The reference's default everywhere (``src/gp/dtc.jl:16-17``).
    """

    lengthscale: jnp.ndarray = 1.0
    variance: jnp.ndarray = 1.0

    def _rho_r2(self, r2):
        r = jnp.sqrt(r2 + 1e-36)
        s = _SQRT5 * r
        return (1.0 + s + (5.0 / 3.0) * r2) * jnp.exp(-s)


@kernel_dataclass()
class RQ(StationaryKernel):
    """Rational quadratic: (1 + r^2 / (2 alpha))^(-alpha)."""

    lengthscale: jnp.ndarray = 1.0
    variance: jnp.ndarray = 1.0
    alpha: jnp.ndarray = 1.0

    def _rho_r2(self, r2):
        return (1.0 + r2 / (2.0 * self.alpha)) ** (-self.alpha)


def scaled(base_cls, lengthscale, variance_sq_root=None, *, variance=None, **extra):
    """Stheno-style ``kernel(k; l=l, s=s)`` constructor.

    The reference always passes ``s = sigma**2`` (``src/gp/optimized.jl:30``);
    pass either ``variance`` directly or ``variance_sq_root`` (= sigma).
    """
    if variance is None:
        variance = variance_sq_root**2
    return base_cls(lengthscale=lengthscale, variance=variance, **extra)
