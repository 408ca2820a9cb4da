"""Kernel library core: pytree kernels + combinators.

Capability parity with the Stheno kernel surface consumed by the reference
(SURVEY.md §2b rows 1-2): ``EQ()/Matern12()/Matern52()``, scaling
``kernel(k; l=, s=)`` == ``s * k(x / l)`` (``src/gp/optimized.jl:30-31``),
``stretch(k, mask)`` feature selection (``src/gp/optimized.jl:132-144``), and
kernel sums.  Built TPU-first instead of as combinator objects with dynamic
dispatch: every kernel is a JAX pytree whose hyperparameters are leaves, so
``jax.grad`` / ``vmap`` / ``jit`` flow through, and every gram matrix is one
fused XLA matmul + elementwise epilogue on the MXU/VPU.

Inputs are plain ``(N, D)`` arrays (the reference's ColVecs — a D×N matrix
viewed as N column vectors, ``src/util.jl:16-31`` — is just row-major here).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _register(cls, meta_fields: Sequence[str] = ()):
    data_fields = [f.name for f in dataclasses.fields(cls) if f.name not in meta_fields]
    jax.tree_util.register_dataclass(cls, data_fields, list(meta_fields))
    return cls


def kernel_dataclass(meta_fields: Sequence[str] = ()):
    def wrap(cls):
        cls = dataclass(frozen=True)(cls)
        return _register(cls, meta_fields)

    return wrap


class Kernel:
    """Abstract kernel. Subclasses implement ``gram`` and ``diag_part``."""

    def __call__(self, x: jnp.ndarray, z: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Cross-covariance matrix k(x, z) of shape (N, M).

        Equivalent of Stheno ``pairwise(k, x, z)``
        (``src/gp/gpar_scaled_inference.jl:156-157``).
        """
        x = _as_2d(x)
        z = x if z is None else _as_2d(z)
        return self.gram(x, z)

    def gram(self, x, z):  # pragma: no cover - abstract
        raise NotImplementedError

    def diag_part(self, x):  # pragma: no cover - abstract
        raise NotImplementedError

    # -- combinator sugar -------------------------------------------------
    def __add__(self, other):
        return Sum(left=self, right=_as_kernel(other))

    def __mul__(self, other):
        if isinstance(other, Kernel):
            return Product(left=self, right=other)
        return ScaledKernel(base=self, variance=jnp.asarray(other))

    __rmul__ = __mul__

    def select(self, dims: Tuple[int, ...]):
        """Restrict the kernel to a subset of input dimensions.

        TPU-native equivalent of ``stretch(k, mask)`` with the reference's 0/1
        masks (``src/util.jl:102-123``): the mask is a linear projection, so we
        implement it as static column selection (no zero-multiplied features
        ever reach the distance computation).
        """
        return SelectDims(base=self, dims=tuple(int(d) for d in dims))


def _as_2d(x):
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    return x


def _as_kernel(k):
    if not isinstance(k, Kernel):
        raise TypeError(f"expected Kernel, got {type(k)}")
    return k


# ---------------------------------------------------------------------------
# Distance computation — the hot path.
# ---------------------------------------------------------------------------


def sq_dist(x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distances via the matmul identity.

    ||x - z||^2 = ||x||^2 + ||z||^2 - 2 <x, z>.  The -2<x,z> term is an
    (N,D)x(D,M) matmul that XLA tiles onto the MXU; the norms fuse into the
    epilogue.  Clamped at 0 against cancellation error.

    Full f32 precision is forced: the TPU's default bf16 matmul passes lose
    ~3 decimal digits, which (after the +/- cancellation) is enough to break
    the PSD-ness of near-singular kernel grams (e.g. inducing points ==
    inputs) and NaN the Cholesky downstream.
    """
    with jax.default_matmul_precision("highest"):
        xn = jnp.sum(x * x, axis=-1)
        zn = jnp.sum(z * z, axis=-1)
        cross = x @ z.T
    d2 = xn[:, None] + zn[None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


# ---------------------------------------------------------------------------
# Combinators
# ---------------------------------------------------------------------------


@kernel_dataclass()
class Sum(Kernel):
    """k1 + k2 — the GPAR additive kernel split
    (``src/gp/optimized.jl:132-144``)."""

    left: Kernel
    right: Kernel

    def gram(self, x, z):
        return self.left.gram(x, z) + self.right.gram(x, z)

    def diag_part(self, x):
        return self.left.diag_part(x) + self.right.diag_part(x)


@kernel_dataclass()
class Product(Kernel):
    left: Kernel
    right: Kernel

    def gram(self, x, z):
        return self.left.gram(x, z) * self.right.gram(x, z)

    def diag_part(self, x):
        return self.left.diag_part(x) * self.right.diag_part(x)


@kernel_dataclass()
class ScaledKernel(Kernel):
    """variance * k — Stheno ``kernel(k; s=variance)``."""

    base: Kernel
    variance: jnp.ndarray

    def gram(self, x, z):
        return self.variance * self.base.gram(x, z)

    def diag_part(self, x):
        return self.variance * self.base.diag_part(x)


@kernel_dataclass(meta_fields=("dims",))
class SelectDims(Kernel):
    """Evaluate ``base`` on a static subset of input columns."""

    base: Kernel
    dims: Tuple[int, ...] = ()

    def _sel(self, x):
        return x[..., jnp.asarray(self.dims, dtype=jnp.int32)] if self.dims else x

    def gram(self, x, z):
        return self.base.gram(self._sel(x), self._sel(z))

    def diag_part(self, x):
        return self.base.diag_part(self._sel(x))


@kernel_dataclass()
class LinearMapKernel(Kernel):
    """k(Ax, Az) for a general matrix A — full ``stretch(k, A)`` parity for
    non-0/1 masks."""

    base: Kernel
    A: jnp.ndarray  # (P, D)

    def gram(self, x, z):
        return self.base.gram(x @ self.A.T, z @ self.A.T)

    def diag_part(self, x):
        return self.base.diag_part(x @ self.A.T)
