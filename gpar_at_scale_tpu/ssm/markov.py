"""Markovian (state-space) forms of Matern-family kernels.

TPU-native equivalent of TemporalGPs.jl's ``to_sde(gp, storage)`` +
LGSSM indexing ``sde(t, noise)`` consumed at
``src/gp/temporal_gp_inference.jl:31-37``, ``src/gp/dtc.jl:101-102`` and
``src/gp/gpar_scaled_inference.jl:105-107``.

A stationary Matern-(2p+1)/2 GP on 1-D time is exactly the first component of
a d = p+1 dimensional linear time-invariant SDE

    dx = F x dt + L dW,    f(t) = H x(t),

discretized over the (possibly irregular) time grid t_1 < ... < t_N into a
Linear-Gaussian State-Space Model

    x_k = A_k x_{k-1} + q_k,  q_k ~ N(0, Q_k),   x_0 ~ N(0, Pinf)
    y_k = H x_k + e_k,        e_k ~ N(0, R_k)

with A_k = expm(F dt_k) and stationary-process discretization
Q_k = Pinf - A_k Pinf A_k^T.  Because a single Matern block's F has
characteristic polynomial (s + lam)^d, N = F + lam*I is nilpotent of index d,
so expm(F dt) = exp(-lam dt) * (I + N dt + N^2 dt^2 / 2) in closed form —
no iterative expm; everything fuses under jit and vmaps over the N steps.
Sums of Markovian kernels are kept as tuples of blocks (static structure) and
assembled block-diagonally, so the closed form applies per block.

The reference's ``SArrayStorage`` stack-allocation concern
(``src/gp/dtc.jl:24``) is moot here: state dims are static (<= 3 per block)
and XLA fuses the small matmuls.

Kernel -> state-space map (standard results, e.g. Hartikainen & Sarkka 2010):

  Matern12 (d=1): lam = 1/l,      F = [-lam],            Pinf = s
  Matern32 (d=2): lam = sqrt3/l,  F = [[0,1],[-lam^2,-2lam]],
                  Pinf = diag(s, s lam^2)
  Matern52 (d=3): lam = sqrt5/l,  F = companion(-lam^3,-3lam^2,-3lam),
                  kappa = s lam^2 / 3,
                  Pinf = [[s,0,-kappa],[0,kappa,0],[-kappa,0,lam^4 s]]
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.kernels.base import Kernel, ScaledKernel, Sum, kernel_dataclass
from gpar_at_scale_tpu.kernels.stationary import Matern12, Matern32, Matern52

_SQRT3 = 1.7320508075688772
_SQRT5 = 2.23606797749979

# Debug mode: validate sortedness of TRACED time grids inside jit via
# jax.experimental.checkify (see ``discretize``).  Off by default — the
# public APIs sort before discretizing, and the check costs a reduction.
VALIDATE_SORTED = False


@kernel_dataclass()
class SDEBlock:
    """One single-family LTI SDE block with eigenvalue -lam (multiplicity d)."""

    F: jnp.ndarray  # (d, d)
    Pinf: jnp.ndarray  # (d, d)
    H: jnp.ndarray  # (d,)
    lam: jnp.ndarray  # scalar > 0

    @property
    def dim(self) -> int:
        return self.F.shape[-1]


@kernel_dataclass()
class SDE:
    """A Markovian prior as a static tuple of blocks (sum kernel == block-diag
    state space; emission rows concatenate)."""

    blocks: Tuple[SDEBlock, ...]

    @property
    def dim(self) -> int:
        return sum(b.dim for b in self.blocks)


@kernel_dataclass()
class LGSSM:
    """Discrete Linear-Gaussian SSM over a given time grid.

    A: (N, d, d) transitions (A_0 = 0: x_0 drawn from the prior N(0, Q_0)).
    Q: (N, d, d) process noise (Q_0 = Pinf).
    H: (d,) emission row.
    R: (N,) per-point observation noise variance — supports the reference's
       heterogeneous "1e10 noise at test points" splice trick
       (``src/gp/temporal_gp_inference.jl:93-97``).
    """

    A: jnp.ndarray
    Q: jnp.ndarray
    H: jnp.ndarray
    R: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return self.A.shape[0]

    @property
    def dim(self) -> int:
        return self.A.shape[-1]


def _matern12_block(l, s, dtype):
    lam = (1.0 / l).astype(dtype)
    F = (-lam).reshape(1, 1)
    Pinf = jnp.asarray(s, dtype).reshape(1, 1)
    H = jnp.ones((1,), dtype)
    return SDEBlock(F=F, Pinf=Pinf, H=H, lam=lam)


def _matern32_block(l, s, dtype):
    lam = (_SQRT3 / l).astype(dtype)
    z = jnp.zeros((), dtype)
    o = jnp.ones((), dtype)
    F = jnp.stack(
        [jnp.stack([z, o]), jnp.stack([-(lam**2), -2.0 * lam])]
    )
    Pinf = jnp.diag(jnp.stack([s * o, s * lam**2]))
    H = jnp.array([1.0, 0.0], dtype)
    return SDEBlock(F=F, Pinf=Pinf, H=H, lam=lam)


def _matern52_block(l, s, dtype):
    lam = (_SQRT5 / l).astype(dtype)
    z = jnp.zeros((), dtype)
    o = jnp.ones((), dtype)
    F = jnp.stack(
        [
            jnp.stack([z, o, z]),
            jnp.stack([z, z, o]),
            jnp.stack([-(lam**3), -3.0 * lam**2, -3.0 * lam]),
        ]
    )
    kappa = s * lam**2 / 3.0
    Pinf = jnp.stack(
        [
            jnp.stack([s * o, z, -kappa]),
            jnp.stack([z, kappa, z]),
            jnp.stack([-kappa, z, lam**4 * s]),
        ]
    )
    H = jnp.array([1.0, 0.0, 0.0], dtype)
    return SDEBlock(F=F, Pinf=Pinf, H=H, lam=lam)


def default_dtype():
    """f64 when x64 is enabled, else f32 — so no path requests float64 under
    a no-x64 config (which silently truncates and spams UserWarnings)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def to_sde(kernel: Kernel, dtype=None) -> SDE:
    """Convert a Markovian kernel (Matern12/32/52, scalar scalings, and sums)
    to its LTI SDE. Raises for non-Markovian kernels (EQ/RQ)."""
    if dtype is None:
        dtype = default_dtype()
    return SDE(blocks=tuple(_blocks_of(kernel, dtype, 1.0)))


def _blocks_of(kernel, dtype, outer_scale):
    if isinstance(kernel, Matern12):
        return [
            _matern12_block(
                jnp.asarray(kernel.lengthscale, dtype),
                outer_scale * jnp.asarray(kernel.variance, dtype),
                dtype,
            )
        ]
    if isinstance(kernel, Matern32):
        return [
            _matern32_block(
                jnp.asarray(kernel.lengthscale, dtype),
                outer_scale * jnp.asarray(kernel.variance, dtype),
                dtype,
            )
        ]
    if isinstance(kernel, Matern52):
        return [
            _matern52_block(
                jnp.asarray(kernel.lengthscale, dtype),
                outer_scale * jnp.asarray(kernel.variance, dtype),
                dtype,
            )
        ]
    if isinstance(kernel, ScaledKernel):
        return _blocks_of(kernel.base, dtype, outer_scale * jnp.asarray(kernel.variance, dtype))
    if isinstance(kernel, Sum):
        return _blocks_of(kernel.left, dtype, outer_scale) + _blocks_of(
            kernel.right, dtype, outer_scale
        )
    raise TypeError(
        f"kernel {type(kernel).__name__} has no exact finite-dimensional SDE "
        "(only Matern 1/2, 3/2, 5/2 and scalings/sums thereof are Markovian)"
    )


def _expm_block(block: SDEBlock, dt):
    """Closed-form expm(F dt) via the nilpotent split F = -lam I + N."""
    d = block.dim
    I = jnp.eye(d, dtype=block.F.dtype)
    N = block.F + block.lam * I
    out = I + N * dt
    if d >= 3:
        out = out + (N @ N) * (dt * dt * 0.5)
    return jnp.exp(-block.lam * dt) * out


@jax.default_matmul_precision("highest")
def discretize(sde: SDE, t: jnp.ndarray, noise_var) -> LGSSM:
    """Index the SDE at sorted times t (N,) with observation noise.

    Forced full f32 matmul precision: Q_k = Pinf - A Pinf A^T is a
    cancellation of nearly-equal matrices for small time gaps; the TPU's
    default bf16 passes make Q indefinite and NaN the filter downstream.

    noise_var: scalar or (N,) per-point variance (supports the infinite-
    noise-at-test-points splice, ``src/gp/gpar_scaled_inference.jl:100-103``).
    """
    dtype = sde.blocks[0].F.dtype
    t = jnp.asarray(t, dtype)
    n = t.shape[0]
    dts = jnp.diff(t)
    # K5 fix (SURVEY.md §7): the reference silently mis-handled unsorted time;
    # here an unsorted grid would give negative dts -> indefinite Q -> NaNs.
    # Check eagerly when the grid is concrete (outside jit).  For traced
    # grids, set ``markov.VALIDATE_SORTED = True`` and wrap the caller in
    # ``jax.experimental.checkify.checkify`` — the check then runs inside
    # jit (debug mode; high-level APIs sort before calling, so the default
    # keeps the hot path check-free).
    if isinstance(dts, jax.core.Tracer):
        if VALIDATE_SORTED:
            from jax.experimental import checkify

            checkify.check(
                jnp.all(dts >= 0),
                "discretize: time grid must be sorted ascending",
            )
    elif bool(jnp.any(dts < 0)):
        raise ValueError(
            "discretize: time grid must be sorted ascending "
            "(got negative time gaps)"
        )

    A_blocks = []
    for b in sde.blocks:
        A_blocks.append(jax.vmap(lambda dt, b=b: _expm_block(b, dt))(dts))

    if len(sde.blocks) == 1:
        A_steps = A_blocks[0]
        Pinf = sde.blocks[0].Pinf
        H = sde.blocks[0].H
    else:
        A_steps = jax.vmap(jax.scipy.linalg.block_diag)(*A_blocks)
        Pinf = jax.scipy.linalg.block_diag(*[b.Pinf for b in sde.blocks])
        H = jnp.concatenate([b.H for b in sde.blocks])

    Q_steps = Pinf[None] - jnp.einsum("nij,jk,nlk->nil", A_steps, Pinf, A_steps)

    d = sde.dim
    A = jnp.concatenate([jnp.zeros((1, d, d), dtype), A_steps], axis=0)
    Q = jnp.concatenate([Pinf[None], Q_steps], axis=0)
    Q = 0.5 * (Q + jnp.swapaxes(Q, -1, -2))  # symmetrize vs accumulation error
    R = jnp.broadcast_to(jnp.asarray(noise_var, dtype), (n,))
    return LGSSM(A=A, Q=Q, H=H, R=R)


def lgssm_of(kernel: Kernel, t, noise_var, dtype=None) -> LGSSM:
    """Convenience: ``to_sde`` + ``discretize`` (the reference's
    ``create_lgssm``, ``src/gp/temporal_gp_inference.jl:15-39``)."""
    return discretize(to_sde(kernel, dtype), t, noise_var)
