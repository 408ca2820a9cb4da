"""Positive-semi-definite linear-algebra helpers shared across the engine.

Dense factorizations route through XLA's ``cholesky`` / ``triangular_solve``
— except on TPU for small f32 matrices, where XLA lowers them to blocked
While-loop algorithms costing ~30 us each (latency-bound, ~100x off the
chip's capability at N~150).  There the helpers dispatch to the fused
Pallas kernels in ``ops/pallas_dense`` (single-launch VMEM-resident
factorizations with custom VJPs), keeping call sites and autodiff
unchanged.  The reference reached LAPACK via Julia's ``LinearAlgebra``
(``src/gp/dtc.jl:119-124``); here the same algebra is jit-compiled,
differentiable, and kernel-dispatched.

Set ``GPAR_NO_PALLAS_DENSE=1`` to force the XLA path everywhere.
"""

from __future__ import annotations

import os

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


def pallas_dense_mode() -> str:
    """Resolve the Pallas small-dense dispatch mode: "off" | "on" |
    "interpret".  Source of truth is ``config.get_config().engine.
    pallas_dense`` (discoverable, testable); the env vars are overrides
    kept as test hooks with precedence off > interpret > on.
    """
    if os.environ.get("GPAR_NO_PALLAS_DENSE"):
        return "off"
    if os.environ.get("GPAR_PALLAS_DENSE_INTERPRET"):
        return "interpret"
    if os.environ.get("GPAR_PALLAS_DENSE"):
        return "on"
    from gpar_at_scale_tpu.config import get_config

    mode = get_config().engine.pallas_dense
    if mode not in ("off", "on", "interpret"):
        raise ValueError(f"engine.pallas_dense must be off|on|interpret, got {mode!r}")
    return mode


def _pallas_dense_ok(*arrays) -> bool:
    """True when the Pallas small-dense kernels should take this call.

    OPT-IN (``engine.pallas_dense = "on"`` in config, or the env hooks —
    see ``pallas_dense_mode``), off by default: measured end-to-end on
    the EEG DTC pipeline (v5e, r2), the Pallas kernels LOSE to XLA despite
    winning isolated single-op microbenchmarks (fused chol+solve 45 us vs
    52 us; trisolve 10 us vs 23 us).  XLA hides its While-loop linalg
    latency by overlapping independent ops across the optimization step's
    dataflow, and its batched cholesky amortizes across vmapped serving
    requests — both contexts where single-launch fused kernels serialize.
    Kept as an opt-in backend for strictly latency-critical serialized
    call patterns (e.g. a single un-batched fit on an otherwise idle chip).
    "interpret" mode additionally forces interpret-mode kernels (CPU test
    hook).
    """
    mode = pallas_dense_mode()
    if mode == "off":
        return False
    if mode == "on":
        try:
            if jax.default_backend() != "tpu":
                return False
        except RuntimeError:
            return False
    from gpar_at_scale_tpu.ops.pallas_dense import PALLAS_DENSE_N_MAX

    for a in arrays:
        if a.ndim != 2 or a.dtype != jnp.float32:
            return False
    n = arrays[0].shape[0]
    return 8 <= n <= PALLAS_DENSE_N_MAX


def cholesky_psd(K, jitter=None):
    """Lower Cholesky of a PSD matrix with relative jitter."""
    Kj = add_jitter(K, jitter)
    if _pallas_dense_ok(Kj):
        from gpar_at_scale_tpu.ops.pallas_dense import chol_solve

        U, _, _ = chol_solve(Kj, jnp.zeros((Kj.shape[0], 1), Kj.dtype))
        return U.T
    return jnp.linalg.cholesky(Kj)


def _solve_dispatch(L, b, trans: bool):
    """Shared pallas-vs-XLA dispatch for triangular solves with lower L."""
    vec = b.ndim == 1
    b2 = b[:, None] if vec else b
    if b2.ndim == 2 and L.ndim == 2 and _pallas_dense_ok(L, b2):
        from gpar_at_scale_tpu.ops.pallas_dense import tri_u, tri_ut

        # Kernels are U-native (U = L^T): L^-1 b = U^-T b, L^-T b = U^-1 b.
        x = tri_u(L.T, b2) if trans else tri_ut(L.T, b2)
    else:
        x = jax.scipy.linalg.solve_triangular(L, b2, lower=True, trans=1 if trans else 0)
    return x[:, 0] if vec else x


def solve_lower(L, b):
    """Solve L x = b with L lower triangular."""
    return _solve_dispatch(L, b, trans=False)


def solve_upper(L, b):
    """Solve L^T x = b with L lower triangular (i.e. upper solve)."""
    return _solve_dispatch(L, b, trans=True)


def cho_solve(L, b):
    """Solve (L L^T) x = b."""
    return solve_upper(L, solve_lower(L, b))


def logdet_from_chol(L):
    """log det(L L^T) = 2 * sum(log diag L)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
