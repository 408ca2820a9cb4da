"""Model-axis (tensor-parallel) sharding of the inducing dimension M.

The TP row of SURVEY.md §2c: shard K_fu's M axis and the M x M inducing
algebra over a "model" mesh axis.  Absent in the reference (its M columns
are a sequential loop, ``src/gp/dtc.jl:110-117``); needed here once
M = O(1000) pseudo-points stop fitting per chip — the big objects at scale
are the (N, M) K_fu / whitened-column arrays and the O(N d^2 M) filter
work, both linear in M.

Layout and collectives:

* Z is sharded along M (``PartitionSpec("model", None)``); V, y and the
  temporal LGSSM are replicated.
* Each device builds its LOCAL K_fu slab (N, M/D) with no communication
  (the kernel is elementwise in the column index) and whitens
  ``[y - mean | Kfu_local]`` through its own blocked two-pass filter —
  the per-device filter runs M/D + 1 columns instead of M + 1.  This is
  also the multi-chip answer to this sandbox's wide-column compile stalls
  (BENCHMARKS.md): every device compiles a NARROW program.
* The Gram G_b = W^T W needs cross-shard column products: one tiled
  ``all_gather`` of the whitened slab along the model axis (the standard
  TP gather for a matmul whose contracting dimension stays sharded-free),
  then each device contracts its own ROW BLOCK W_loc^T W_full — the
  O(N M^2) Gram FLOPs stay sharded — and a second (tiny, (M/D, M))
  all_gather replicates G_b.
* The M x M algebra downstream (chol(K_uu), chol(Gb + K_uu)) is REPLICATED:
  at M = 4096 it is a 64 MB matrix and O(M^3) ~ 7e10 FLOPs — microseconds
  on an MXU against the O(N M^2) sharded work; distributing the Cholesky
  would buy nothing (stated per VERDICT r4 "partial TP" row).

Everything is differentiable (jax.grad through ``jax.shard_map`` +
the blocked engine), so the sharded objective trains directly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpar_at_scale_tpu.gp.dtc import _LOG_2PI, QU, _lam_chol, DTCIntermediates
from gpar_at_scale_tpu.kernels import Matern52
from gpar_at_scale_tpu.ssm.blocked import NUM_BLOCKS, blocked_filter
from gpar_at_scale_tpu.ssm.markov import LGSSM, lgssm_of
from gpar_at_scale_tpu.utils.params import unpack_gpar
from gpar_at_scale_tpu.utils.psd import cholesky_psd, logdet_from_chol, solve_lower, cho_solve


def _whiten_body(axis, num_blocks, out_family, A, Q, R, H, V, ym, Z_loc, ol, ov):
    """Per-device body (inside shard_map): local whiten + gathered Gram."""
    out_k = out_family(lengthscale=ol, variance=ov**2)
    Kfu_loc = out_k(V, Z_loc)  # (N, M/D) — no comm
    cols = jnp.concatenate([ym[:, None], Kfu_loc], axis=1)
    res = blocked_filter(LGSSM(A=A, Q=Q, H=H, R=R), cols, num_blocks)
    white = res.v / jnp.sqrt(res.S)[:, None]
    wy, W_loc = white[:, 0], white[:, 1:]

    with jax.default_matmul_precision("highest"):
        W_full = jax.lax.all_gather(W_loc, axis, axis=1, tiled=True)  # (N, M)
        Gb_rows = W_loc.T @ W_full  # (M/D, M): Gram FLOPs stay sharded
        Gb = jax.lax.all_gather(Gb_rows, axis, axis=0, tiled=True)  # (M, M)
        g = jax.lax.all_gather(W_loc.T @ wy, axis, axis=0, tiled=True)  # (M,)
        Z_full = jax.lax.all_gather(Z_loc, axis, axis=0, tiled=True)
        Kuu_rows = out_k(Z_loc, Z_full)  # (M/D, M)
        Kuu = jax.lax.all_gather(Kuu_rows, axis, axis=0, tiled=True)
    aa = jnp.sum(wy * wy)
    logdet_noise = jnp.sum(jnp.log(res.S))
    return aa, g, Gb, Kuu, logdet_noise


def modelsharded_whiten(
    mesh: Mesh,
    out_kernel_params,
    lgssm: LGSSM,
    V,
    y,
    Z,
    *,
    out_family=Matern52,
    mean=0.0,
    uu_ridge="auto",
    model_axis: str = "model",
    num_blocks: int = NUM_BLOCKS,
) -> DTCIntermediates:
    """DTC Gram intermediates with the M axis sharded over ``model_axis``.

    out_kernel_params: (out_l, out_sigma).  Z's leading dimension must be
    divisible by the model-axis size.  Numerically identical to
    ``gp.dtc._whiten_all(filter_fn="blocked"-style engine)`` on replicated
    inputs (asserted in ``tests/test_modelshard.py``)."""
    ol, ov = out_kernel_params
    n = lgssm.num_steps
    m = jnp.shape(Z)[0]
    d_ax = mesh.shape[model_axis]
    if m % d_ax != 0:
        raise ValueError(f"M={m} must divide the '{model_axis}' axis size {d_ax}")
    dtype = lgssm.A.dtype
    R = jnp.broadcast_to(jnp.asarray(lgssm.R, dtype), (n,))
    ym = (jnp.asarray(y, dtype) - mean).astype(dtype)
    V = jnp.asarray(V, dtype)
    Z = jnp.asarray(Z, dtype)

    body = partial(_whiten_body, model_axis, num_blocks, out_family)
    repl = P()
    aa, g, Gb, Kuu, logdet_noise = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(repl, repl, repl, repl, repl, repl, P(model_axis, None), repl, repl),
        out_specs=(repl, repl, repl, repl, repl),
        # The blocked filter's scan carries start replicated and become
        # model-varying after combining with the Z-dependent columns; vma
        # tracking rejects that mix, and the outputs are made replicated by
        # the all_gathers above anyway.
        check_vma=False,
    )(lgssm.A.astype(dtype), lgssm.Q.astype(dtype), R, lgssm.H.astype(dtype),
      V, ym, Z, jnp.asarray(ol, dtype), jnp.asarray(ov, dtype))

    if uu_ridge == "auto":
        uu_ridge = jnp.mean(R)
    if uu_ridge is not None:
        Kuu = Kuu + uu_ridge * jnp.eye(m, dtype=dtype)
    L_uu = cholesky_psd(Kuu)
    return DTCIntermediates(aa=aa, g=g, Gb=Gb, L_uu=L_uu, logdet_noise=logdet_noise)


@jax.default_matmul_precision("highest")
def dtc_objective_modelsharded(
    mesh: Mesh,
    out_kernel_params,
    lgssm: LGSSM,
    V,
    y,
    Z,
    *,
    out_family=Matern52,
    mean=0.0,
    uu_ridge="auto",
    model_axis: str = "model",
    num_blocks: int = NUM_BLOCKS,
):
    """The DTC bound (``gp.dtc.dtc_objective`` P-form) with M model-sharded.
    Same value as the replicated objective; gradients flow through the
    shard_map (trainable)."""
    inter = modelsharded_whiten(
        mesh, out_kernel_params, lgssm, V, y, Z, out_family=out_family,
        mean=mean, uu_ridge=uu_ridge, model_axis=model_axis, num_blocks=num_blocks,
    )
    n = jnp.shape(jnp.asarray(y))[0]
    Kuu_r = inter.L_uu @ inter.L_uu.T
    L_P = jnp.linalg.cholesky(inter.Gb + Kuu_r)
    wp = solve_lower(L_P, inter.g)
    logdet_lam = logdet_from_chol(L_P) - logdet_from_chol(inter.L_uu)
    quad = inter.aa - jnp.sum(wp**2)
    return -0.5 * (n * _LOG_2PI + inter.logdet_noise + logdet_lam + quad)


@jax.default_matmul_precision("highest")
def compute_q_u_modelsharded(
    mesh: Mesh,
    out_kernel_params,
    lgssm: LGSSM,
    V,
    y,
    Z,
    *,
    out_family=Matern52,
    mean=0.0,
    uu_ridge="auto",
    model_axis: str = "model",
    num_blocks: int = NUM_BLOCKS,
) -> QU:
    """Model-sharded q(u) (parity with ``gp.dtc.compute_q_u``)."""
    inter = modelsharded_whiten(
        mesh, out_kernel_params, lgssm, V, y, Z, out_family=out_family,
        mean=mean, uu_ridge=uu_ridge, model_axis=model_axis, num_blocks=num_blocks,
    )
    L_D = _lam_chol(inter)
    m_eps = cho_solve(L_D, solve_lower(inter.L_uu, inter.g))
    return QU(m_eps=m_eps, L_D=L_D, L_uu=inter.L_uu, Z=jnp.asarray(Z))


def make_modelsharded_nlml(
    mesh: Mesh,
    *,
    out_family=Matern52,
    time_family=Matern52,
    dtype=jnp.float32,
    model_axis: str = "model",
    num_blocks: int = NUM_BLOCKS,
):
    """Negative DTC objective as a pure function of (params, t, V, y, Z)
    with Z model-sharded — the TP analogue of
    ``parallel.sharded.make_dtc_nlml``; 5-param reference pack."""

    def nlml(params, t, V, y, Z):
        tl, ts, ol, osig, ns = unpack_gpar(params)
        time_k = time_family(lengthscale=tl, variance=ts**2)
        lgssm = lgssm_of(time_k, t, ns**2, dtype)
        return -dtc_objective_modelsharded(
            mesh, (ol, osig), lgssm, V, y, Z, out_family=out_family,
            uu_ridge=ns**2, model_axis=model_axis, num_blocks=num_blocks,
        )

    return nlml


def place_modelsharded(mesh: Mesh, Z, model_axis: str = "model"):
    """device_put Z with its M axis sharded over the model mesh axis."""
    return jax.device_put(Z, NamedSharding(mesh, P(model_axis, None)))
