"""Closed-form gradients through the blocked XLA Kalman filter.

``jax.grad`` of ``blocked_logpdf`` is exact and is what the test oracles use
— but the fused forward+backward program it produces is large, and this
sandbox's remote compile service stalls indefinitely on it at N = 1e6
(BENCHMARKS.md "engine dispatch diagnosis"; the same pathology as the fused
filter+smoother).  This module provides the same gradient in CLOSED FORM via
the De Jong / Koopman disturbance smoother — the identical math already used
for the Pallas kernels in ``ops/pallas_grad.py`` (see its module docstring
for the r/N recursion derivation), re-targeted at the blocked XLA engine:

    forward  = ``blocked_filter``            (one streaming two-pass program)
    backward = one ``blocked_suffix_scan``   (the r/N adjoint recursions ARE
               the smoothing-combine algebra) + elementwise contractions.

Two entry points:

* ``blocked_loglik(lgssm, y)`` — a ``jax.custom_vjp`` drop-in for
  ``blocked_logpdf`` whose backward never traces autodiff through the scans;
  one jit compiles forward+backward as two structurally simple halves.
* ``loglik_fwd_aux`` / ``loglik_bwd`` — the two halves as SEPARATE functions,
  so callers (``benchmarks/million_grad.py --fisher``) can jit and dispatch
  them independently when even the combined custom-VJP program is too much
  for a pathological compile service.

Unlike the EM/Fisher identity, nothing here inverts Q or Pp — the only
divisions are by the innovation variance S_k — so the gradient is f32-stable
including the near-singular Q_k of tiny time gaps.  Works for any state dim
and general emission rows H (sum kernels), which the Pallas path (d <= 3,
H = e1) cannot express.

Reference equivalent: the optimized temporal NLML the reference drives with
derivative-free Nelder-Mead (``src/gp/temporal_gp_inference.jl:69-79``;
Zygote imported but never used, ``src/GPARatScale.jl:2``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.ssm.blocked import (
    NUM_BLOCKS,
    blocked_filter,
    blocked_suffix_scan,
)
from gpar_at_scale_tpu.ssm.markov import LGSSM


def loglik_fwd_aux(A, Q, R, H, y, num_blocks: int = NUM_BLOCKS):
    """Forward half: blocked filter on one observation column.

    Returns (ll, aux) with aux = (e, S, K, m, P) — everything the backward
    half needs.  R must be per-step (n,); H is the (d,) emission row."""
    lgssm = LGSSM(A=A, Q=Q, H=H, R=R)
    res = blocked_filter(lgssm, y[:, None], num_blocks)
    K = jnp.einsum("nij,j->ni", res.Pp, H) / res.S[:, None]
    return res.ll[0], (res.v[:, 0], res.S, K, res.m[:, :, 0], res.P)


@jax.default_matmul_precision("highest")
def loglik_bwd(A, Q, R, H, aux, num_blocks: int = NUM_BLOCKS):
    """Backward half: disturbance-smoother adjoints -> (dA, dQ, dR, dy).

    r/N recursions (r_n = 0, N_n = 0):
        C_k = (A_{k+1} (I - K_k H))^T
        r_k = H^T e_k / S_k + C_k r_{k+1}
        N_k = H^T H / S_k   + C_k N_{k+1} C_k^T
    run as ONE inclusive blocked suffix scan over the shared (E, g, L)
    smoothing algebra.  Score formulas as in ``ops/pallas_grad.py``."""
    e, S, K, m, P = aux
    n, d = K.shape
    dtype = A.dtype
    I = jnp.eye(d, dtype=dtype)

    A_next = jnp.concatenate([A[1:], jnp.zeros((1, d, d), dtype)])
    ImKH = I[None] - K[:, :, None] * H[None, None, :]
    C = jnp.swapaxes(A_next @ ImKH, -1, -2)
    b = H[None, :] * (e / S)[:, None]  # (n, d)
    W = (1.0 / S)[:, None, None] * (H[:, None] * H[None, :])[None]

    _, r, N = blocked_suffix_scan(C, b[:, :, None], W, num_blocks=num_blocks)
    r = r[:, :, 0]

    outer = lambda a, bb: a[:, :, None] * bb[:, None, :]
    rrN = outer(r, r) - N  # = 2 * Pbar_k

    m_prev = jnp.concatenate([jnp.zeros((1, d), dtype), m[:-1]])
    P_prev = jnp.concatenate([jnp.zeros((1, d, d), dtype), P[:-1]])
    dQ = 0.5 * rrN
    dA = rrN @ (A @ P_prev) + outer(r, m_prev)

    r_next = jnp.concatenate([r[1:], jnp.zeros((1, d), dtype)])
    N_next = jnp.concatenate([N[1:], jnp.zeros((1, d, d), dtype)])
    AK = jnp.einsum("nij,nj->ni", A_next, K)
    u = e / S - jnp.sum(AK * r_next, axis=-1)
    D = 1.0 / S + jnp.einsum("ni,nij,nj->n", AK, N_next, AK)
    dR = 0.5 * (u * u - D)
    dy = -u
    return dA, dQ, dR, dy


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _loglik_p(num_blocks, A, Q, R, H, y):
    ll, _ = loglik_fwd_aux(A, Q, R, H, y, num_blocks)
    return ll


def _fwd(num_blocks, A, Q, R, H, y):
    ll, aux = loglik_fwd_aux(A, Q, R, H, y, num_blocks)
    return ll, (A, Q, R, H, aux)


def _bwd(num_blocks, res, ct):
    A, Q, R, H, aux = res
    dA, dQ, dR, dy = loglik_bwd(A, Q, R, H, aux, num_blocks)
    ct = jnp.asarray(ct, A.dtype)
    return (ct * dA, ct * dQ, ct * dR, jnp.zeros_like(H), ct * dy)


_loglik_p.defvjp(_fwd, _bwd)


def blocked_loglik(lgssm: LGSSM, y, num_blocks: int = NUM_BLOCKS):
    """``blocked_logpdf`` with the closed-form disturbance-smoother VJP —
    the production gradient path for million-step hyperparameter training
    (``benchmarks/million_grad.py``).  Single observation column.

    H is treated as structural (zero cotangent): the emission row of a
    Matern(-sum) SDE does not depend on the hyperparameters
    (``ssm/markov.py::lgssm_of``)."""
    n = lgssm.num_steps
    R = jnp.broadcast_to(lgssm.R, (n,)).astype(lgssm.A.dtype)
    return _loglik_p(
        num_blocks, lgssm.A, lgssm.Q, R, lgssm.H.astype(lgssm.A.dtype), jnp.asarray(y)
    )
