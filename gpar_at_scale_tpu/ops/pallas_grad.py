"""Differentiable Pallas log-likelihood: disturbance-smoother custom VJP.

The blocked-scan kernels are not traced by JAX autodiff; instead the VJP of
``ll = filter(A, Q, R, y)`` is computed in closed form from the filter's own
per-step outputs via the De Jong / Koopman disturbance smoother.  With the
model

    x_k = A_k x_{k-1} + w_k, w_k ~ N(0, Q_k), x_{-1} := 0,
    y_k = H x_k + v_k,       v_k ~ N(0, R_k),          H = e1^T,

and filter quantities e_k (innovation), S_k, K_k, filtered (m_k, P_k), run
the backward r/N recursions (r_n = 0, N_n = 0)

    C_k = (I - K_k H)^T A_{k+1}^T
    r_k = H^T e_k / S_k + C_k r_{k+1}
    N_k = H^T H / S_k   + C_k N_{k+1} C_k^T .

Then r_k is the adjoint of the predicted mean and sym(Pbar_k) =
1/2 (r_k r_k^T - N_k) the adjoint of the predicted covariance
Pp_k = A_k P_{k-1} A_k^T + Q_k, giving the exact score

    d ll / d Q_k = 1/2 (r_k r_k^T - N_k)
    d ll / d A_k = (r_k r_k^T - N_k) A_k P_{k-1} + r_k m_{k-1}^T
    d ll / d R_k = 1/2 (u_k^2 - D_k)
    d ll / d y_k = -u_k

    u_k = e_k / S_k - (A_{k+1} K_k)^T r_{k+1}      (smoothed obs disturbance)
    D_k = 1 / S_k + (A_{k+1} K_k)^T N_{k+1} (A_{k+1} K_k) .

Unlike the EM/Fisher identity (smoothed second moments weighted by Q_k^-1),
nothing here inverts Q or Pp — the only divisions are by the innovation
variance S_k — so the gradient is f32-stable for all d <= 3 (Matern 1/2,
3/2, 5/2), including the near-singular Q_k of small time gaps.

The r/N recursion is affine + congruence — exactly the algebraic shape of
the RTS smoothing combine — so it runs on the shared blocked-scan backward
engine (``pallas_smoother.pallas_suffix_scan``): one streaming forward
filter + one streaming backward pass, O(N) total, O(log LANES) critical
path.  Composes with JAX autodiff through ``ssm.markov.discretize``
(closed-form in XLA), giving end-to-end hyperparameter gradients at
hundreds of millions of filter steps/s.

Replaces the reference's derivative-free Nelder-Mead choice
(``src/gp/dtc.jl:58-61``; Zygote imported but unused,
``src/GPARatScale.jl:2``) with exact O(N) gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.ops.pallas_kalman import pallas_decorrelate
from gpar_at_scale_tpu.ops.pallas_smoother import (
    _bmm,
    _bmmT,
    _bmv,
    pallas_suffix_scan,
)
from gpar_at_scale_tpu.ssm.markov import LGSSM


@jax.custom_vjp
def lgssm_loglik(A, Q, R, y):
    """log N(y | 0, Sigma(A, Q, R)) via the blocked-scan filter (f32)."""
    lgssm = LGSSM(A=A, Q=Q, H=_h_row(A), R=R)
    interp = jax.default_backend() != "tpu"
    ll, _, _ = pallas_decorrelate(lgssm, y, interpret=interp)
    return ll


def _h_row(A):
    d = A.shape[-1]
    return jnp.zeros((d,), A.dtype).at[0].set(1.0)


def _fwd(A, Q, R, y):
    lgssm = LGSSM(A=A, Q=Q, H=_h_row(A), R=R)
    interp = jax.default_backend() != "tpu"
    ll, alpha, _, S, K, m, P = pallas_decorrelate(
        lgssm, y, interpret=interp, return_full=True
    )
    return ll, (A, Q, R, alpha, S, K, m, P)


def _bwd(res, ct):
    A, Q, R, alpha, S, K, m, P = res
    n, d = K.shape
    f32 = jnp.float32
    interp = jax.default_backend() != "tpu"

    e = alpha * jnp.sqrt(S)  # innovations (phase 3 emits alpha = e/sqrt(S))
    A_next = jnp.concatenate([A[1:].astype(f32), jnp.zeros((1, d, d), f32)])

    # r/N elements: C_k = (I - K_k H)^T A_{k+1}^T = (A_{k+1}(I - K_k H))^T
    e1 = jnp.zeros((d,), f32).at[0].set(1.0)
    ImKH = jnp.eye(d, dtype=f32)[None] - K[:, :, None] * e1[None, None, :]
    C = jnp.swapaxes(_bmm(A_next, ImKH), -1, -2)
    b = (e / S)[:, None] * e1[None, :]
    W = (1.0 / S)[:, None, None] * (e1[:, None] * e1[None, :])[None]

    r, N = pallas_suffix_scan(C, b, W, interpret=interp)

    outer = lambda a, bb: a[:, :, None] * bb[:, None, :]
    rrN = outer(r, r) - N  # 2 * Pbar_k

    # dQ_k = Pbar_k
    dQ = 0.5 * rrN
    # dA_k = 2 Pbar_k A_k P_{k-1} + r_k m_{k-1}^T   (m_{-1} = 0, P_{-1} = 0)
    m_prev = jnp.concatenate([jnp.zeros((1, d), f32), m[:-1].astype(f32)])
    P_prev = jnp.concatenate([jnp.zeros((1, d, d), f32), P[:-1].astype(f32)])
    dA = _bmm(rrN, _bmm(A.astype(f32), P_prev)) + outer(r, m_prev)

    # dR_k, dy_k from the smoothed observation disturbance
    r_next = jnp.concatenate([r[1:], jnp.zeros((1, d), f32)])
    N_next = jnp.concatenate([N[1:], jnp.zeros((1, d, d), f32)])
    AK = _bmv(A_next, K.astype(f32))  # A_{k+1} K_k
    u = e / S - jnp.sum(AK * r_next, axis=-1)
    D = 1.0 / S + jnp.sum(AK * _bmv(N_next, AK), axis=-1)
    dR = 0.5 * (u * u - D)
    dy = -u

    ct = jnp.asarray(ct, f32)
    return (
        (ct * dA).astype(A.dtype),
        (ct * dQ).astype(Q.dtype),
        (ct * dR).astype(R.dtype),
        (ct * dy).astype(jnp.result_type(dy)),
    )


lgssm_loglik.defvjp(_fwd, _bwd)


def logpdf_markov_pallas(kernel, t, noise_var, y):
    """Differentiable end-to-end: kernel hyperparams -> discretize (XLA
    autodiff) -> blocked-scan filter ll (disturbance-smoother custom VJP).
    f32, d <= 3."""
    from gpar_at_scale_tpu.ssm.markov import lgssm_of

    lgssm = lgssm_of(kernel, jnp.asarray(t, jnp.float32), noise_var, jnp.float32)
    return lgssm_loglik(
        lgssm.A.astype(jnp.float32),
        lgssm.Q.astype(jnp.float32),
        lgssm.R.astype(jnp.float32),
        jnp.asarray(y, jnp.float32),
    )
