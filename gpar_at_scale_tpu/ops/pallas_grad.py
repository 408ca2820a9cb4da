"""Differentiable Pallas log-likelihood: Fisher-identity custom VJP.

The blocked-scan kernels are not traced by JAX autodiff, but the score of an
LGSSM log-likelihood has a closed form in the *smoothed* moments (Fisher /
EM identity):  with the joint

    log p(x, y) = sum_k log N(x_k; A_k x_{k-1}, Q_k)
                + sum_k log N(y_k; H x_k, R_k),      H = e1^T, x_{-1} := 0,

the marginal score is the posterior expectation of the joint score:

    d ll / d A_k = Q_k^-1 (Xi_k - A_k Phi_{k-1})
    d ll / d Q_k = 1/2 (Q_k^-1 M_k Q_k^-1 - Q_k^-1)
    d ll / d R_k = 1/2 ((e_k^2 + H Ps_k H^T) / R_k^2 - 1 / R_k)
    d ll / d y_k = -e_k / R_k,         e_k = y_k - H ms_k

    Phi_k  = Ps_k + ms_k ms_k^T                   (smoothed second moment)
    Xi_k   = Ps_k E_{k-1}^T + ms_k ms_{k-1}^T     (lag-one cross moment;
             Cov(x_{k-1}, x_k | y) = E_{k-1} Ps_k with the smoother gain E)
    M_k    = Phi_k - A_k Xi_k^T - Xi_k A_k^T + A_k Phi_{k-1} A_k^T

so the VJP of ``ll = filter(A, Q, R, y)`` is ONE blocked-scan smoother pass
plus elementwise algebra — the same O(N) streaming cost as the forward pass.
Composes with JAX autodiff through ``ssm.markov.discretize`` (closed-form in
XLA), giving end-to-end hyperparameter gradients at 300+ M filter steps/s.

Caveats: f32; H = e1 (single Matern family, d <= 3).  RELIABLE FOR d = 1
(Matern12) ONLY: for d >= 2 the Q_k^-1-weighted terms amplify the f32 error
of the smoothed moments by the condition number of Q_k (corner entries are
O((lam dt)^{2p+1})), and measured gradients are wrong by orders of magnitude
at typical time gaps.  The stable reformulation is Koopman's disturbance
smoother (backward r/N recursions — no Q inverse), planned as the follow-up;
until then use SMC (gradient-free, ``benchmarks/million_smc.py``) or the
differentiable sequential/associative engines for d >= 2 gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.ops.pallas_kalman import pallas_decorrelate
from gpar_at_scale_tpu.ops.pallas_smoother import _batched_inv, pallas_smooth
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
    return lgssm_loglik(A, Q, R, y), (A, Q, R, y)


def _bwd(res, ct):
    A, Q, R, y = res
    d = A.shape[-1]
    lgssm = LGSSM(A=A, Q=Q, H=_h_row(A), R=R)
    interp = jax.default_backend() != "tpu"
    _, _, _, ms, Ps, E = pallas_smooth(lgssm, y, interpret=interp, return_state=True)

    def bmm(X, Y):
        return jnp.stack(
            [
                jnp.stack(
                    [sum(X[:, i, k] * Y[:, k, j] for k in range(d)) for j in range(d)], axis=-1
                )
                for i in range(d)
            ],
            axis=-2,
        )

    def bmmT(X, Y):
        return jnp.stack(
            [
                jnp.stack(
                    [sum(X[:, i, k] * Y[:, j, k] for k in range(d)) for j in range(d)], axis=-1
                )
                for i in range(d)
            ],
            axis=-2,
        )

    outer = lambda a, b: a[:, :, None] * b[:, None, :]

    Phi = Ps + outer(ms, ms)  # (N, d, d)
    ms_prev = jnp.concatenate([jnp.zeros((1, d), ms.dtype), ms[:-1]], axis=0)
    Phi_prev = jnp.concatenate([jnp.zeros((1, d, d), Ps.dtype), Phi[:-1]], axis=0)
    E_prev = jnp.concatenate([jnp.zeros((1, d, d), E.dtype), E[:-1]], axis=0)
    # Xi_k = E[x_k x_{k-1}^T] = Ps_k E_{k-1}^T + ms_k ms_{k-1}^T
    Xi = bmmT(Ps, E_prev) + outer(ms, ms_prev)

    Qinv = _batched_inv(Q, d)
    AXiT = bmmT(A, Xi)  # A_k Xi_k^T
    M = Phi - AXiT - jnp.swapaxes(AXiT, -1, -2) + bmmT(bmm(A, Phi_prev), A)

    dA = bmm(Qinv, Xi - bmm(A, Phi_prev))
    dQ = 0.5 * (bmm(bmm(Qinv, M), Qinv) - Qinv)
    e = y - ms[:, 0]
    dR = 0.5 * ((e * e + Ps[:, 0, 0]) / (R * R) - 1.0 / R)
    dy = -e / R

    ct = jnp.asarray(ct, A.dtype)
    return (ct * dA, ct * dQ, ct * dR, ct * dy)


lgssm_loglik.defvjp(_fwd, _bwd)


def logpdf_markov_pallas(kernel, t, noise_var, y):
    """Differentiable end-to-end: kernel hyperparams -> discretize (XLA
    autodiff) -> blocked-scan filter ll (custom VJP).  f32, d <= 3."""
    from gpar_at_scale_tpu.ssm.markov import lgssm_of

    lgssm = lgssm_of(kernel, jnp.asarray(t, jnp.float32), noise_var, jnp.float32)
    return lgssm_loglik(
        lgssm.A.astype(jnp.float32),
        lgssm.Q.astype(jnp.float32),
        lgssm.R.astype(jnp.float32),
        jnp.asarray(y, jnp.float32),
    )
