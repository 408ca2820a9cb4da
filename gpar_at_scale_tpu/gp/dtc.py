"""DTC / pseudo-point sparse GP engine with temporal structured noise.

Capability parity with the reference's scaled-GPAR core
(``src/gp/dtc.jl``, ``src/gp/gpar_scaled_inference.jl``): the conditional GP
``f = f_x + f_t`` where f_x (over previous outputs) is approximated with M
inducing points and f_t (temporal) is exact through the LGSSM — the temporal
covariance K_time + s2*I acts as a *structured noise matrix* Sigma_y inside
the DTC collapsed bound, and every whitening solve Sigma_y^{-1/2} v runs as a
Kalman pass instead of a dense Cholesky.

Derivation (matching the reference's algebra, re-derived for the whitened
parameterization): with L = chol(K_uu), W the innovations whitener of
Sigma_y (so W^T W = Sigma_y^-1),

    alpha = W (y - m)                     ``src/gp/dtc.jl:106``
    beta  = W K_fu                        ``src/gp/dtc.jl:110-117``
    A     = L^-1 beta^T                   ``src/gp/dtc.jl:119``
    Lam   = A A^T + I                     ``src/gp/dtc.jl:120``
    dtc   = -1/2 [ N log 2pi + log det Sigma_y + log det Lam
                   + |alpha|^2 - |chol(Lam)^-1 A alpha|^2 ]   ``src/gp/dtc.jl:122-125``

and the whitened pseudo-point posterior (``compute_q_u``,
``src/gp/gpar_scaled_inference.jl:141-196``) is q(eps) = N(m_eps, D^-1) with
B = A, D = B B^T + I, m_eps = D^-1 B alpha; the predictive mean loads through
f_x = K_*u L^-T eps.

TPU-first upgrades over the reference (SURVEY.md §7):
  K1 fixed — log det Sigma_y comes from the Kalman scan's innovation
    variances (sum log S_k); the N x N noise matrix is never built.
  K6 fixed — all M+1 whitening solves run in ONE batched filter pass
    (the beta columns and alpha share the covariance recursion).
  K2 fixed — the predictive variance includes the smoother's own marginal
    variances (E[P] + Var[m]), and an exact analytic predictive is provided
    (the smoother is linear in its observations, so no MC needed).
  K4 fixed — the prior mean is subtracted consistently in both the objective
    and q(u).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.kernels.base import Kernel, _as_2d
from gpar_at_scale_tpu.ssm.kalman import kalman_filter, rts_smooth
from gpar_at_scale_tpu.ssm.markov import LGSSM, lgssm_of
from gpar_at_scale_tpu.utils.psd import cholesky_psd, solve_lower, solve_upper

_LOG_2PI = 1.8378770664093453


class DTCIntermediates(NamedTuple):
    """Shared quantities between the objective and q(u)."""

    alpha: jnp.ndarray  # (N,)   whitened residuals
    A: jnp.ndarray  # (M, N) L_uu^-1 (W K_fu)^T
    L_uu: jnp.ndarray  # (M, M) chol(K_uu)
    logdet_noise: jnp.ndarray  # scalar, log det Sigma_y from the scan


@jax.default_matmul_precision("highest")
def _whiten_all(out_kernel: Kernel, V, Z, lgssm: LGSSM, y, mean, uu_ridge, filter_fn=None):
    """One batched Kalman pass whitening [y - mean | K_fu columns].

    filter_fn: the Kalman filter implementation — ``kalman_filter``
    (sequential scan, default), ``pkalman.parallel_filter`` (associative
    scan, O(log N) depth; shardable over the time axis), or the string
    ``"pallas"`` (blocked-scan TPU kernels, f32, fastest; inference-only —
    no autodiff through the Pallas path yet)."""
    if filter_fn == "pallas":
        from gpar_at_scale_tpu.ops.pallas_whiten import pallas_whiten_columns

        V = _as_2d(V)
        Z = _as_2d(Z)
        y = jnp.asarray(y)
        m_ = Z.shape[0]
        Kfu = out_kernel(V, Z)
        Kuu = out_kernel(Z, Z)
        if uu_ridge is not None:
            Kuu = Kuu + uu_ridge * jnp.eye(m_, dtype=Kuu.dtype)
        L_uu = cholesky_psd(Kuu)
        batch = jnp.concatenate([(y - mean)[:, None], Kfu], axis=1)
        interp = jax.default_backend() != "tpu"  # CPU fallback: interpret mode
        _, white, logdet_noise = pallas_whiten_columns(lgssm, batch, interpret=interp)
        white = white.astype(Kfu.dtype)
        alpha = white[:, 0]
        A = solve_lower(L_uu, white[:, 1:].T)
        return DTCIntermediates(
            alpha=alpha, A=A, L_uu=L_uu, logdet_noise=logdet_noise.astype(Kfu.dtype)
        )
    if filter_fn is None:
        filter_fn = kalman_filter
    V = _as_2d(V)
    Z = _as_2d(Z)
    y = jnp.asarray(y)
    n = y.shape[0]
    m = Z.shape[0]

    Kfu = out_kernel(V, Z)  # (N, M)
    Kuu = out_kernel(Z, Z)  # (M, M)
    if uu_ridge is not None:
        Kuu = Kuu + uu_ridge * jnp.eye(m, dtype=Kuu.dtype)
    L_uu = cholesky_psd(Kuu)

    batch = jnp.concatenate([(y - mean)[:, None], Kfu], axis=1)  # (N, M+1)
    res = filter_fn(lgssm, batch)
    white = res.v / jnp.sqrt(res.S)[:, None]  # (N, M+1)
    alpha = white[:, 0]
    beta = white[:, 1:]  # (N, M)
    A = solve_lower(L_uu, beta.T)  # (M, N)
    logdet_noise = jnp.sum(jnp.log(res.S))
    return DTCIntermediates(alpha=alpha, A=A, L_uu=L_uu, logdet_noise=logdet_noise)


@jax.default_matmul_precision("highest")
def dtc_objective(
    out_kernel: Kernel,
    time_lgssm: LGSSM,
    V,
    Z,
    y,
    mean=0.0,
    uu_ridge: Optional[float] = None,
    filter_fn=None,
):
    """The DTC evidence bound (``compute_gpar_dtc_objective``,
    ``src/gp/dtc.jl:83-128``), O(N M^2) with O(N (M+1)) filter work.

    uu_ridge: optional ridge added to K_uu before factorization.  The
    reference adds the observation noise s2 here (its FiniteGP u carries
    noise, ``src/gp/dtc.jl:35``) but not in q(u) — pass ``noise_var`` to
    replicate; default None uses the engine-wide relative jitter only.
    """
    inter = _whiten_all(out_kernel, V, Z, time_lgssm, y, mean, uu_ridge, filter_fn)
    n = jnp.shape(jnp.asarray(y))[0]
    Lam = inter.A @ inter.A.T + jnp.eye(inter.A.shape[0], dtype=inter.A.dtype)
    L_lam = jnp.linalg.cholesky(Lam)
    Aalpha = inter.A @ inter.alpha
    w = solve_lower(L_lam, Aalpha)
    logdet_lam = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L_lam)))
    quad = jnp.sum(inter.alpha**2) - jnp.sum(w**2)
    return -0.5 * (n * _LOG_2PI + inter.logdet_noise + logdet_lam + quad)


class QU(NamedTuple):
    """Whitened pseudo-point posterior q(eps) = N(m_eps, D^-1), where the
    latent loads as f_x(.) = K_.u L_uu^-T eps  (``compute_q_u``,
    ``src/gp/gpar_scaled_inference.jl:141-196``)."""

    m_eps: jnp.ndarray  # (M,)
    L_D: jnp.ndarray  # (M, M) chol(D), D = A A^T + I
    L_uu: jnp.ndarray  # (M, M) chol(K_uu)
    Z: jnp.ndarray  # (M, D) inducing inputs

    def sample_eps(self, key, num_samples: int):
        """eps ~ N(m_eps, D^-1): eps = m_eps + L_D^-T xi."""
        xi = jax.random.normal(key, (self.m_eps.shape[0], num_samples), self.m_eps.dtype)
        return self.m_eps[:, None] + solve_upper(self.L_D, xi)


@jax.default_matmul_precision("highest")
def compute_q_u(
    out_kernel: Kernel,
    time_lgssm: LGSSM,
    V,
    Z,
    y,
    mean=0.0,
    uu_ridge: Optional[float] = None,
    filter_fn=None,
) -> QU:
    """Closed-form whitened posterior over inducing points.

    Unlike the reference (K4), the prior mean is subtracted from y here too
    (``src/gp/gpar_scaled_inference.jl:182`` TODO)."""
    inter = _whiten_all(out_kernel, V, Z, time_lgssm, y, mean, uu_ridge, filter_fn)
    M = inter.A.shape[0]
    D = inter.A @ inter.A.T + jnp.eye(M, dtype=inter.A.dtype)
    L_D = jnp.linalg.cholesky(D)
    # m_eps = D^-1 A alpha via two triangular solves.
    m_eps = solve_upper(L_D, solve_lower(L_D, inter.A @ inter.alpha))
    return QU(m_eps=m_eps, L_D=L_D, L_uu=inter.L_uu, Z=_as_2d(Z))


class ScaledPrediction(NamedTuple):
    mean: jnp.ndarray  # (N*,)
    var: jnp.ndarray  # (N*,) latent-function variance (no obs noise)


@jax.default_matmul_precision("highest")
def predict_scaled(
    out_kernel: Kernel,
    time_kernel: Kernel,
    qu: QU,
    V,
    t,
    y,
    t_star,
    V_star,
    noise_var,
    mean=0.0,
    *,
    key=None,
    num_samples: int = 0,
    dtype=jnp.float64,
    smooth_fn=None,
) -> ScaledPrediction:
    """Posterior predictive for f* = f_x* + f_t* at (t_star, V_star).

    Equivalent of ``get_gpar_scaled_predictions``'s prediction stage
    (``src/gp/gpar_scaled_inference.jl:74-135``): splice test times into the
    series with infinite observation noise, subtract the f_x sample, smooth
    the remainder with the temporal LGSSM, add f_x back.

    With ``num_samples == 0`` (default) the predictive is computed *exactly*:
    the RTS smoother is linear in its observations, so

        E[f*]   = fx_bar + S (y - fx_bar)
        Var[f*] = rowsum(((I - S) G)^2) + diag(P_smooth)

    where fx_bar = K_*u L^-T m_eps, G = K_*u L^-T L_D^-T (Cov[f_x] = G G^T),
    and S is the smoothing operator — replacing the reference's 100-sample MC
    loop (``src/gp/gpar_scaled_inference.jl:110-130``) and repairing its
    variance (K2: smoothed-mean spread only).  With ``num_samples > 0`` the
    reference's MC estimate is reproduced (plus the E[P] term), batched into
    a single smoothing pass over all samples.

    smooth_fn: RTS smoother implementation — ``rts_smooth`` (sequential,
    default), ``pkalman.parallel_smooth`` (associative scan, O(log N) depth)
    or a mesh-sharded smoother from ``parallel.seqshard``.
    """
    if smooth_fn is None:
        smooth_fn = rts_smooth
    V = _as_2d(V)
    V_star = _as_2d(V_star)
    t = jnp.asarray(t, dtype)
    t_star = jnp.asarray(t_star, dtype)
    y = jnp.asarray(y, dtype)
    n, n_star = t.shape[0], t_star.shape[0]

    # Concatenate train + test, sort by time (LGSSM needs ascending order).
    t_all = jnp.concatenate([t, t_star])
    V_all = jnp.concatenate([V, V_star], axis=0)
    y_all = jnp.concatenate([y - mean, jnp.zeros((n_star,), dtype)])
    noise_all = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(noise_var, dtype), (n,)), jnp.full((n_star,), 1e10, dtype)]
    )
    order = jnp.argsort(t_all)
    inv_order = jnp.argsort(order)
    t_s = t_all[order]
    V_s = V_all[order]
    y_s = y_all[order]
    noise_s = noise_all[order]

    lgssm = lgssm_of(time_kernel, t_s, noise_s, dtype)

    # f_x loading matrix Phi = K_*u L_uu^-T : f_x = Phi eps.
    K_su = out_kernel(V_s, qu.Z)  # (N_all, M)
    Phi = solve_lower(qu.L_uu, K_su.T).T  # K_*u L_uu^-T

    if num_samples <= 0:
        fx_bar = Phi @ qu.m_eps  # (N_all,)
        G = solve_lower(qu.L_D, Phi.T).T  # Phi L_D^-T; Cov[f_x] = G G^T
        cols = jnp.concatenate([(y_s - fx_bar)[:, None], G], axis=1)
        sm = smooth_fn(lgssm, cols)
        mean_all = fx_bar + sm.mean[:, 0]
        H = G - sm.mean[:, 1:]  # (I - S) G
        var_all = jnp.sum(H * H, axis=1) + sm.var
    else:
        if key is None:
            raise ValueError("num_samples > 0 requires a PRNG key")
        eps = qu.sample_eps(key, num_samples)  # (M, S)
        fx = Phi @ eps  # (N_all, S)
        sm = smooth_fn(lgssm, y_s[:, None] - fx)
        f = fx + sm.mean  # (N_all, S)
        mean_all = jnp.mean(f, axis=1)
        # K2 fix: sample spread of the smoothed means PLUS the smoother's own
        # marginal variance (shared across samples).
        var_all = jnp.var(f, axis=1) + sm.var

    mean_star = (mean + mean_all)[inv_order][n:]
    var_star = var_all[inv_order][n:]
    return ScaledPrediction(mean=mean_star, var=jnp.maximum(var_star, 0.0))


# ---------------------------------------------------------------------------
# Classic iid-noise sparse GP (no temporal structure) — the general-purpose
# sparse module: DTC collapsed bound and the Titsias ELBO (collapsed VI).
# ---------------------------------------------------------------------------


@jax.default_matmul_precision("highest")
def dtc_objective_iid(kernel: Kernel, V, Z, y, noise_var, mean=0.0):
    """Collapsed DTC bound with iid noise sigma^2 I (dense-free: O(N M^2)).

    log N(y | m, Q_ff + s2 I) with Q_ff = K_fu K_uu^-1 K_uf, computed via the
    Woodbury/matrix-determinant identities on the M x M system.
    """
    V = _as_2d(V)
    Z = _as_2d(Z)
    y = jnp.asarray(y)
    n = y.shape[0]
    s2 = jnp.asarray(noise_var)

    Kfu = kernel(V, Z)
    L_uu = cholesky_psd(kernel(Z, Z))
    A = solve_lower(L_uu, Kfu.T) / jnp.sqrt(s2)  # (M, N), A A^T = K_uu^-1/2 K_uf K_fu K_uu^-T/2 / s2
    Lam = A @ A.T + jnp.eye(A.shape[0], dtype=A.dtype)
    L_lam = jnp.linalg.cholesky(Lam)
    r = (y - mean) / jnp.sqrt(s2)
    Ar = A @ r
    w = solve_lower(L_lam, Ar)
    logdet = n * jnp.log(s2) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L_lam)))
    quad = jnp.sum(r * r) - jnp.sum(w * w)
    return -0.5 * (n * _LOG_2PI + logdet + quad)


@jax.default_matmul_precision("highest")
def titsias_elbo(kernel: Kernel, V, Z, y, noise_var, mean=0.0):
    """Titsias (2009) collapsed variational lower bound =
    DTC bound - 1/(2 s2) * trace(K_ff - Q_ff).

    The trace regularizer penalizes inducing-point configurations that drop
    prior variance — this is the "VI (Titsias-style collapsed bounds)"
    capability of the north star; the reference itself only has plain DTC.
    """
    V = _as_2d(V)
    Z = _as_2d(Z)
    s2 = jnp.asarray(noise_var)
    Kfu = kernel(V, Z)
    L_uu = cholesky_psd(kernel(Z, Z))
    U = solve_lower(L_uu, Kfu.T)  # (M, N)
    q_diag = jnp.sum(U * U, axis=0)  # diag(Q_ff)
    trace_term = jnp.sum(kernel.diag_part(V) - q_diag) / (2.0 * s2)
    return dtc_objective_iid(kernel, V, Z, y, noise_var, mean) - trace_term


@jax.default_matmul_precision("highest")
def predict_sparse_iid(kernel: Kernel, V, Z, y, noise_var, V_star, mean=0.0):
    """Sparse predictive (projected-process / Titsias q(u)-based) with iid
    noise: mean = K_*u Sigma^-1 K_uf y / s2, var = k_** - diag(K_*u (K_uu^-1 -
    Sigma^-1) K_u*) with Sigma = K_uu + K_uf K_fu / s2."""
    V = _as_2d(V)
    Z = _as_2d(Z)
    V_star = _as_2d(V_star)
    y = jnp.asarray(y)
    s2 = jnp.asarray(noise_var)

    Kfu = kernel(V, Z)
    L_uu = cholesky_psd(kernel(Z, Z))
    A = solve_lower(L_uu, Kfu.T) / jnp.sqrt(s2)  # (M, N)
    D = A @ A.T + jnp.eye(A.shape[0], dtype=A.dtype)
    L_D = jnp.linalg.cholesky(D)
    m_eps = solve_upper(L_D, solve_lower(L_D, A @ ((y - mean) / jnp.sqrt(s2))))

    K_su = kernel(V_star, Z)
    Phi = solve_lower(L_uu, K_su.T).T  # K_*u L_uu^-T
    mean_star = mean + Phi @ m_eps
    G = solve_lower(L_D, Phi.T).T  # Cov contribution G G^T
    # var = k_** - ||Phi||^2 + ||G||^2  (Nystrom minus, posterior plus)
    var_star = (
        kernel.diag_part(V_star) - jnp.sum(Phi * Phi, axis=1) + jnp.sum(G * G, axis=1)
    )
    return mean_star, jnp.maximum(var_star, 0.0)
