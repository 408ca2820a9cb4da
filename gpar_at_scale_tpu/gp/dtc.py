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

Whitening backends (size-dispatched): the objective only consumes the
whitened *Gram* quantities

    aa = (y-m)^T Sigma^-1 (y-m),   g = K_fu^T Sigma^-1 (y-m),
    Gb = K_fu^T Sigma^-1 K_fu,     logdet Sigma

which any square root of Sigma^-1 produces identically.  Four engines:

* ``"dense"`` — chol(Sigma_y) + one triangular solve with M+1 right-hand
  sides: a single fused MXU op.  At N <= DENSE_N_MAX this is speed-of-light
  on TPU (the scan engines are latency-bound at small N).  Needs the time
  kernel + grid to materialize Sigma_y = K_time + diag(R) — O(N^2) memory,
  hence the size gate.
* sequential / associative Kalman (O(N) memory) — pass a filter callable.
* ``"pallas"`` — blocked-scan TPU kernels; differentiable via the batched
  disturbance-smoother VJP (``ops/pallas_grad.whiten_gram``).
* ``None`` — auto: dense when (time_kernel, t) are supplied and
  N <= DENSE_N_MAX, else the sequential scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.kernels.base import Kernel, _as_2d
from gpar_at_scale_tpu.ssm.kalman import kalman_filter, rts_smooth
from gpar_at_scale_tpu.ssm.markov import LGSSM, lgssm_of
from gpar_at_scale_tpu.utils.psd import (
    cho_solve,
    cholesky_psd,
    logdet_from_chol,
    solve_lower,
    solve_upper,
)

_LOG_2PI = 1.8378770664093453

# Largest N for which the auto-dispatched whitening/smoothing materializes the
# dense N x N temporal covariance: one Cholesky + a multi-RHS triangular solve
# is a single fused MXU op and beats any scan at small N, while O(N^2) memory
# caps it (2048^2 f32 = 16 MB, well inside VMEM-friendly HBM tiles).
DENSE_N_MAX = 2048


class DTCIntermediates(NamedTuple):
    """Whitened-Gram quantities shared between the objective and q(u).

    Every Sigma_y-dependence of the bound and of q(u) is through these — any
    square root of Sigma^-1 (innovations whitener, dense Cholesky) produces
    them identically."""

    aa: jnp.ndarray  # scalar (y-m)^T Sigma^-1 (y-m)
    g: jnp.ndarray  # (M,)   K_fu^T Sigma^-1 (y-m)
    Gb: jnp.ndarray  # (M, M) K_fu^T Sigma^-1 K_fu
    L_uu: jnp.ndarray  # (M, M) chol(K_uu)
    logdet_noise: jnp.ndarray  # scalar, log det Sigma_y


def _gram_from_white(white):
    """(N, M+1) whitened columns [alpha | beta] -> (aa, g, Gb)."""
    alpha = white[:, 0]
    beta = white[:, 1:]
    return jnp.dot(alpha, alpha), beta.T @ alpha, beta.T @ beta


def dense_whiten(time_kernel: Kernel, t, R, batch):
    """Dense whitening backend: chol(K_time + diag(R)) + triangular solve.

    Returns (white, logdet).  Mathematically identical to the Kalman
    whitening (both are square roots of Sigma_y^-1); one MXU op at small N —
    the size-dispatched fast path for the reference's EEG-scale workloads
    (N=156, ``examples/eeg.jl:27-28``)."""
    t = jnp.asarray(t)
    R = jnp.broadcast_to(jnp.asarray(R, t.dtype), (t.shape[0],))
    Sigma = time_kernel(t[:, None], t[:, None]) + jnp.diag(R)
    L = jnp.linalg.cholesky(Sigma)
    return solve_lower(L, batch), logdet_from_chol(L)


@jax.default_matmul_precision("highest")
def _whiten_all(
    out_kernel: Kernel,
    V,
    Z,
    lgssm: LGSSM,
    y,
    mean,
    uu_ridge,
    filter_fn=None,
    *,
    time_kernel=None,
    t=None,
):
    """Whiten [y - mean | K_fu columns] and reduce to Gram form.

    filter_fn selects the whitening engine:
      * ``None`` — auto: ``"dense"`` when (time_kernel, t) are given and
        N <= DENSE_N_MAX, ``"blocked"`` when they are given and N is larger,
        else the sequential ``kalman_filter``.
      * ``"dense"`` — chol(Sigma_y) backend (requires time_kernel + t).
      * ``"blocked"`` — the blocked two-pass XLA engine via the batched
        closed-form disturbance-smoother VJP
        (``ssm/blocked_grad.whiten_gram``): the production million-step
        training path; any state dim, general H.
      * ``"pallas"`` — blocked-scan TPU kernels with the batched
        disturbance-smoother VJP (differentiable; falls back to the
        associative engine for state dim > 3).
      * a callable — any ``(lgssm, Y) -> FilterResult`` (sequential,
        associative, or mesh-sharded).

    uu_ridge: ridge added to K_uu before factorization.  ``"auto"`` (default
    at the public entry points) uses mean(lgssm.R) — the reference's u
    FiniteGP carries the observation noise (``src/gp/dtc.jl:35``), and the
    ridge is REQUIRED for stability when inducing points coincide with
    inputs and the out-lengthscale grows (K_uu approaches rank one).
    """
    V = _as_2d(V)
    Z = _as_2d(Z)
    y = jnp.asarray(y)
    n = y.shape[0]
    m = Z.shape[0]

    Kfu = out_kernel(V, Z)  # (N, M)
    Kuu = out_kernel(Z, Z)  # (M, M)
    if uu_ridge == "auto":
        uu_ridge = jnp.mean(lgssm.R)
    if uu_ridge is not None:
        Kuu = Kuu + uu_ridge * jnp.eye(m, dtype=Kuu.dtype)
    batch = jnp.concatenate([(y - mean)[:, None], Kfu], axis=1)  # (N, M+1)

    if filter_fn is None and time_kernel is not None:
        if n <= DENSE_N_MAX:
            filter_fn = "dense"
        else:
            # Large N: the blocked two-pass engine — N/B sequential depth
            # with a B-way lockstep inner axis — through the batched
            # closed-form disturbance-smoother VJP ("blocked"), so
            # million-step DTC training never traces autodiff through the
            # scans (see ssm/blocked_grad.whiten_gram; plain jax.grad of the
            # fused batched filter is exact too but produces the program
            # class that stalls this sandbox's remote compile service at
            # N >= 1e6, and the associative engine fails to compile at
            # N >= 1e5 there).
            filter_fn = "blocked"

    if filter_fn == "blocked":
        from gpar_at_scale_tpu.ssm.blocked_grad import whiten_gram as _bwg

        L_uu = cholesky_psd(Kuu)
        G, logdet_noise = _bwg(lgssm, batch)
        G = G.astype(batch.dtype)
        logdet_noise = logdet_noise.astype(batch.dtype)
        aa, g, Gb = G[0, 0], G[1:, 0], G[1:, 1:]
    elif filter_fn == "dense":
        if time_kernel is None or t is None:
            raise ValueError("dense whitening requires time_kernel and t")
        t_d = jnp.asarray(t, batch.dtype)
        R = jnp.broadcast_to(jnp.asarray(lgssm.R, batch.dtype), (n,))
        Sigma = time_kernel(t_d[:, None], t_d[:, None]) + jnp.diag(R)
        from gpar_at_scale_tpu.utils.psd import _pallas_dense_ok, add_jitter

        if _pallas_dense_ok(Sigma, batch):
            # Opt-in (GPAR_PALLAS_DENSE=1): ONE fused Pallas launch
            # factorizes Sigma_y, whitens all M+1 columns, and returns
            # logdet.  Off by default — see ops/pallas_dense docstring for
            # the measured end-to-end trade-off vs XLA's pipelined linalg.
            from gpar_at_scale_tpu.ops.pallas_dense import chol_solve

            _, white, logdet_noise = chol_solve(Sigma, batch)
            L_uu = cholesky_psd(Kuu)
        elif m == n:
            # Pseudo-points == inputs (the reference's EEG setup,
            # ``examples/eeg.jl:217-220``): factorize Sigma_y and K_uu in ONE
            # batched Cholesky — small-matrix chol is latency-bound on TPU,
            # so halving the sequential chol count matters at N~150.
            Ls = jnp.linalg.cholesky(jnp.stack([Sigma, add_jitter(Kuu)]))
            L, L_uu = Ls[0], Ls[1]
            white = solve_lower(L, batch)
            logdet_noise = logdet_from_chol(L)
        else:
            L = jnp.linalg.cholesky(Sigma)
            L_uu = cholesky_psd(Kuu)
            white = solve_lower(L, batch)
            logdet_noise = logdet_from_chol(L)
        aa, g, Gb = _gram_from_white(white)
    elif filter_fn == "pallas":
        from gpar_at_scale_tpu.ops.pallas_grad import pallas_supported, whiten_gram

        L_uu = cholesky_psd(Kuu)
        if not pallas_supported(lgssm):
            # Sum-of-Matern SDEs (d > 3 or H != e1) exceed the unrolled
            # kernel algebra; dispatch to the associative engine.
            from gpar_at_scale_tpu.ssm.pkalman import parallel_filter

            res = parallel_filter(lgssm, batch)
            white = res.v / jnp.sqrt(res.S)[:, None]
            aa, g, Gb = _gram_from_white(white)
            logdet_noise = jnp.sum(jnp.log(res.S))
        else:
            G, logdet_noise = whiten_gram(lgssm, batch)
            G = G.astype(batch.dtype)
            logdet_noise = logdet_noise.astype(batch.dtype)
            aa, g, Gb = G[0, 0], G[1:, 0], G[1:, 1:]
    else:
        if filter_fn is None:
            filter_fn = kalman_filter
        L_uu = cholesky_psd(Kuu)
        res = filter_fn(lgssm, batch)
        white = res.v / jnp.sqrt(res.S)[:, None]  # (N, M+1)
        aa, g, Gb = _gram_from_white(white)
        logdet_noise = jnp.sum(jnp.log(res.S))

    return DTCIntermediates(aa=aa, g=g, Gb=Gb, L_uu=L_uu, logdet_noise=logdet_noise)


def _lam_chol(inter: DTCIntermediates):
    """chol(A A^T + I) with A A^T = L_uu^-1 Gb L_uu^-T from the Gram form."""
    AAt = solve_lower(inter.L_uu, solve_lower(inter.L_uu, inter.Gb).T)
    Lam = AAt + jnp.eye(AAt.shape[0], dtype=AAt.dtype)
    return jnp.linalg.cholesky(0.5 * (Lam + Lam.T))


@jax.default_matmul_precision("highest")
def dtc_objective(
    out_kernel: Kernel,
    time_lgssm: LGSSM,
    V,
    Z,
    y,
    mean=0.0,
    uu_ridge="auto",
    filter_fn=None,
    *,
    time_kernel=None,
    t=None,
):
    """The DTC evidence bound (``compute_gpar_dtc_objective``,
    ``src/gp/dtc.jl:83-128``), O(N M^2) with O(N (M+1)) filter work.

    uu_ridge: ridge added to K_uu before factorization.  The reference adds
    the observation noise s2 here (its FiniteGP u carries noise,
    ``src/gp/dtc.jl:35``); the default ``"auto"`` replicates that with
    mean(lgssm.R).  Pass None to disable (engine-wide relative jitter only —
    unstable when inducing points == inputs; see CLAUDE.md numerics notes).

    time_kernel, t: optional dense-whitening context — when given and
    N <= DENSE_N_MAX the whitening runs as one chol + triangular solve on
    the MXU instead of a scan (see ``_whiten_all``).
    """
    inter = _whiten_all(
        out_kernel, V, Z, time_lgssm, y, mean, uu_ridge, filter_fn,
        time_kernel=time_kernel, t=t,
    )
    n = jnp.shape(jnp.asarray(y))[0]
    # P-form of the bound: with P = Gb + K_uu,
    #   logdet Lam = logdet(L_uu^-1 P L_uu^-T) = logdet P - logdet K_uu
    #   |chol(Lam)^-1 L_uu^-1 g|^2 = g^T P^-1 g
    # — mathematically identical to the reference's A/Lam algebra
    # (``src/gp/dtc.jl:119-125``) but with no M x M-RHS triangular solves on
    # the hot path (they and their VJPs dominated the per-step wall-clock at
    # EEG scale; chol(P) follows Gb after one MXU matmul instead).
    # K_uu is reconstructed from its factor so both logdets share one
    # factorization's jitter.
    Kuu_r = inter.L_uu @ inter.L_uu.T
    L_P = jnp.linalg.cholesky(inter.Gb + Kuu_r)
    wp = solve_lower(L_P, inter.g)
    logdet_lam = logdet_from_chol(L_P) - logdet_from_chol(inter.L_uu)
    quad = inter.aa - jnp.sum(wp**2)
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
    uu_ridge="auto",
    filter_fn=None,
    *,
    time_kernel=None,
    t=None,
) -> QU:
    """Closed-form whitened posterior over inducing points.

    Unlike the reference (K4), the prior mean is subtracted from y here too
    (``src/gp/gpar_scaled_inference.jl:182`` TODO)."""
    inter = _whiten_all(
        out_kernel, V, Z, time_lgssm, y, mean, uu_ridge, filter_fn,
        time_kernel=time_kernel, t=t,
    )
    L_D = _lam_chol(inter)  # D = A A^T + I
    # m_eps = D^-1 A alpha via two triangular solves; A alpha = L_uu^-1 g.
    m_eps = cho_solve(L_D, solve_lower(inter.L_uu, inter.g))
    return QU(m_eps=m_eps, L_D=L_D, L_uu=inter.L_uu, Z=_as_2d(Z))


class _DenseSmooth(NamedTuple):
    mean: jnp.ndarray  # (N, B) posterior means of f_t per column
    var: jnp.ndarray  # (N,)   posterior marginal variances


def _dense_smoother(time_kernel: Kernel, t_s, noise_s):
    """Dense equivalent of the RTS smoother over the spliced series: standard
    GP conditioning E[f] = K (K + diag(noise))^-1 y, Var[f] = diag(K - K
    (K+D)^-1 K).  The infinite-noise test points (1e10 diag) make Sigma
    diagonally dominant there, so the Cholesky is well-conditioned.  One MXU
    chol + two matmuls — the serving fast path at N_all <= DENSE_N_MAX."""

    def smooth(lgssm, cols):
        del lgssm  # same temporal posterior, computed densely
        t2 = t_s[:, None]
        n_all = t_s.shape[0]
        K = time_kernel(t2, t2)
        Sigma = K + jnp.diag(jnp.broadcast_to(noise_s, (n_all,)))
        both = jnp.concatenate([K, cols], axis=1)
        from gpar_at_scale_tpu.utils.psd import _pallas_dense_ok

        if _pallas_dense_ok(Sigma, both):
            # Opt-in fused Pallas chol + all N+M+1 solves (ops/pallas_dense).
            from gpar_at_scale_tpu.ops.pallas_dense import chol_solve

            _, Wb, _ = chol_solve(Sigma, both)
        else:
            L = jnp.linalg.cholesky(Sigma)
            Wb = solve_lower(L, both)
        W = Wb[:, :n_all]  # L^-1 K: W^T W = K Sigma^-1 K
        mean = W.T @ Wb[:, n_all:]
        var = time_kernel.diag_part(t2) - jnp.sum(W * W, axis=0)
        return _DenseSmooth(mean=mean, var=jnp.maximum(var, 0.0))

    return smooth


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

    smooth_fn: RTS smoother implementation — ``None`` (auto: dense GP
    conditioning when N_all <= DENSE_N_MAX, else the sequential scan),
    ``"dense"``, ``rts_smooth``, ``pkalman.parallel_smooth`` (associative
    scan, O(log N) depth) or a mesh-sharded smoother from
    ``parallel.seqshard``.  All compute the same temporal posterior; the
    dense backend is one chol + matmuls on the MXU (the serving fast path).
    """
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

    if smooth_fn is None:
        if (n + n_star) <= DENSE_N_MAX:
            smooth_fn = "dense"
        else:
            from gpar_at_scale_tpu.ssm.blocked import blocked_smooth

            smooth_fn = blocked_smooth
    if smooth_fn == "dense":
        smooth_fn = _dense_smoother(time_kernel, t_s, noise_s)

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
