"""GPAR — Gaussian Process Autoregressive Regression, the model DSL.

The model class of the reference (SURVEY.md §0): P outputs where output i is
a conditional GP over ``(time, y_1, ..., y_{i-1})`` with the additive kernel
split k = k_time(t, t') + k_out(y, y').  Three likelihood backends:

* ``exact``    — dense Cholesky NLML + posterior (reference C2,
                 ``src/gp/optimized.jl``), O(N^3).
* ``temporal`` — output 1 only (1-D time input): LGSSM Kalman NLML +
                 smoothing prediction (reference C3,
                 ``src/gp/temporal_gp_inference.jl``), O(N).
* ``scaled``   — DTC pseudo-points over previous outputs x temporal LGSSM
                 noise (reference C4+C5, ``src/gp/dtc.jl`` +
                 ``src/gp/gpar_scaled_inference.jl``), O(N M^2).

Hyperparameters are optimized by jit-compiled L-BFGS on the exact gradient
(replacing Nelder-Mead, SURVEY.md §2b), with the reference's
``exp(p) + 1e-3`` positivity transform so optima are directly comparable.

Prediction follows the chained feed-forward of predicted means down the
output chain (``GPAR_examples/toy_example.jl:118-135``,
``examples/eeg.jl:193-207``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.gp import exact as exact_gp
from gpar_at_scale_tpu.gp.dtc import QU, compute_q_u, dtc_objective, predict_scaled
from gpar_at_scale_tpu.inference.optimize import OptResult, minimize_adam, minimize_lbfgs
from gpar_at_scale_tpu.kernels import Matern52, gpar_kernel, time_kernel_only
from gpar_at_scale_tpu.ssm.kalman import logpdf as ssm_logpdf
from gpar_at_scale_tpu.ssm.kalman import rts_smooth
from gpar_at_scale_tpu.ssm.markov import lgssm_of
from gpar_at_scale_tpu.ssm.pkalman import parallel_filter
from gpar_at_scale_tpu.utils.params import (
    init_gp_params,
    init_gpar_params,
    unpack_gp,
    unpack_gpar,
)


@dataclass(frozen=True)
class GPARConfig:
    """Per-model configuration (the reference's kwargs surface, SURVEY §5.6)."""

    time_family: Any = Matern52
    out_family: Any = Matern52
    backend: str = "exact"  # 'exact' | 'scaled'
    first_output_backend: str = "temporal"  # 'exact' | 'temporal'
    num_pseudo_points: int = 50  # scaled backend only
    max_opt_steps: int = 200
    optimizer: str = "lbfgs"  # 'lbfgs' | 'adam'
    dtype: Any = jnp.float64
    # 'sequential' | 'associative' (O(log N) depth) | 'pallas' (blocked-scan
    # TPU kernels: temporal NLML gradients via the disturbance-smoother VJP;
    # the DTC bound optimizes through the associative filter and switches to
    # the Pallas whitening kernel for the post-fit q(u)/predictions)
    filter_impl: str = "sequential"


def _minimize(cfg: GPARConfig, fun, x0) -> OptResult:
    if cfg.optimizer == "adam":
        return minimize_adam(fun, x0, max_steps=cfg.max_opt_steps)
    return minimize_lbfgs(fun, x0, max_steps=cfg.max_opt_steps)


# ---------------------------------------------------------------------------
# Single-conditional fits
# ---------------------------------------------------------------------------


@dataclass
class FittedGP:
    """First-of-chain GP on time only (reference ``create_optim_gp``,
    ``src/gp/optimized.jl:19-59``)."""

    params: jnp.ndarray  # (3,) log-params
    cfg: GPARConfig
    t: jnp.ndarray
    y: jnp.ndarray
    backend: str

    def hyperparams(self) -> Tuple:
        return tuple(float(v) for v in unpack_gp(self.params))

    def predict(self, t_star):
        l, ps, ns = unpack_gp(self.params)
        k = time_kernel_only(self.cfg.time_family, l, ps)
        nv = ns**2
        if self.backend == "temporal":
            return _temporal_predict(k, self.t, self.y, jnp.asarray(t_star, self.cfg.dtype), nv, self.cfg.dtype)
        post = exact_gp.condition(k, self.t[:, None], self.y, nv)
        return post.predict_f(jnp.asarray(t_star, self.cfg.dtype)[:, None])


def _temporal_predict(kernel, t, y, t_star, noise_var, dtype):
    """Splice test times with infinite noise and smooth (reference
    ``get_sde_predictions``, ``src/gp/temporal_gp_inference.jl:45-114``)."""
    n = t.shape[0]
    ns = t_star.shape[0]
    t_all = jnp.concatenate([t, t_star])
    y_all = jnp.concatenate([y, jnp.zeros((ns,), dtype)])
    noise_all = jnp.concatenate(
        [jnp.full((n,), noise_var, dtype), jnp.full((ns,), 1e10, dtype)]
    )
    order = jnp.argsort(t_all)
    inv = jnp.argsort(order)
    lgssm = lgssm_of(kernel, t_all[order], noise_all[order], dtype)
    sm = rts_smooth(lgssm, y_all[order])
    return sm.mean[inv][n:], sm.var[inv][n:]


def fit_first_output(key, t, y, cfg: GPARConfig, init_params=None) -> FittedGP:
    """Type-II ML for the 1-D-time GP; NLML via Kalman (O(N)) for the
    temporal backend, dense Cholesky for exact."""
    t = jnp.asarray(t, cfg.dtype)
    y = jnp.asarray(y, cfg.dtype)
    x0 = init_gp_params(key) if init_params is None else jnp.asarray(init_params, cfg.dtype)
    backend = cfg.first_output_backend
    if backend == "temporal":
        order = jnp.argsort(t)
        t_s, y_s = t[order], y[order]

        if cfg.filter_impl == "pallas":
            # Blocked-scan TPU filter with the disturbance-smoother custom
            # VJP (ops/pallas_grad.py): exact O(N) gradients, f32, d <= 3.
            from gpar_at_scale_tpu.ops.pallas_grad import logpdf_markov_pallas

            def nlml(p):
                l, ps, ns = unpack_gp(p)
                k = time_kernel_only(cfg.time_family, l, ps)
                return -logpdf_markov_pallas(k, t_s, ns**2, y_s)

        else:

            def nlml(p):
                l, ps, ns = unpack_gp(p)
                k = time_kernel_only(cfg.time_family, l, ps)
                return -ssm_logpdf(lgssm_of(k, t_s, ns**2, cfg.dtype), y_s)

    else:

        def nlml(p):
            l, ps, ns = unpack_gp(p)
            k = time_kernel_only(cfg.time_family, l, ps)
            return exact_gp.nlml(k, t[:, None], y, ns**2)

    res = _minimize(cfg, nlml, x0)
    return FittedGP(params=res.params, cfg=cfg, t=t, y=y, backend=backend)


@dataclass
class FittedConditional:
    """Conditional GP for output i >= 2 over inputs (t, y_1..y_{i-1})."""

    params: jnp.ndarray  # (5,) log-params
    cfg: GPARConfig
    t: jnp.ndarray  # (N,)
    X_prev: jnp.ndarray  # (N, i-1) previous-output features
    y: jnp.ndarray  # (N,)
    backend: str
    Z: Optional[jnp.ndarray] = None  # (M, i-1) inducing inputs (scaled)
    qu: Optional[QU] = None

    def hyperparams(self) -> Tuple:
        return tuple(float(v) for v in unpack_gpar(self.params))

    def _kernels(self):
        tl, ts, ol, osig, ns = unpack_gpar(self.params)
        input_dim = 1 + self.X_prev.shape[1]
        full_k = gpar_kernel(self.cfg.time_family, self.cfg.out_family, input_dim, tl, ts, ol, osig)
        time_k = time_kernel_only(self.cfg.time_family, tl, ts)
        out_k = self.cfg.out_family(lengthscale=ol, variance=osig**2)
        return full_k, time_k, out_k, ns**2

    def predict(self, t_star, X_prev_star):
        full_k, time_k, out_k, nv = self._kernels()
        t_star = jnp.asarray(t_star, self.cfg.dtype)
        X_prev_star = jnp.asarray(X_prev_star, self.cfg.dtype)
        if self.backend == "exact":
            X = jnp.concatenate([self.t[:, None], self.X_prev], axis=1)
            Xs = jnp.concatenate([t_star[:, None], X_prev_star], axis=1)
            post = exact_gp.condition(full_k, X, self.y, nv)
            return post.predict_f(Xs)
        # scaled
        pred = predict_scaled(
            out_k,
            time_k,
            self.qu,
            self.X_prev,
            self.t,
            self.y,
            t_star,
            X_prev_star,
            nv,
            dtype=self.cfg.dtype,
        )
        return pred.mean, pred.var


def _select_pseudo_points(X: jnp.ndarray, m: int) -> jnp.ndarray:
    """Evenly-strided subset of the inputs as inducing points (the reference
    uses grids or the inputs themselves, ``examples/GPAR_scaled_examples.jl:115``,
    ``examples/eeg.jl:217-220``)."""
    n = X.shape[0]
    if m >= n:
        return X
    idx = jnp.linspace(0, n - 1, m).astype(jnp.int32)
    return X[idx]


def fit_conditional(key, t, X_prev, y, cfg: GPARConfig, init_params=None) -> FittedConditional:
    """Type-II ML for one conditional GP (reference ``create_optim_gpar``
    exact path ``src/gp/optimized.jl:106-183``; scaled path
    ``get_optim_scaled_gpar_params`` ``src/gp/dtc.jl:11-77``)."""
    t = jnp.asarray(t, cfg.dtype)
    X_prev = jnp.asarray(X_prev, cfg.dtype)
    y = jnp.asarray(y, cfg.dtype)
    x0 = init_gpar_params(key) if init_params is None else jnp.asarray(init_params, cfg.dtype)
    input_dim = 1 + X_prev.shape[1]

    if cfg.backend == "exact":
        X = jnp.concatenate([t[:, None], X_prev], axis=1)

        def nlml(p):
            tl, ts, ol, osig, ns = unpack_gpar(p)
            k = gpar_kernel(cfg.time_family, cfg.out_family, input_dim, tl, ts, ol, osig)
            return exact_gp.nlml(k, X, y, ns**2)

        res = _minimize(cfg, nlml, x0)
        return FittedConditional(
            params=res.params, cfg=cfg, t=t, X_prev=X_prev, y=y, backend="exact"
        )

    # scaled backend: DTC objective with temporal structured noise.
    order = jnp.argsort(t)
    t_s, X_s, y_s = t[order], X_prev[order], y[order]
    Z = _select_pseudo_points(X_s, cfg.num_pseudo_points)

    def nlml(p):
        tl, ts, ol, osig, ns = unpack_gpar(p)
        time_k = time_kernel_only(cfg.time_family, tl, ts)
        out_k = cfg.out_family(lengthscale=ol, variance=osig**2)
        lgssm = lgssm_of(time_k, t_s, ns**2, cfg.dtype)
        # uu_ridge = s2 mirrors the reference (its FiniteGP u carries the
        # observation noise, src/gp/dtc.jl:35) and keeps chol(K_uu) stable
        # when the out-lengthscale grows and K_uu approaches rank one.
        # 'pallas' optimizes through the associative filter (the whitening
        # kernel has no autodiff path) and uses Pallas post-fit below.
        f_impl = parallel_filter if cfg.filter_impl in ("associative", "pallas") else None
        return -dtc_objective(out_k, lgssm, X_s, Z, y_s, uu_ridge=ns**2, filter_fn=f_impl)

    res = _minimize(cfg, nlml, x0)
    tl, ts, ol, osig, ns = unpack_gpar(res.params)
    time_k = time_kernel_only(cfg.time_family, tl, ts)
    out_k = cfg.out_family(lengthscale=ol, variance=osig**2)
    lgssm = lgssm_of(time_k, t_s, ns**2, cfg.dtype)
    if cfg.filter_impl == "pallas":
        f_impl = "pallas"
    elif cfg.filter_impl == "associative":
        f_impl = parallel_filter
    else:
        f_impl = None
    qu = compute_q_u(out_k, lgssm, X_s, Z, y_s, uu_ridge=ns**2, filter_fn=f_impl)
    return FittedConditional(
        params=res.params,
        cfg=cfg,
        t=t_s,
        X_prev=X_s,
        y=y_s,
        backend="scaled",
        Z=Z,
        qu=qu,
    )


# ---------------------------------------------------------------------------
# The chained model
# ---------------------------------------------------------------------------


@dataclass
class FittedGPAR:
    first: FittedGP
    conditionals: List[FittedConditional]

    @property
    def num_outputs(self) -> int:
        return 1 + len(self.conditionals)

    def predict(self, t_star):
        """Chained feed-forward prediction: output i conditions on the
        predicted means of outputs 1..i-1
        (``GPAR_examples/toy_example.jl:118-135``)."""
        t_star = jnp.asarray(t_star)
        means, variances = [], []
        mu1, var1 = self.first.predict(t_star)
        means.append(mu1)
        variances.append(var1)
        for cond in self.conditionals:
            X_prev_star = jnp.stack(means, axis=1)
            mu, var = cond.predict(t_star, X_prev_star)
            means.append(mu)
            variances.append(var)
        return jnp.stack(means, axis=1), jnp.stack(variances, axis=1)

    def hyperparams(self):
        return [self.first.hyperparams()] + [c.hyperparams() for c in self.conditionals]


def fit_gpar(key, t, Y, cfg: GPARConfig = GPARConfig(), init_params: Optional[Sequence] = None) -> FittedGPAR:
    """Fit the whole chain: output 1 on time, output i on (t, y_1..y_{i-1}).

    Equivalent of looping ``create_optim_gpar_post`` over outputs
    (``examples/eeg.jl:212-236``) / the scaled pipeline
    (``examples/GPAR_scaled_examples.jl:86-216``).
    """
    t = jnp.asarray(t, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    P = Y.shape[1]
    keys = jax.random.split(key, P)
    init_params = init_params or [None] * P

    first = fit_first_output(keys[0], t, Y[:, 0], cfg, init_params[0])
    conditionals = []
    for i in range(1, P):
        cond = fit_conditional(keys[i], t, Y[:, :i], Y[:, i], cfg, init_params[i])
        conditionals.append(cond)
    return FittedGPAR(first=first, conditionals=conditionals)
