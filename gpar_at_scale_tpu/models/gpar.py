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
    init_gpar_params6,
    unpack_gp,
    unpack_gpar,
    unpack_gpar6,
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
    # Whitening/filter engine for the scaled backend:
    #   'auto'        — dense chol(Sigma_y) when N <= gp.dtc.DENSE_N_MAX
    #                   (one MXU op — fastest at EEG scale), associative scan
    #                   beyond (O(log N) depth).
    #   'dense'       — force the dense backend.
    #   'sequential'  — lax.scan Kalman filter (numerical oracle).
    #   'associative' — associative-scan filter.
    #   'pallas'      — blocked-scan TPU kernels; trains end-to-end via the
    #                   batched disturbance-smoother VJP (ops/pallas_grad).
    filter_impl: str = "auto"
    # Separate temporal/output observation noises (finishes reference defect
    # K4, ``src/gp/dtc.jl:18`` / ``src/gp/gpar_scaled_inference.jl:60``):
    # False (default) = the reference-parity shared-sigma 5-param pack;
    # True = 6-param pack with the temporal noise (LGSSM R) learned
    # separately from the output noise (K_uu ridge).  Scaled backend only.
    separate_noise: bool = False


def _minimize(cfg: GPARConfig, fun, x0) -> OptResult:
    if cfg.optimizer == "adam":
        return minimize_adam(fun, x0, max_steps=cfg.max_opt_steps)
    return minimize_lbfgs(fun, x0, max_steps=cfg.max_opt_steps)


def _unpack_cond(cfg: GPARConfig, p):
    """(time_l, time_sigma, out_l, out_sigma, noise_sigma, time_noise_sigma)
    for either pack: the shared-sigma 5-param mode aliases the temporal
    noise to the output noise (reference parity, K4)."""
    if cfg.separate_noise:
        return unpack_gpar6(p)
    tl, ts, ol, osig, ns = unpack_gpar(p)
    return tl, ts, ol, osig, ns, ns


def _init_cond_params(cfg: GPARConfig, key):
    return init_gpar_params6(key) if cfg.separate_noise else init_gpar_params(key)


def _filter_fn_of(cfg: GPARConfig):
    """Map GPARConfig.filter_impl to gp.dtc's filter_fn argument."""
    from gpar_at_scale_tpu.ssm.kalman import kalman_filter

    return {
        "auto": None,  # dense if small (context is always passed), else scan
        "dense": "dense",
        "sequential": kalman_filter,
        "associative": parallel_filter,
        "pallas": "pallas",
    }[cfg.filter_impl]


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
        unpack = unpack_gpar6 if self.cfg.separate_noise else unpack_gpar
        return tuple(float(v) for v in unpack(self.params))

    def _kernels(self):
        tl, ts, ol, osig, ns, tns = _unpack_cond(self.cfg, self.params)
        input_dim = 1 + self.X_prev.shape[1]
        full_k = gpar_kernel(self.cfg.time_family, self.cfg.out_family, input_dim, tl, ts, ol, osig)
        time_k = time_kernel_only(self.cfg.time_family, tl, ts)
        out_k = self.cfg.out_family(lengthscale=ol, variance=osig**2)
        # The predictive smoothing treats y - f_x = f_t + eps: its
        # observation noise is the TEMPORAL noise (== output noise in the
        # shared-sigma mode).
        return full_k, time_k, out_k, tns**2

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
    x0 = (
        _init_cond_params(cfg, key)
        if init_params is None
        else jnp.asarray(init_params, cfg.dtype)
    )
    input_dim = 1 + X_prev.shape[1]

    if cfg.backend == "exact":
        if cfg.separate_noise:
            raise ValueError("separate_noise applies to the scaled backend only")
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
    f_impl = _filter_fn_of(cfg)

    def nlml(p):
        tl, ts, ol, osig, ns, tns = _unpack_cond(cfg, p)
        time_k = time_kernel_only(cfg.time_family, tl, ts)
        out_k = cfg.out_family(lengthscale=ol, variance=osig**2)
        lgssm = lgssm_of(time_k, t_s, tns**2, cfg.dtype)
        # uu_ridge = s2 mirrors the reference (its FiniteGP u carries the
        # observation noise, src/gp/dtc.jl:35) and keeps chol(K_uu) stable
        # when the out-lengthscale grows and K_uu approaches rank one.  In
        # separate-noise mode the LGSSM carries the temporal noise tns and
        # the ridge carries the output noise ns (K4 finished).
        return -dtc_objective(
            out_k, lgssm, X_s, Z, y_s, uu_ridge=ns**2, filter_fn=f_impl,
            time_kernel=time_k, t=t_s,
        )

    res = _minimize(cfg, nlml, x0)
    tl, ts, ol, osig, ns, tns = _unpack_cond(cfg, res.params)
    time_k = time_kernel_only(cfg.time_family, tl, ts)
    out_k = cfg.out_family(lengthscale=ol, variance=osig**2)
    lgssm = lgssm_of(time_k, t_s, tns**2, cfg.dtype)
    qu = compute_q_u(
        out_k, lgssm, X_s, Z, y_s, uu_ridge=ns**2, filter_fn=f_impl,
        time_kernel=time_k, t=t_s,
    )
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


def fit_gpar(
    key,
    t,
    Y,
    cfg: GPARConfig = GPARConfig(),
    init_params: Optional[Sequence] = None,
    *,
    parallel: bool = False,
    mesh=None,
    mesh_axis: str = "chain",
) -> FittedGPAR:
    """Fit the whole chain: output 1 on time, output i on (t, y_1..y_{i-1}).

    Equivalent of looping ``create_optim_gpar_post`` over outputs
    (``examples/eeg.jl:212-236``) / the scaled pipeline
    (``examples/GPAR_scaled_examples.jl:86-216``).

    parallel=True fits all P-1 conditionals CONCURRENTLY: training of
    conditional i depends only on observed data (t, y_1..y_{i-1}, y_i) — only
    *prediction* is sequential down the chain
    (``GPAR_examples/toy_example.jl:118-135``).  The conditionals are vmapped
    over a zero-padded feature stack (stationary kernels ignore constant-zero
    padded dims: their pairwise distances are unchanged), batching all P-1
    optimizations into one MXU-friendly program; pass ``mesh`` to shard the
    conditional axis over devices (EP-style placement, SURVEY §2c).
    """
    t = jnp.asarray(t, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    P = Y.shape[1]
    keys = jax.random.split(key, P)
    init_params = init_params or [None] * P

    first = fit_first_output(keys[0], t, Y[:, 0], cfg, init_params[0])
    if parallel and P > 2:
        conditionals = fit_conditionals_parallel(
            keys[1:], t, Y, cfg, init_params[1:], mesh=mesh, mesh_axis=mesh_axis
        )
    else:
        conditionals = [
            fit_conditional(keys[i], t, Y[:, :i], Y[:, i], cfg, init_params[i])
            for i in range(1, P)
        ]
    return FittedGPAR(first=first, conditionals=conditionals)


def fit_conditionals_parallel(
    keys,
    t,
    Y,
    cfg: GPARConfig,
    init_params: Optional[Sequence] = None,
    *,
    mesh=None,
    mesh_axis: str = "chain",
) -> List[FittedConditional]:
    """Fit conditionals 2..P concurrently (scaled backend: DTC bound; exact
    backend: dense NLML), vmapped over a zero-padded feature stack.

    Width-padding correctness: conditional i sees features (y_1..y_{i-1}, 0,
    ..., 0) in both V and Z, so every pairwise squared distance — the only
    thing stationary kernels consume — is identical to the unpadded problem.

    With ``mesh`` and (P-1) divisible by the ``mesh_axis`` size, the stacked
    conditional axis is device-sharded, so each device group optimizes its
    own subset — wall-clock ~flat in P (VERDICT r1 item 5).
    """
    if cfg.separate_noise and cfg.backend == "exact":
        raise ValueError("separate_noise applies to the scaled backend only")
    t = jnp.asarray(t, cfg.dtype)
    Y = jnp.asarray(Y, cfg.dtype)
    n, P = Y.shape
    width = P - 1
    order = jnp.argsort(t)
    t_s, Y_s = t[order], Y[order]

    Xs = jnp.stack(
        [
            jnp.concatenate([Y_s[:, :i], jnp.zeros((n, width - i), cfg.dtype)], axis=1)
            for i in range(1, P)
        ]
    )  # (P-1, N, width)
    ys = Y_s[:, 1:].T  # (P-1, N)
    if cfg.backend == "scaled":
        m = min(cfg.num_pseudo_points, n)
        idx = (
            jnp.linspace(0, n - 1, m).astype(jnp.int32) if m < n else jnp.arange(n)
        )  # same stride per conditional (matches _select_pseudo_points)
        Zs = Xs[:, idx, :]
    else:
        Zs = Xs[:, :1, :]  # placeholder (unused by the exact branch)

    if init_params is not None and any(p is not None for p in init_params):
        x0s = jnp.stack(
            [jnp.asarray(p, cfg.dtype) for p in init_params]
        )
    else:
        init_one = init_gpar_params6 if cfg.separate_noise else init_gpar_params
        x0s = jax.vmap(init_one)(jnp.asarray(keys))
    x0s = x0s.astype(cfg.dtype)

    f_impl = _filter_fn_of(cfg)
    input_dim = 1 + width

    def nlml(p, Xp, Zp, yp):
        tl, ts, ol, osig, ns, tns = _unpack_cond(cfg, p)
        if cfg.backend == "exact":
            k = gpar_kernel(cfg.time_family, cfg.out_family, input_dim, tl, ts, ol, osig)
            Xfull = jnp.concatenate([t_s[:, None], Xp], axis=1)
            return exact_gp.nlml(k, Xfull, yp, ns**2)
        time_k = time_kernel_only(cfg.time_family, tl, ts)
        out_k = cfg.out_family(lengthscale=ol, variance=osig**2)
        lgssm = lgssm_of(time_k, t_s, tns**2, cfg.dtype)
        return -dtc_objective(
            out_k, lgssm, Xp, Zp, yp, uu_ridge=ns**2, filter_fn=f_impl,
            time_kernel=time_k, t=t_s,
        )

    def one(x0, Xp, Zp, yp):
        res = _minimize(cfg, lambda p: nlml(p, Xp, Zp, yp), x0)
        if cfg.backend == "exact":
            return res.params, None
        tl, ts, ol, osig, ns, tns = _unpack_cond(cfg, res.params)
        time_k = time_kernel_only(cfg.time_family, tl, ts)
        out_k = cfg.out_family(lengthscale=ol, variance=osig**2)
        lgssm = lgssm_of(time_k, t_s, tns**2, cfg.dtype)
        qu = compute_q_u(
            out_k, lgssm, Xp, Zp, yp, uu_ridge=ns**2, filter_fn=f_impl,
            time_kernel=time_k, t=t_s,
        )
        return res.params, (qu.m_eps, qu.L_D, qu.L_uu)

    run = jax.jit(jax.vmap(one))
    if mesh is not None and (P - 1) % mesh.shape[mesh_axis] == 0:
        from jax.sharding import NamedSharding, PartitionSpec as Ps

        shard = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
        x0s = shard(x0s, Ps(mesh_axis, None))
        Xs = shard(Xs, Ps(mesh_axis, None, None))
        Zs = shard(Zs, Ps(mesh_axis, None, None))
        ys = shard(ys, Ps(mesh_axis, None))
    params_all, qu_all = run(x0s, Xs, Zs, ys)

    conditionals = []
    for i in range(1, P):
        j = i - 1
        X_prev = Y_s[:, :i]
        if cfg.backend == "exact":
            cond = FittedConditional(
                params=params_all[j], cfg=cfg, t=t_s, X_prev=X_prev,
                y=Y_s[:, i], backend="exact",
            )
        else:
            Z_i = Zs[j][:, :i]  # drop zero padding
            qu = QU(
                m_eps=qu_all[0][j], L_D=qu_all[1][j], L_uu=qu_all[2][j], Z=Z_i
            )
            cond = FittedConditional(
                params=params_all[j], cfg=cfg, t=t_s, X_prev=X_prev,
                y=Y_s[:, i], backend="scaled", Z=Z_i, qu=qu,
            )
        conditionals.append(cond)
    return conditionals
