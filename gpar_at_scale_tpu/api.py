"""Reference-parity convenience API.

One-call functions mirroring the reference's exported surface (SURVEY.md §1
"L4 -> L3 interface") so a user of the Julia package finds every entry point
under the analogous name.  Each maps onto the richer class-based API in
``models/`` / ``gp/`` / ``ssm/``.

Reference export                     -> here
---------------------------------------------------------------------------
create_optim_gp / _post              -> fit_gp            (posterior incl.)
create_optim_gpar / _post            -> fit_gpar_conditional
create_lgssm                         -> gpar_at_scale_tpu.ssm.lgssm_of
get_sde_predictions                  -> get_sde_predictions
get_optim_scaled_gpar_params         -> get_optim_scaled_gpar_params
compute_gpar_dtc_objective           -> gpar_at_scale_tpu.gp.dtc_objective
get_gpar_scaled_predictions          -> get_gpar_scaled_predictions
compute_q_u                          -> gpar_at_scale_tpu.gp.compute_q_u
generate_small/big_dataset           -> gpar_at_scale_tpu.data.*
to_ColVecs                           -> plain (N, D) arrays (row = point)
unpack_gp / unpack_gpar / parse_*    -> gpar_at_scale_tpu.utils.*
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from gpar_at_scale_tpu.kernels import Matern52
from gpar_at_scale_tpu.models.gpar import (
    GPARConfig,
    fit_conditional,
    fit_first_output,
)
from gpar_at_scale_tpu.utils.params import unpack_gp, unpack_gpar


def fit_gp(
    key,
    input_locations,
    outputs,
    *,
    kernel_family=Matern52,
    init_log_params=None,
    backend: str = "exact",
    max_opt_steps: int = 200,
):
    """Type-II-ML GP on 1-D inputs + posterior — ``create_optim_gp_post``
    (``src/gp/optimized.jl:76-97``).  Returns the fitted model; call
    ``.predict(t_star)`` for marginals and ``.hyperparams()`` for
    (l, process_sigma, noise_sigma)."""
    cfg = GPARConfig(
        time_family=kernel_family, first_output_backend=backend, max_opt_steps=max_opt_steps
    )
    return fit_first_output(key, input_locations, outputs, cfg, init_log_params)


def fit_gpar_conditional(
    key,
    time_locations,
    prev_outputs,
    outputs,
    *,
    time_family=Matern52,
    out_family=Matern52,
    backend: str = "exact",
    num_pseudo_points: int = 50,
    init_log_params=None,
    max_opt_steps: int = 200,
):
    """One conditional GP of the chain over (t, y_prev) —
    ``create_optim_gpar_post`` (``src/gp/optimized.jl:201-239``) for
    backend='exact', the scaled pipeline for backend='scaled'."""
    cfg = GPARConfig(
        time_family=time_family,
        out_family=out_family,
        backend=backend,
        num_pseudo_points=num_pseudo_points,
        max_opt_steps=max_opt_steps,
    )
    return fit_conditional(key, time_locations, prev_outputs, outputs, cfg, init_log_params)


def get_sde_predictions(
    key,
    data_locations,
    data_outputs,
    output_locations,
    *,
    kernel_family=Matern52,
    init_log_params=None,
    max_opt_steps: int = 200,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """O(N) temporal-GP regression: optimize hyperparams via the Kalman NLML,
    then predict at ``output_locations`` via the infinite-noise splice —
    ``get_sde_predictions`` (``src/gp/temporal_gp_inference.jl:45-114``).
    Returns (means, variances) at the output locations."""
    fit = fit_gp(
        key,
        data_locations,
        data_outputs,
        kernel_family=kernel_family,
        init_log_params=init_log_params,
        backend="temporal",
        max_opt_steps=max_opt_steps,
    )
    return fit.predict(output_locations)


def get_optim_scaled_gpar_params(
    key,
    input_locations,
    pseudo_input_locations,
    time_loc,
    outputs,
    *,
    out_family=Matern52,
    time_family=Matern52,
    init_log_params=None,
    max_opt_steps: int = 200,
):
    """Optimize the 5 shared hyperparameters of the scaled conditional via
    the DTC bound — ``get_optim_scaled_gpar_params`` (``src/gp/dtc.jl:11-77``).
    Returns (time_l, time_sigma, out_l, out_sigma, noise_sigma)."""
    from gpar_at_scale_tpu.gp.dtc import dtc_objective
    from gpar_at_scale_tpu.inference.optimize import minimize_lbfgs
    from gpar_at_scale_tpu.kernels import time_kernel_only
    from gpar_at_scale_tpu.ssm.markov import lgssm_of
    from gpar_at_scale_tpu.utils.params import init_gpar_params

    t = jnp.asarray(time_loc, jnp.float64)
    order = jnp.argsort(t)
    t_s = t[order]
    V = jnp.atleast_2d(jnp.asarray(input_locations, jnp.float64))
    if V.shape[0] != t.shape[0]:
        V = V.T
    V_s = V[order]
    y_s = jnp.asarray(outputs, jnp.float64)[order]
    Z = jnp.atleast_2d(jnp.asarray(pseudo_input_locations, jnp.float64))
    if Z.shape[1] != V.shape[1]:
        Z = Z.T

    x0 = (
        jnp.asarray(init_log_params, jnp.float64)
        if init_log_params is not None
        else init_gpar_params(key)
    )

    def nlml(p):
        tl, ts, ol, osig, ns = unpack_gpar(p)
        time_k = time_kernel_only(time_family, tl, ts)
        out_k = out_family(lengthscale=ol, variance=osig**2)
        lgssm = lgssm_of(time_k, t_s, ns**2)
        return -dtc_objective(out_k, lgssm, V_s, Z, y_s, uu_ridge=ns**2)

    res = minimize_lbfgs(nlml, x0, max_steps=max_opt_steps)
    return tuple(float(v) for v in unpack_gpar(res.params))


def get_gpar_scaled_predictions(
    key,
    input_locations,
    pseudo_input_locations,
    time_loc,
    outputs,
    inference_time_loc,
    inference_input_locations,
    *,
    out_family=Matern52,
    time_family=Matern52,
    init_log_params=None,
    max_opt_steps: int = 200,
    num_samples: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """End-to-end scaled pipeline: optimize via DTC, compute q(u), predict —
    ``get_gpar_scaled_predictions`` (``src/gp/gpar_scaled_inference.jl:20-136``).
    ``num_samples=0`` uses the exact analytic predictive (reference used 100
    MC samples); returns (means, stds) at the inference locations."""
    from gpar_at_scale_tpu.gp.dtc import compute_q_u, predict_scaled
    from gpar_at_scale_tpu.kernels import time_kernel_only
    from gpar_at_scale_tpu.ssm.markov import lgssm_of

    tl, ts, ol, osig, ns = get_optim_scaled_gpar_params(
        key,
        input_locations,
        pseudo_input_locations,
        time_loc,
        outputs,
        out_family=out_family,
        time_family=time_family,
        init_log_params=init_log_params,
        max_opt_steps=max_opt_steps,
    )
    time_k = time_kernel_only(time_family, tl, ts)
    out_k = out_family(lengthscale=ol, variance=osig**2)
    nv = ns**2

    t = jnp.asarray(time_loc, jnp.float64)
    order = jnp.argsort(t)
    t_s = t[order]
    V = jnp.atleast_2d(jnp.asarray(input_locations, jnp.float64))
    if V.shape[0] != t.shape[0]:
        V = V.T
    V_s = V[order]
    y_s = jnp.asarray(outputs, jnp.float64)[order]
    Z = jnp.atleast_2d(jnp.asarray(pseudo_input_locations, jnp.float64))
    if Z.shape[1] != V.shape[1]:
        Z = Z.T

    lgssm = lgssm_of(time_k, t_s, nv)
    qu = compute_q_u(out_k, lgssm, V_s, Z, y_s, uu_ridge=nv)
    pred = predict_scaled(
        out_k,
        time_k,
        qu,
        V_s,
        t_s,
        y_s,
        jnp.asarray(inference_time_loc, jnp.float64),
        jnp.atleast_2d(jnp.asarray(inference_input_locations, jnp.float64)),
        nv,
        key=key,
        num_samples=num_samples,
    )
    return pred.mean, jnp.sqrt(pred.var)
