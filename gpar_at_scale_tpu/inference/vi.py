"""Collapsed variational inference (Titsias) for sparse GPs.

North-star capability "VI (Titsias-style collapsed bounds)" (BASELINE.json).
The collapsed bound itself lives in ``gp.dtc.titsias_elbo``; this module
optimizes it — jointly over kernel hyperparameters, noise, and (optionally)
the inducing-point locations Z — with the jit-compiled L-BFGS/Adam drivers.
The optimal q(u) is recovered in closed form afterwards, so there are no
variational parameters beyond Z (that is the point of the collapsed bound).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpar_at_scale_tpu.gp.dtc import predict_sparse_iid, titsias_elbo
from gpar_at_scale_tpu.inference.optimize import OptResult, minimize_adam, minimize_lbfgs
from gpar_at_scale_tpu.utils.params import unpack_gp


class SparseVIResult(NamedTuple):
    log_params: jnp.ndarray  # (3,) optimized (log_l, log_sigma_f, log_sigma_n)
    Z: jnp.ndarray  # (M, D) optimized inducing inputs
    elbo: jnp.ndarray  # final bound value
    num_steps: jnp.ndarray


def fit_sparse_vi(
    key,
    kernel_family,
    x,
    y,
    num_inducing: int,
    *,
    learn_inducing: bool = True,
    init_log_params=None,
    optimizer: str = "lbfgs",
    max_steps: int = 300,
) -> SparseVIResult:
    """Maximize the Titsias collapsed ELBO.

    Inducing points initialize to an even-strided subset of the inputs and
    (optionally) are optimized jointly with the hyperparameters — the bound's
    trace term makes this well-posed (unlike plain DTC, which can collapse
    inducing points onto each other).
    """
    x = jnp.atleast_2d(jnp.asarray(x))
    if x.shape[0] == 1 and jnp.ndim(y) == 1 and len(y) > 1:
        x = x.T
    y = jnp.asarray(y)
    n, D = x.shape
    m = min(num_inducing, n)
    idx = jnp.linspace(0, n - 1, m).astype(jnp.int32)
    Z0 = x[idx]
    p0 = (
        jnp.asarray(init_log_params, x.dtype)
        if init_log_params is not None
        else jax.random.normal(key, (3,), x.dtype) * 0.3
    )

    def unpack(theta):
        log_params = theta[:3]
        Z = theta[3:].reshape(m, D) if learn_inducing else Z0
        return log_params, Z

    def objective(theta):
        log_params, Z = unpack(theta)
        l, sf, sn = unpack_gp(log_params)
        k = kernel_family(lengthscale=l, variance=sf**2)
        return -titsias_elbo(k, x, Z, y, sn**2)

    theta0 = jnp.concatenate([p0, Z0.ravel()]) if learn_inducing else p0
    minimize = minimize_lbfgs if optimizer == "lbfgs" else minimize_adam
    res: OptResult = minimize(objective, theta0, max_steps=max_steps)
    log_params, Z = unpack(res.params)
    return SparseVIResult(
        log_params=log_params, Z=Z, elbo=-res.value, num_steps=res.num_steps
    )


def predict_sparse_vi(result: SparseVIResult, kernel_family, x, y, x_star):
    """Posterior predictive under the fitted sparse model."""
    l, sf, sn = unpack_gp(result.log_params)
    k = kernel_family(lengthscale=l, variance=sf**2)
    return predict_sparse_iid(k, x, result.Z, y, sn**2, x_star)
