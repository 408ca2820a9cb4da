"""Reference-parity API layer: each one-call function runs end-to-end and
agrees with the underlying engines."""

import jax
import jax.numpy as jnp
import numpy as np

from gpar_at_scale_tpu.api import (
    fit_gp,
    fit_gpar_conditional,
    get_gpar_scaled_predictions,
    get_optim_scaled_gpar_params,
    get_sde_predictions,
)
from gpar_at_scale_tpu.data.toy import generate_small_dataset
from gpar_at_scale_tpu.utils.params import pack_gp, pack_gpar


def test_get_sde_predictions(key, rng):
    t = np.sort(rng.uniform(0, 5, 50))
    y = np.sin(2 * t) + 0.1 * rng.normal(size=50)
    ts = np.linspace(0.5, 4.5, 20)
    mu, var = get_sde_predictions(
        key, t, y, ts, init_log_params=pack_gp(0.5, 1.0, 0.1), max_opt_steps=100
    )
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - np.sin(2 * ts)) ** 2)))
    assert rmse < 0.15, rmse
    assert np.all(np.asarray(var) > 0)


def test_scaled_params_and_predictions(key):
    ds = generate_small_dataset(seed=0)
    V = ds.y_obs[:, :1]
    Z = V[::3]
    params = get_optim_scaled_gpar_params(
        key, V, Z, ds.x, ds.y_obs[:, 1],
        init_log_params=pack_gpar(0.5, 1.0, 1.0, 1.0, 0.1), max_opt_steps=100,
    )
    assert len(params) == 5 and all(np.isfinite(params))
    assert 0.01 < params[-1] < 0.5  # noise sigma sane

    mu, sd = get_gpar_scaled_predictions(
        key, V, Z, ds.x, ds.y_obs[:, 1], ds.x, V,
        init_log_params=pack_gpar(0.5, 1.0, 1.0, 1.0, 0.1), max_opt_steps=100,
    )
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - ds.y_obs[:, 1]) ** 2)))
    assert rmse < 0.3, rmse
    assert np.all(np.asarray(sd) >= 0)


def test_fit_gp_and_conditional(key):
    ds = generate_small_dataset(seed=0)
    gp = fit_gp(key, ds.x, ds.y_obs[:, 0], init_log_params=pack_gp(0.3, 1.0, 0.1), backend="temporal")
    mu, _ = gp.predict(jnp.array(ds.x))
    assert float(np.max(np.abs(np.asarray(mu) - ds.y_obs[:, 0]))) < 0.3

    cond = fit_gpar_conditional(
        key, ds.x, ds.y_obs[:, :1], ds.y_obs[:, 1],
        init_log_params=pack_gpar(0.5, 1.0, 1.0, 1.0, 0.1), max_opt_steps=100,
    )
    mu, _ = cond.predict(jnp.array(ds.x), jnp.array(ds.y_obs[:, :1]))
    assert float(np.max(np.abs(np.asarray(mu) - ds.y_obs[:, 1]))) < 0.3
