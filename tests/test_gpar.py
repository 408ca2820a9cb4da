"""End-to-end GPAR: fit + chained prediction on the toy datasets.

Mirrors the reference's examples-as-tests (``GPAR_examples/toy_example.jl``,
``examples/GPAR_scaled_examples.jl``) with actual assertions against the
known true functions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.data.toy import generate_small_dataset
from gpar_at_scale_tpu.models.gpar import (
    GPARConfig,
    fit_conditional,
    fit_first_output,
    fit_gpar,
)
from gpar_at_scale_tpu.utils.params import pack_gp, pack_gpar


@pytest.fixture(scope="module")
def small_data():
    return generate_small_dataset(seed=0)


def test_first_output_temporal_fit(small_data, key):
    ds = small_data
    cfg = GPARConfig(first_output_backend="temporal", max_opt_steps=100)
    fit = fit_first_output(key, ds.x, ds.y_obs[:, 0], cfg, init_params=pack_gp(0.3, 1.0, 0.1))
    l, ps, ns = fit.hyperparams()
    assert 0.0 < ns < 0.3  # noise near the true 0.05 scale
    mu, var = fit.predict(jnp.array(ds.x))
    # interpolates training data well
    err = np.max(np.abs(np.asarray(mu) - ds.y_obs[:, 0]))
    assert err < 0.25, err


def test_first_output_pallas_matches_sequential(small_data, key):
    """filter_impl='pallas': temporal NLML optimized through the blocked-scan
    filter's disturbance-smoother VJP lands on the same optimum (f32)."""
    ds = small_data
    init = pack_gp(0.3, 1.0, 0.1)
    cfg_s = GPARConfig(first_output_backend="temporal", max_opt_steps=100)
    cfg_p = GPARConfig(
        first_output_backend="temporal",
        max_opt_steps=100,
        filter_impl="pallas",
        dtype=jnp.float32,
    )
    fit_s = fit_first_output(key, ds.x, ds.y_obs[:, 0], cfg_s, init_params=init)
    fit_p = fit_first_output(key, ds.x, ds.y_obs[:, 0], cfg_p, init_params=init)
    np.testing.assert_allclose(fit_p.hyperparams(), fit_s.hyperparams(), rtol=0.05)


def test_first_output_exact_matches_temporal(small_data, key):
    """Exact dense and O(N) temporal backends agree at the optimum."""
    ds = small_data
    init = pack_gp(0.3, 1.0, 0.1)
    cfg_t = GPARConfig(first_output_backend="temporal", max_opt_steps=150)
    cfg_e = GPARConfig(first_output_backend="exact", max_opt_steps=150)
    fit_t = fit_first_output(key, ds.x, ds.y_obs[:, 0], cfg_t, init_params=init)
    fit_e = fit_first_output(key, ds.x, ds.y_obs[:, 0], cfg_e, init_params=init)
    np.testing.assert_allclose(fit_t.hyperparams(), fit_e.hyperparams(), rtol=0.05)


def test_conditional_exact_fit_recovers_function(small_data, key):
    ds = small_data
    cfg = GPARConfig(backend="exact", max_opt_steps=150)
    # y2 = cos(y1)^2 + sin(3x): condition on (t, y1)
    fit = fit_conditional(
        key,
        ds.x,
        ds.y_obs[:, :1],
        ds.y_obs[:, 1],
        cfg,
        init_params=pack_gpar(0.5, 1.0, 1.0, 1.0, 0.1),
    )
    mu, var = fit.predict(jnp.array(ds.x), jnp.array(ds.y_obs[:, :1]))
    err = float(np.max(np.abs(np.asarray(mu) - ds.y_obs[:, 1])))
    assert err < 0.25, err


def test_gpar_chain_end_to_end_exact(small_data, key):
    """Full 3-output chain on the small dataset: chained predictions track
    the true functions on the training window."""
    ds = small_data
    cfg = GPARConfig(backend="exact", first_output_backend="temporal", max_opt_steps=150)
    inits = [pack_gp(0.3, 1.0, 0.1)] + [pack_gpar(0.5, 1.0, 1.0, 1.0, 0.1)] * 2
    model = fit_gpar(key, ds.x, ds.y_obs, cfg, init_params=inits)
    means, variances = model.predict(jnp.array(ds.x))
    for i in range(3):
        rmse = float(np.sqrt(np.mean((np.asarray(means[:, i]) - ds.y_obs[:, i]) ** 2)))
        assert rmse < 0.3, (i, rmse)


def test_gpar_chain_scaled_backend(small_data, key):
    """Scaled (DTC + temporal noise) backend on the small dataset — mirrors
    ``small_synthetic_dataset`` (``examples/GPAR_scaled_examples.jl:5-83``,
    10 pseudo-points for 30 observations)."""
    ds = small_data
    cfg = GPARConfig(
        backend="scaled",
        first_output_backend="temporal",
        num_pseudo_points=10,
        max_opt_steps=100,
    )
    inits = [pack_gp(0.3, 1.0, 0.1)] + [pack_gpar(0.5, 1.0, 1.0, 1.0, 0.1)] * 2
    model = fit_gpar(key, ds.x, ds.y_obs, cfg, init_params=inits)
    means, variances = model.predict(jnp.array(ds.x))
    for i in range(3):
        rmse = float(np.sqrt(np.mean((np.asarray(means[:, i]) - ds.y_obs[:, i]) ** 2)))
        assert rmse < 0.45, (i, rmse)
    assert np.all(np.asarray(variances) >= 0)


def test_scaled_optimum_close_to_exact_optimum(small_data, key):
    """The consistency-of-optima check (``examples/dtc_example.jl:67-163``):
    with pseudo-points == inputs, the scaled objective's optimum hyperparams
    approach the exact additive-GP optimum."""
    ds = small_data
    init = pack_gpar(0.5, 1.0, 1.0, 1.0, 0.1)
    cfg_s = GPARConfig(backend="scaled", num_pseudo_points=30, max_opt_steps=150)
    cfg_e = GPARConfig(backend="exact", max_opt_steps=150)
    fit_s = fit_conditional(key, ds.x, ds.y_obs[:, :1], ds.y_obs[:, 1], cfg_s, init_params=init)
    fit_e = fit_conditional(key, ds.x, ds.y_obs[:, :1], ds.y_obs[:, 1], cfg_e, init_params=init)
    hp_s = np.asarray(fit_s.hyperparams())
    hp_e = np.asarray(fit_e.hyperparams())
    # noise and variances should be in the same ballpark (NLML surfaces are
    # flat in lengthscales for n=30, so compare loosely).
    np.testing.assert_allclose(hp_s[-1], hp_e[-1], rtol=0.3)
