"""Separate temporal/output observation noises (K4, second half).

The reference shares one sigma between the temporal GP's observation noise
and the f/u FiniteGPs' output noise ("Temporal noise and output noise are
the same", ``src/gp/dtc.jl:18``; TODO at
``src/gp/gpar_scaled_inference.jl:60``).  The 6-param pack
(``utils/params.py::unpack_gpar6``) learns them separately; the 5-param
reference-parity pack stays the default.  Covers: shared-sigma limit ==
5-param pack, both knobs live, and gradient-based recovery of the
(identifiable) temporal noise with the learned output noise landing
distinct from it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.gp.dtc import dtc_objective
from gpar_at_scale_tpu.kernels import Matern52
from gpar_at_scale_tpu.models.gpar import FittedConditional, GPARConfig, fit_conditional
from gpar_at_scale_tpu.ssm.markov import lgssm_of
from gpar_at_scale_tpu.utils.params import (
    pack_gpar,
    pack_gpar6,
    unpack_gpar,
    unpack_gpar6,
)


def _nlml6(p, t, V, Z, y):
    """The separate-noise conditional NLML exactly as models/gpar wires it."""
    tl, ts, ol, osig, ns, tns = unpack_gpar6(p)
    time_k = Matern52(lengthscale=tl, variance=ts**2)
    out_k = Matern52(lengthscale=ol, variance=osig**2)
    lgssm = lgssm_of(time_k, t, tns**2, jnp.float64)
    return -dtc_objective(out_k, lgssm, V, Z, y, uu_ridge=ns**2,
                          time_kernel=time_k, t=t)


def _nlml5(p, t, V, Z, y):
    tl, ts, ol, osig, ns = unpack_gpar(p)
    time_k = Matern52(lengthscale=tl, variance=ts**2)
    out_k = Matern52(lengthscale=ol, variance=osig**2)
    lgssm = lgssm_of(time_k, t, ns**2, jnp.float64)
    return -dtc_objective(out_k, lgssm, V, Z, y, uu_ridge=ns**2,
                          time_kernel=time_k, t=t)


def _problem(rng, n=120, m=20):
    t = jnp.asarray(np.sort(rng.uniform(0, 6, size=n)))
    V = jnp.asarray(rng.normal(size=(n, 2)))
    y = jnp.asarray(np.sin(np.asarray(t)) + 0.3 * rng.normal(size=n))
    Z = V[np.linspace(0, n - 1, m).astype(int)]
    return t, V, Z, y


def test_shared_sigma_limit_equals_five_param_pack(rng):
    t, V, Z, y = _problem(rng)
    p5 = pack_gpar(0.8, 1.1, 0.9, 1.2, 0.3)
    p6 = pack_gpar6(0.8, 1.1, 0.9, 1.2, 0.3, 0.3)
    np.testing.assert_allclose(
        float(_nlml6(p6, t, V, Z, y)), float(_nlml5(p5, t, V, Z, y)), rtol=1e-12
    )


def test_both_noise_knobs_are_live(rng):
    """Temporal and output noise each change the objective independently."""
    t, V, Z, y = _problem(rng)
    base = float(_nlml6(pack_gpar6(0.8, 1.1, 0.9, 1.2, 0.3, 0.3), t, V, Z, y))
    dt = float(_nlml6(pack_gpar6(0.8, 1.1, 0.9, 1.2, 0.3, 0.15), t, V, Z, y))
    do = float(_nlml6(pack_gpar6(0.8, 1.1, 0.9, 1.2, 0.15, 0.3), t, V, Z, y))
    assert abs(dt - base) > 1e-6
    assert abs(do - base) > 1e-6
    # and they act through different terms: the two perturbations differ.
    assert abs(dt - do) > 1e-6


@pytest.mark.slow
def test_temporal_noise_recovered_distinct_from_output_noise(rng, key):
    """Generative model y = f_x + f_t + eps_t with sigma_t = 0.35: the
    6-param fit recovers the temporal noise and learns an output noise
    DISTINCT from it (the shared-sigma pack cannot represent this)."""
    n, m = 300, 30
    t = np.sort(rng.uniform(0, 6, size=n))
    V = rng.normal(size=(n, 2))
    out_k = Matern52(lengthscale=1.0, variance=1.0)
    time_k = Matern52(lengthscale=0.5, variance=0.8)
    K_out = np.asarray(out_k(jnp.asarray(V), jnp.asarray(V))) + 1e-9 * np.eye(n)
    K_t = np.asarray(time_k(jnp.asarray(t)[:, None], jnp.asarray(t)[:, None]))
    K_t = K_t + 1e-9 * np.eye(n)
    f_x = np.linalg.cholesky(K_out) @ rng.normal(size=n)
    f_t = np.linalg.cholesky(K_t) @ rng.normal(size=n)
    sigma_t = 0.35
    y = f_x + f_t + sigma_t * rng.normal(size=n)

    cfg = GPARConfig(
        backend="scaled", separate_noise=True, num_pseudo_points=m,
        optimizer="adam", max_opt_steps=300,
    )
    x0 = pack_gpar6(1.0, 1.0, 1.0, 1.0, 0.8, 0.8)  # both noises start wrong
    fit = fit_conditional(key, t, V, y, cfg, init_params=x0)
    tl, ts, ol, osig, ns, tns = fit.hyperparams()
    # Temporal noise identified; output noise learned away from it.
    assert 0.2 < tns < 0.55, (tns, ns)
    assert ns < 0.6 * tns, (tns, ns)
    # And prediction through the 6-param path is finite and calibrated-ish.
    mu, var = fit.predict(t[:50], V[:50])
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all(np.asarray(var) >= 0)
