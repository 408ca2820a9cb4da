"""Batched column-whitening Pallas kernel vs. the sequential engine, and the
DTC objective through the pallas path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.gp.dtc import dtc_objective
from gpar_at_scale_tpu.kernels import Matern12, Matern52
from gpar_at_scale_tpu.ops.pallas_whiten import pallas_whiten_columns
from gpar_at_scale_tpu.ssm.kalman import decorrelate, kalman_filter
from gpar_at_scale_tpu.ssm.markov import lgssm_of


@pytest.mark.parametrize("family,n,B", [(Matern52, 1500, 7), (Matern12, 700, 3)])
def test_whiten_columns_matches_sequential(family, n, B, rng):
    t = jnp.asarray(np.cumsum(rng.uniform(0.1, 1.0, n)) / 50.0, jnp.float32)
    Y = jnp.asarray(rng.normal(size=(n, B)), jnp.float32)
    k = family(lengthscale=1.0, variance=1.0)
    lg = lgssm_of(k, t, 0.1, jnp.float32)
    ll_ref, a_ref = decorrelate(lg, Y)
    logdet_ref = float(jnp.sum(jnp.log(kalman_filter(lg, Y).S)))
    ll_p, a_p, logdet_p = pallas_whiten_columns(lg, Y, interpret=True)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_ref), rtol=2e-5)
    np.testing.assert_allclose(float(logdet_p), logdet_ref, rtol=1e-6)


def test_dtc_objective_pallas_path(rng):
    """filter_fn='pallas' reproduces the default objective (f32 tolerance)."""
    n, m = 600, 9
    t = jnp.asarray(np.sort(rng.uniform(0, 5, n)), jnp.float32)
    V = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    Z = V[:m]
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    out_k = Matern52(lengthscale=1.1, variance=0.9)
    time_k = Matern52(lengthscale=0.8, variance=1.3)
    lg = lgssm_of(time_k, t, 0.04, jnp.float32)
    ref = float(dtc_objective(out_k, lg, V, Z, y))
    got = float(dtc_objective(out_k, lg, V, Z, y, filter_fn="pallas"))
    np.testing.assert_allclose(got, ref, rtol=2e-4)
