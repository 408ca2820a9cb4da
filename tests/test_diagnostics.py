"""Split R-hat / multi-chain ESS diagnostics + the north-star posterior
parity test (BASELINE.md: "hyperparameter posterior moments within MC
error"; upgrade of the reference's consistency-of-optima check,
``examples/dtc_example.jl:67-163``)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpar_at_scale_tpu.inference.diagnostics import (
    ess,
    means_agree_within_mc_error,
    split_rhat,
    summarize,
)
from gpar_at_scale_tpu.models.bayes import (
    make_conditional_logpost,
    sample_conditional_posterior,
)


def test_rhat_and_ess_on_iid_chains(rng):
    x = rng.normal(size=(4, 1000, 3))
    r = split_rhat(x)
    e = ess(x)
    assert np.all(r < 1.01), r
    # iid draws: ESS ~ total draw count
    assert np.all(e > 0.5 * 4000), e
    assert np.all(e < 1.6 * 4000), e


def test_rhat_detects_nonconvergence(rng):
    x = rng.normal(size=(4, 500))
    x[0] += 3.0  # one stuck chain far away
    assert split_rhat(x) > 1.2
    # and ESS collapses relative to the iid count
    assert ess(x) < 500


def test_ess_penalizes_autocorrelation(rng):
    n = 4000
    e = np.empty((2, n))
    for c in range(2):
        z = rng.normal(size=n)
        for i in range(1, n):  # AR(1), rho = 0.9 -> ESS ~ N/19
            z[i] = 0.9 * z[i - 1] + np.sqrt(1 - 0.81) * z[i]
        e[c] = z
    est = ess(e)
    expect = 2 * n * (1 - 0.9) / (1 + 0.9)
    assert 0.4 * expect < est < 2.5 * expect, (est, expect)


def test_nuts_chains_converge_with_rigor(key, rng):
    """R-hat < 1.01 and a minimum multi-chain ESS on a GPAR conditional
    posterior — the statistically rigorous upgrade of the loose moment
    checks (VERDICT r1 weak #4)."""
    n = 24
    t = np.sort(rng.uniform(0, 5, n))
    v = np.sin(t) + 0.05 * rng.normal(size=n)
    y = np.cos(t) + 0.4 * v + 0.05 * rng.normal(size=n)
    logpost = make_conditional_logpost(t, v[:, None], y, likelihood="exact")
    res = sample_conditional_posterior(
        key, logpost, num_chains=4, num_samples=400, num_warmup=300, max_depth=6
    )
    d = summarize(np.asarray(res.samples))
    assert np.all(d.rhat < 1.01), d.rhat
    assert np.all(d.ess > 100), d.ess


def test_exact_vs_dtc_posterior_parity(key, rng):
    """North star: NUTS hyperparameter posterior moments under the exact
    additive-kernel likelihood vs the DTC likelihood with Z = inputs agree
    within Monte-Carlo error (the bound is exact at Z=V with uu_ridge=None,
    so any statistically significant difference is a sampler/engine bug)."""
    n = 20
    t = np.sort(rng.uniform(0, 5, n))
    v = np.sin(t) + 0.05 * rng.normal(size=n)
    y = np.cos(t) + 0.4 * v + 0.05 * rng.normal(size=n)

    lp_exact = make_conditional_logpost(t, v[:, None], y, likelihood="exact")
    lp_dtc = make_conditional_logpost(
        t, v[:, None], y, likelihood="dtc", Z=v[:, None], uu_ridge=None
    )
    k1, k2 = jax.random.split(key)
    res_e = sample_conditional_posterior(
        k1, lp_exact, num_chains=4, num_samples=400, num_warmup=300, max_depth=6
    )
    res_d = sample_conditional_posterior(
        k2, lp_dtc, num_chains=4, num_samples=400, num_warmup=300, max_depth=6
    )
    ce, cd = np.asarray(res_e.samples), np.asarray(res_d.samples)
    assert np.all(split_rhat(ce) < 1.05)
    assert np.all(split_rhat(cd) < 1.05)
    assert means_agree_within_mc_error(ce, cd, z=5.0), (
        summarize(ce).mean,
        summarize(cd).mean,
    )
