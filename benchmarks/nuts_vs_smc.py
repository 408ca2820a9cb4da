"""Cross-validate the big-N hyperparameter posterior: NUTS vs SMC on the
SAME N-step temporal-GP likelihood (BASELINE.md "posterior moments within MC
error"; r3 verdict item 7 — the 1M SMC posterior was only checked against
ground truth, never against an independent sampler).

Same data-generating process and prior as ``benchmarks/million_smc.py``.
NUTS runs chunked (bounded-size device executions) with gradients through
the closed-form disturbance-smoother VJP (``ssm/blocked_grad.blocked_loglik``
— no autodiff tracing through the scans); SMC runs host-driven with a
likelihood-value-only program.  The two samplers share no code beyond the
likelihood, so agreement is a real cross-check.

Usage: python benchmarks/nuts_vs_smc.py [N] [--chains=4] [--samples=200]
       [--warmup=120] [--particles=64] [--segment=25] [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._common import setup_jax  # noqa: E402

jax = setup_jax(cpu="--cpu" in sys.argv, x64=False)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from gpar_at_scale_tpu.inference.diagnostics import (
        means_agree_within_mc_error,
        summarize,
    )
    from gpar_at_scale_tpu.inference.nuts import nuts_chunked
    from gpar_at_scale_tpu.inference.smc import smc_host
    from gpar_at_scale_tpu.kernels import Matern52
    from gpar_at_scale_tpu.ssm.blocked_grad import blocked_loglik
    from gpar_at_scale_tpu.ssm.markov import lgssm_of

    N = int(next((a for a in sys.argv[1:] if not a.startswith("--")), 100_000))
    C = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--chains=")), 4)
    S = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--samples=")), 200)
    W = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--warmup=")), 120)
    P = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--particles=")), 64)
    seg = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--segment=")), 25)

    # Identical data process to million_smc.py (same seed) so posteriors are
    # directly comparable across the two benchmarks' artifacts.
    rng = np.random.default_rng(0)
    true_sn = 0.3
    t_np = np.cumsum(rng.uniform(0.5, 1.5, N)) / 1000.0
    f = 1.2 * np.sin(2 * np.pi * t_np / 7.0) * np.cos(2 * np.pi * t_np / 1.3)
    y_np = f + true_sn * rng.normal(size=N)
    t = jnp.asarray(t_np, jnp.float32)
    y = jnp.asarray(y_np, jnp.float32)

    def loglik(params):
        l, sf, sn = (jnp.exp(params[i]) + 1e-3 for i in range(3))
        k = Matern52(lengthscale=l, variance=sf**2)
        return blocked_loglik(lgssm_of(k, t, sn**2, jnp.float32), y)

    def logprior(params):
        return -0.5 * jnp.sum(params**2) / 4.0

    def logpost(params):
        return logprior(params) + loglik(params)

    # warm the remote compile service
    float(np.asarray(jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64)))))
    print(f"N={N:,}  device={jax.devices()[0]}", flush=True)

    # ---- NUTS (chunked, closed-form-VJP gradients) -----------------------
    key = jax.random.PRNGKey(0)
    x0s = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (C, 3))
    t0 = time.time()
    res = nuts_chunked(
        key, logpost, x0s, num_samples=S, num_warmup=W,
        segment_size=seg, max_depth=6,
    )
    el_nuts = time.time() - t0
    nuts_chains = np.exp(np.asarray(res.samples)) + 1e-3  # (C, S, 3) constrained
    n_div = int(np.sum(np.asarray(res.num_divergent)))
    d_nuts = summarize(nuts_chains)
    print(
        f"NUTS: {C} chains x {S} samples (+{W} warmup) in {el_nuts:.1f}s  "
        f"divergences {n_div}/{C*S}  accept "
        f"{float(np.mean(np.asarray(res.accept_prob))):.3f}",
        flush=True,
    )
    print(f"  split-R-hat {np.round(d_nuts.rhat, 4)}  ESS {np.round(d_nuts.ess, 1)}")
    print(f"  mean (l, sf, sn) = {np.round(d_nuts.mean, 4)} "
          f"+- mcse {np.round(d_nuts.mcse, 4)}", flush=True)

    # ---- SMC (host-driven, values only) ----------------------------------
    jll = jax.jit(loglik)

    def log_lik_batch(xs):
        return np.array(
            [float(np.asarray(jll(jnp.asarray(x, jnp.float32)))) for x in xs]
        )

    def log_prior_batch(xs):
        return -0.5 * np.sum(np.asarray(xs) ** 2, axis=1) / 4.0

    x0 = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (P, 3))) * 0.5
    t0 = time.time()
    res_s = smc_host(
        0, log_prior_batch, log_lik_batch, x0,
        num_mutations=3, ess_threshold=0.5, max_stages=25, verbose=True,
    )
    el_smc = time.time() - t0
    cloud = np.exp(np.asarray(res_s.particles)) + 1e-3  # (P, 3)
    smc_chains = cloud[None]  # (1, P, 3) for the shared diagnostics layer
    d_smc = summarize(smc_chains)
    print(
        f"SMC: {P} particles, {res_s.num_stages} stages, beta="
        f"{res_s.final_beta:.2f}, {res_s.num_lik_evals} evals in {el_smc:.1f}s",
        flush=True,
    )
    print(f"  mean (l, sf, sn) = {np.round(d_smc.mean, 4)} "
          f"+- mcse {np.round(d_smc.mcse, 4)}", flush=True)

    # ---- verdict ---------------------------------------------------------
    z = np.abs(d_nuts.mean - d_smc.mean) / np.sqrt(d_nuts.mcse**2 + d_smc.mcse**2)
    agree = means_agree_within_mc_error(nuts_chains, smc_chains)
    print(f"per-param |z| = {np.round(z, 2)}  (threshold 4)")
    print(f"AGREE within MC error: {agree}  (true noise sn={true_sn})", flush=True)
    if not agree:
        sys.exit(1)


if __name__ == "__main__":
    main()
