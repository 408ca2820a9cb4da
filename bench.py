"""Benchmark: EEG-shaped scaled-GPAR (DTC + temporal LGSSM) pipeline on one chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (mirrors the reference's EEG conditional, ``examples/eeg.jl``):
N = 156 training points, M = 156 pseudo-points (== training inputs, as the
reference uses, ``examples/eeg.jl:217-220``), 3 conditioning input dims,
100 test points.  Pipeline = hyperparameter optimization (50 L-BFGS-equivalent
Adam steps on the DTC bound) + q(u) + analytic posterior predictive.

Baseline: the reference publishes no numbers (BASELINE.md).  The only speed
statement it contains is the wall-clock budget it allots this exact
conditional: 3 s of Nelder-Mead (``examples/eeg.jl:228``) plus its 100-sample
MC predictive.  vs_baseline is therefore (3 s / our pipeline seconds) — i.e.
how many times faster than the reference's per-conditional budget we run the
whole fit+predict.
"""

import json
import sys
import time

import numpy as np


def _sync(*arrays):
    """Force full host materialization — ``block_until_ready`` has been
    observed to return early on the experimental TPU-tunnel platform."""
    total = 0.0
    for a in arrays:
        total += float(np.asarray(a).ravel()[-1])
    return total


def main():
    import jax
    import jax.numpy as jnp

    from gpar_at_scale_tpu.gp.dtc import compute_q_u, dtc_objective, predict_scaled
    from gpar_at_scale_tpu.kernels import Matern52
    from gpar_at_scale_tpu.ssm.markov import lgssm_of
    from gpar_at_scale_tpu.ssm.pkalman import parallel_filter, parallel_smooth
    from gpar_at_scale_tpu.utils.params import unpack_gpar
    import optax

    dtype = jnp.float32
    n, n_star, d = 156, 100, 3
    m = n  # pseudo-points == training inputs (examples/eeg.jl:217-220)

    rng = np.random.default_rng(0)
    t = np.arange(1, n + 1, dtype=np.float64) / 64.0
    t_star = (n + np.arange(1, n_star + 1, dtype=np.float64)) / 64.0
    X = rng.normal(size=(n, d))
    X_star = rng.normal(size=(n_star, d))
    y = np.sin(3 * t) + 0.2 * X[:, 0] + 0.05 * rng.normal(size=n)
    Z = X

    t, t_star, X, X_star, y, Z = (
        jnp.asarray(a, dtype) for a in (t, t_star, X, X_star, y, Z)
    )

    opt = optax.adam(5e-2)

    def nlml(params):
        tl, ts, ol, osig, ns = unpack_gpar(params)
        time_k = Matern52(lengthscale=tl, variance=ts**2)
        out_k = Matern52(lengthscale=ol, variance=osig**2)
        lgssm = lgssm_of(time_k, t, ns**2, dtype)
        # Associative-scan filter: O(log N) depth — ~2x faster than the
        # sequential scan for this N on one chip (see PROGRESS notes).
        return -dtc_objective(
            out_k, lgssm, X, Z, y, uu_ridge=ns**2, filter_fn=parallel_filter
        )

    @jax.jit
    def fit(params0):
        state0 = opt.init(params0)

        def body(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(nlml)(p)
            updates, s = opt.update(g, s)
            return (optax.apply_updates(p, updates), s), loss

        (p, _), losses = jax.lax.scan(body, (params0, state0), None, length=50)
        return p, losses[-1]

    @jax.jit
    def predict(params):
        tl, ts, ol, osig, ns = unpack_gpar(params)
        time_k = Matern52(lengthscale=tl, variance=ts**2)
        out_k = Matern52(lengthscale=ol, variance=osig**2)
        nv = ns**2
        lgssm = lgssm_of(time_k, t, nv, dtype)
        qu = compute_q_u(out_k, lgssm, X, Z, y, uu_ridge=ns**2, filter_fn=parallel_filter)
        pred = predict_scaled(
            out_k, time_k, qu, X, t, y, t_star, X_star, nv,
            dtype=dtype, smooth_fn=parallel_smooth,
        )
        return pred.mean, pred.var

    params0 = jnp.zeros(5, dtype)

    # Warmup / compile.
    p, loss = fit(params0)
    mu, var = predict(p)
    _sync(p, mu, var)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"final nlml: {float(loss):.3f}", file=sys.stderr)

    # Amortized timing: R DISTINCT pipelines inside one jit (distinct inits so
    # XLA cannot hoist loop-invariant work), one host sync at the end — the
    # TPU-tunnel dispatch RTT (tens of ms) is paid once, not per rep.
    reps = 10

    @jax.jit
    def pipelines(inits):
        def body(c, p0):
            p, _ = fit(p0)
            mu, var = predict(p)
            return c + jnp.sum(mu) + jnp.sum(var), None

        tot, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), inits)
        return tot

    inits = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (reps, 5), dtype)
    _sync(pipelines(inits))  # compile
    t0 = time.perf_counter()
    _sync(pipelines(inits))
    pipeline_s = (time.perf_counter() - t0) / reps

    # Pure predictive throughput (obs/s) — the serving-path metric.
    reps_p = 50

    @jax.jit
    def predicts(params_batch):
        def body(c, pp):
            mu, var = predict(pp)
            return c + jnp.sum(mu) + jnp.sum(var), None

        tot, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), params_batch)
        return tot

    pbatch = p[None, :] + 0.001 * jax.random.normal(jax.random.PRNGKey(1), (reps_p, 5), dtype)
    _sync(predicts(pbatch))  # compile
    t0 = time.perf_counter()
    _sync(predicts(pbatch))
    pred_s = (time.perf_counter() - t0) / reps_p
    obs_per_s = n_star / pred_s

    print(
        f"pipeline: {pipeline_s*1e3:.1f} ms  predict: {pred_s*1e3:.2f} ms "
        f"({obs_per_s:,.0f} obs/s)",
        file=sys.stderr,
    )

    ref_budget_s = 3.0  # examples/eeg.jl:228 optimization_time_limit per conditional
    print(
        json.dumps(
            {
                "metric": "eeg_gpar_dtc_pipeline_seconds",
                "value": round(pipeline_s, 4),
                "unit": "s",
                "vs_baseline": round(ref_budget_s / pipeline_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
