"""Benchmark: EEG-shaped scaled-GPAR (DTC + temporal LGSSM) pipeline on one chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (mirrors the reference's EEG conditional, ``examples/eeg.jl``):
N = 156 training points, M = 156 pseudo-points (== training inputs, as the
reference uses, ``examples/eeg.jl:217-220``), 3 conditioning input dims,
100 test points.  Pipeline = hyperparameter optimization (50 fixed Adam steps
on the DTC bound) + q(u) + analytic posterior predictive.

Engine selection (round 2): at N=156 every whitening/smoothing pass runs the
DENSE backend — one chol(Sigma_y) + multi-RHS triangular solve on the MXU —
instead of a scan; the scan engines are latency-bound at this size (r1
measured 54.8 ms pipeline through the associative filter).  Serving caches
q(u) at fit time: predict is K_*u gemv + one dense smoothing pass, not a
refit (VERDICT r1 "what's weak" #2).

Optimizer note: the library default is L-BFGS (GPARConfig.optimizer); the
bench intentionally uses fixed-step Adam because the zoom line search's
data-dependent while_loops make wall-clock vary with the loss surface —
a fixed 50-step Adam schedule measures engine throughput, not line-search
luck.  50 Adam steps reach the same optimum basin on this surface (final
NLML printed to stderr for the record).

Baseline: the reference publishes no numbers (BASELINE.md).  The only speed
statement it contains is the wall-clock budget it allots this exact
conditional: 3 s of Nelder-Mead (``examples/eeg.jl:228``) plus its 100-sample
MC predictive.  vs_baseline is therefore (3 s / our pipeline seconds).
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

    def _kernels(params):
        tl, ts, ol, osig, ns = unpack_gpar(params)
        time_k = Matern52(lengthscale=tl, variance=ts**2)
        out_k = Matern52(lengthscale=ol, variance=osig**2)
        return time_k, out_k, ns**2

    def nlml(params):
        time_k, out_k, nv = _kernels(params)
        lgssm = lgssm_of(time_k, t, nv, dtype)
        # Dense whitening: chol(K_time + s2 I) + one (N, M+1)-RHS triangular
        # solve — a single fused MXU op at N=156 (the r1 associative-scan
        # path was latency-bound here).
        return -dtc_objective(
            out_k, lgssm, X, Z, y, uu_ridge=nv,
            filter_fn="dense", time_kernel=time_k, t=t,
        )

    def fit(params0):
        state0 = opt.init(params0)

        def body(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(nlml)(p)
            updates, s = opt.update(g, s)
            return (optax.apply_updates(p, updates), s), loss

        (p, _), losses = jax.lax.scan(body, (params0, state0), None, length=50)
        return p, losses[-1]

    def make_qu(params):
        """Fit-time artifact: cached q(u) — NOT recomputed per predict."""
        time_k, out_k, nv = _kernels(params)
        lgssm = lgssm_of(time_k, t, nv, dtype)
        return compute_q_u(
            out_k, lgssm, X, Z, y, uu_ridge=nv,
            filter_fn="dense", time_kernel=time_k, t=t,
        )

    def predict(params, qu):
        """Serving path: K_*u gemv + one dense smoothing pass over the
        spliced train+test series (no refit, no q(u) recompute)."""
        time_k, out_k, nv = _kernels(params)
        pred = predict_scaled(
            out_k, time_k, qu, X, t, y, t_star, X_star, nv,
            dtype=dtype, smooth_fn="dense",
        )
        return pred.mean, pred.var

    @jax.jit
    def pipeline(params0):
        p, loss = fit(params0)
        qu = make_qu(p)
        mu, var = predict(p, qu)
        return p, qu, loss, mu, var

    params0 = jnp.zeros(5, dtype)

    # Warmup / compile.
    p, qu, loss, mu, var = pipeline(params0)
    _sync(p, mu, var)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"final nlml: {float(loss):.3f}", file=sys.stderr)

    # Amortized timing: R DISTINCT pipelines inside one jit (distinct inits so
    # XLA cannot hoist loop-invariant work), one host sync at the end — the
    # TPU-tunnel dispatch RTT (tens of ms) is paid once, not per rep.
    reps = 50  # dilutes the ~29 ms tunnel-dispatch RTT to <0.6 ms/pipeline

    @jax.jit
    def pipelines(inits):
        def body(c, p0):
            _, _, _, mu, var = pipeline(p0)
            return c + jnp.sum(mu) + jnp.sum(var), None

        tot, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), inits)
        return tot

    inits = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (reps, 5), dtype)
    _sync(pipelines(inits))  # compile
    t0 = time.perf_counter()
    _sync(pipelines(inits))
    pipeline_s = (time.perf_counter() - t0) / reps

    # Serving: cached q(u), K_*u gemv + one dense smoothing pass per request.
    # Latency = sequential scan over distinct parameter vectors (so XLA cannot
    # hoist work); throughput = the same requests vmapped into one batched
    # program (batched chol/solves fill the MXU — how a serving deployment
    # actually runs many requests on one chip).
    reps_p = 200
    pbatch = p[None, :] + 0.001 * jax.random.normal(
        jax.random.PRNGKey(1), (reps_p, 5), dtype
    )

    @jax.jit
    def predict_seq(params_batch):
        def body(c, pp):
            mu, var = predict(pp, qu)
            return c + jnp.sum(mu) + jnp.sum(var), None

        tot, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), params_batch)
        return tot

    outer = 8  # amortize the tunnel dispatch RTT over several batched rounds

    @jax.jit
    def predict_batched(params_batch):
        def body(c, k):
            mu, var = jax.vmap(lambda pp: predict(pp + 1e-4 * k, qu))(params_batch)
            return c + jnp.sum(mu) + jnp.sum(var), None

        tot, _ = jax.lax.scan(
            body, jnp.asarray(0.0, dtype), jnp.arange(outer, dtype=dtype)
        )
        return tot

    _sync(predict_seq(pbatch))  # compile
    t0 = time.perf_counter()
    _sync(predict_seq(pbatch))
    lat_s = (time.perf_counter() - t0) / reps_p

    _sync(predict_batched(pbatch))  # compile
    t0 = time.perf_counter()
    _sync(predict_batched(pbatch))
    thr_s = time.perf_counter() - t0
    obs_per_s = outer * reps_p * n_star / thr_s

    print(
        f"pipeline: {pipeline_s*1e3:.1f} ms  predict latency: {lat_s*1e3:.3f} ms "
        f"({n_star/lat_s:,.0f} obs/s seq)  batched serving: {obs_per_s:,.0f} obs/s",
        file=sys.stderr,
    )

    # MFU / roofline estimate (VERDICT r2 item 7): useful FLOPs of one
    # pipeline vs the chip's peak.  Prefer XLA's own cost model for the
    # compiled executable; fall back to an analytic count of the dominant
    # dense-linear-algebra terms per optimization step:
    #   chol(Sigma_y) N^3/3, (M+1)-RHS trisolve N^2(M+1), gram 2NM^2,
    #   chol(K_uu) M^3/3, K_fu 2NMd; x3 for value_and_grad; x50 steps.
    try:
        flops = float(
            jax.jit(pipeline).lower(params0).compile().cost_analysis()["flops"]
        )
    except Exception:
        step = (
            n**3 / 3 + n**2 * (m + 1) + 2 * n * m**2 + m**3 / 3 + 2 * n * m * d
        )
        flops = 3.0 * 50 * step  # fwd+bwd ~ 3x fwd, 50 Adam steps
    peak = 197e12  # TPU v5e bf16 peak FLOP/s (f32-accum MXU passes)
    mfu = flops / pipeline_s / peak
    print(
        f"pipeline flops ~ {flops:.3g}  ->  {flops/pipeline_s/1e9:.1f} GFLOP/s "
        f"= {mfu*100:.3f}% MFU of v5e bf16 peak (N=156 is latency-bound; "
        f"compute-bound configs measured at 41-98% of peak in "
        f"benchmarks/mfu.py — BENCHMARKS.md 'Round 5: compute-bound MFU')",
        file=sys.stderr,
    )

    ref_budget_s = 3.0  # examples/eeg.jl:228 optimization_time_limit per conditional
    print(
        json.dumps(
            {
                "metric": "eeg_gpar_dtc_pipeline_seconds",
                "value": round(pipeline_s, 5),
                "unit": "s",
                "vs_baseline": round(ref_budget_s / pipeline_s, 1),
                "mfu": round(mfu, 6),
                "gflops_per_s": round(flops / pipeline_s / 1e9, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
