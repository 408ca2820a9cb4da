"""Long-series state-space GPAR benchmark (north-star config 4: 1M steps).

Compares the Kalman whitening engines on one chip:
  - blocked two-pass XLA scan (ssm/blocked.py)   — the production engine
  - sequential ``lax.scan`` filter               (O(N) depth)
  - XLA associative-scan filter                  (O(log N) depth, O(log N)
                                                  HBM passes; opt-in)
  - Pallas lane-parallel blocked scan            (opt-in: pathological
    through this sandbox's axon relay — see BENCHMARKS.md diagnosis)

Usage: python benchmarks/long_series.py [N] [--no-seq] [--assoc] [--pallas]
       [--chunk=K]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpar_at_scale_tpu.kernels import Matern52
    from gpar_at_scale_tpu.ssm.blocked import blocked_decorrelate, blocked_smooth
    from gpar_at_scale_tpu.ssm.kalman import decorrelate
    from gpar_at_scale_tpu.ssm.markov import lgssm_of

    N = int(next((a for a in sys.argv[1:] if not a.startswith("--")), 1_000_000))
    chunk = next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--chunk=")), 0
    )
    rng = np.random.default_rng(0)
    t = jnp.asarray(np.cumsum(rng.uniform(0.5, 1.5, N)) / 1000.0, jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(t) * 3) + 0.3 * rng.normal(size=N), jnp.float32)
    k = Matern52(lengthscale=1.0, variance=1.0)
    lg = jax.block_until_ready(jax.jit(lambda t: lgssm_of(k, t, 0.09, jnp.float32))(t))
    # Warm the remote compile service (first compile in a process pays
    # ~80-140 s of connection warmup regardless of program size — measured
    # r3, benchmarks/results_r3/diag_*.txt) so per-engine compile numbers
    # reflect the engine, not the service.
    float(np.asarray(jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64)))))
    print(f"N={N}  device={jax.devices()[0]}")

    def bench(name, fn, reps):
        """Amortized: reps calls inside ONE jit (a lax.scan), so per-dispatch
        overhead (tens of ms through a TPU tunnel) is paid once."""

        @jax.jit
        def rep():
            def body(c, _):
                out = fn()
                first = out[0] if isinstance(out, tuple) else out
                return c + jnp.sum(first), None

            tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return tot

        t0 = time.time()
        float(np.asarray(rep()))
        compile_s = time.time() - t0
        t0 = time.time()
        float(np.asarray(rep()))
        el = (time.time() - t0) / reps
        out = fn()
        ll = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        print(
            f"{name:>14}: compile {compile_s:6.1f}s  run {el*1e3:9.2f} ms "
            f"({N/el/1e6:7.2f} M steps/s)  ll={ll:.1f}",
            flush=True,
        )
        return el

    el_b = bench("blocked filter", lambda: blocked_decorrelate(lg, y), 10)
    bench("blocked smooth", lambda: blocked_smooth(lg, y), 5)
    if "--pallas" in sys.argv:
        if chunk:
            from gpar_at_scale_tpu.ops.pallas_kalman import pallas_decorrelate_chunked

            bench(
                "pallas filter",
                lambda: pallas_decorrelate_chunked(lg, y, chunk_size=chunk),
                10,
            )
        else:
            from gpar_at_scale_tpu.ops.pallas_kalman import pallas_decorrelate
            from gpar_at_scale_tpu.ops.pallas_smoother import pallas_smooth

            bench("pallas filter", lambda: pallas_decorrelate(lg, y), 10)
            bench("pallas smooth", lambda: pallas_smooth(lg, y), 5)
    if "--no-seq" not in sys.argv:
        el_s = bench("seq scan", lambda: decorrelate(lg, y), 2)
        print(f"blocked speedup vs seq: {el_s/el_b:.1f}x")
    if "--assoc" in sys.argv:
        from gpar_at_scale_tpu.ssm.pkalman import parallel_decorrelate

        el_a = bench("assoc scan", lambda: parallel_decorrelate(lg, y), 2)
        print(f"blocked speedup vs assoc: {el_a/el_b:.1f}x")


if __name__ == "__main__":
    main()
