"""Long-series state-space GPAR benchmark (north-star config 4: 1M steps).

Compares the three Kalman whitening engines on one chip:
  - sequential ``lax.scan`` filter       (O(N) depth)
  - XLA associative-scan filter          (O(log N) depth, O(log N) HBM passes)
  - Pallas lane-parallel blocked scan    (2 streaming passes)

Usage: python benchmarks/long_series.py [N] [--no-assoc]
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
    from gpar_at_scale_tpu.ops.pallas_kalman import pallas_decorrelate
    from gpar_at_scale_tpu.ssm.kalman import decorrelate
    from gpar_at_scale_tpu.ssm.markov import lgssm_of
    from gpar_at_scale_tpu.ssm.pkalman import parallel_decorrelate

    N = int(next((a for a in sys.argv[1:] if not a.startswith("--")), 1_000_000))
    chunk = next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--chunk=")), 0
    )
    rng = np.random.default_rng(0)
    t = jnp.asarray(np.cumsum(rng.uniform(0.5, 1.5, N)) / 1000.0, jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(t) * 3) + 0.3 * rng.normal(size=N), jnp.float32)
    k = Matern52(lengthscale=1.0, variance=1.0)
    lg = jax.block_until_ready(jax.jit(lambda t: lgssm_of(k, t, 0.09, jnp.float32))(t))
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
            f"({N/el/1e6:7.2f} M steps/s)  ll={ll:.1f}"
        )
        return el

    from gpar_at_scale_tpu.ops.pallas_smoother import pallas_smooth

    if chunk:
        # Bounded per-launch size (see BENCHMARKS.md env caveats): the
        # blocked-scan kernel segmented at `chunk` steps with the combined
        # filtering element threaded across segments.
        from gpar_at_scale_tpu.ops.pallas_kalman import pallas_decorrelate_chunked

        el_p = bench(
            "pallas filter", lambda: pallas_decorrelate_chunked(lg, y, chunk_size=chunk), 10
        )
    else:
        el_p = bench("pallas filter", lambda: pallas_decorrelate(lg, y), 10)
        bench("pallas smooth", lambda: pallas_smooth(lg, y), 5)
    if "--no-seq" not in sys.argv:
        el_s = bench("seq scan", lambda: decorrelate(lg, y), 2)
        print(f"pallas speedup vs seq: {el_s/el_p:.1f}x")
    print(f"pallas speedup vs seq: {el_s/el_p:.1f}x")
    if "--no-assoc" not in sys.argv:
        el_a = bench("assoc scan", jax.jit(lambda: parallel_decorrelate(lg, y)), 2)
        print(f"pallas speedup vs assoc: {el_a/el_p:.1f}x")


if __name__ == "__main__":
    main()
