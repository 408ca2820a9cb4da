"""Long-series state-space GPAR benchmark (north-star config 4: 1M steps).

Compares the Kalman whitening engines on one chip:
  - blocked two-pass XLA scan (ssm/blocked.py)   — the production engine
  - sequential ``lax.scan`` filter               (O(N) depth)
  - XLA associative-scan filter                  (O(log N) depth, O(log N)
                                                  HBM passes; opt-in)
  - Pallas lane-parallel blocked scan            (opt-in: pathological
    through this sandbox's axon relay — see BENCHMARKS.md diagnosis)

Usage: python benchmarks/long_series.py [N] [--no-seq] [--assoc] [--pallas]
       [--chunk=K] [--blocks=B] [--reps=R] [--segment=S] [--samples=S]
       [--only=filter|smooth|smooth-split|segfilter|segsmooth|ffbs|segsample|seq|assoc]

``--only``: run a single engine row (the remote compile service occasionally
stalls many minutes on one program; one-row-per-process keeps each artifact
independently retryable).  ``--blocks``: lockstep block count B for the
blocked engine (sequential depth is N/B; larger B = fewer, wider scan
iterations).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._common import setup_jax  # noqa: E402

jax = setup_jax(cpu="--cpu" in sys.argv, x64=False)


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
    only = next(
        (a.split("=")[1] for a in sys.argv[1:] if a.startswith("--only=")), None
    )
    from gpar_at_scale_tpu.ssm import blocked as _blocked

    nblocks = next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--blocks=")),
        _blocked.NUM_BLOCKS,
    )
    # --reps: iterations of the amortizing rep-scan.  The HBM *plan* of one
    # filter pass is ~14.4 GB per 1M steps regardless of reps or B (TPU
    # T(4,128) tile padding of (N,3,3) buffers, 56.9x — measured r4,
    # results_r4/scale_filter_{2m,4m}.err), so N > ~1.1e6 is a compile-time
    # OOM for any single-dispatch row; use the segmented rows there.
    reps_f = next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--reps=")), 10
    )
    rng = np.random.default_rng(0)
    t = jnp.asarray(np.cumsum(rng.uniform(0.5, 1.5, N)) / 1000.0, jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(t) * 3) + 0.3 * rng.normal(size=N), jnp.float32)
    k = Matern52(lengthscale=1.0, variance=1.0)
    # Full-length discretization caps at N ~ 2.5e6 on TPU (T(4,128) tile
    # padding of (N,3,3) temps, 56.9x — results_r4/scale_filter_4m.err);
    # the segmented rows discretize per segment and never build it.
    lg = None
    if only not in ("segfilter", "segsmooth", "segsample"):
        lg = jax.block_until_ready(jax.jit(lambda t: lgssm_of(k, t, 0.09, jnp.float32))(t))
    # Warm the remote compile service (first compile in a process pays
    # ~80-140 s of connection warmup regardless of program size — measured
    # r3; artifact benchmarks/results_r4/diag_pallas_32k.txt) so per-engine compile numbers
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

    el_b = None
    if only in (None, "filter"):
        el_b = bench(
            f"blocked filter B={nblocks}",
            lambda: blocked_decorrelate(lg, y, num_blocks=nblocks),
            reps_f,
        )
    if only in (None, "smooth"):
        bench(
            f"blocked smooth B={nblocks}",
            lambda: blocked_smooth(lg, y, num_blocks=nblocks),
            max(1, reps_f // 2),
        )
    if only == "smooth-split":
        # The fused filter+smoother program stalls the remote compile
        # service at N=1M (r3, long_series_1m_smooth.err); split into two
        # separately-compiled dispatches: the (known-good) filter, then the
        # smoother given the FilterResult.  Same math, same total work.
        from gpar_at_scale_tpu.ssm.blocked import blocked_filter

        fr = jax.jit(lambda y: blocked_filter(lg, y, num_blocks=nblocks))(
            y[:, None] if y.ndim == 1 else y
        )
        fr = jax.block_until_ready(fr)

        def smooth_given(res):
            return blocked_smooth(lg, y[:, None], filter_result=res, num_blocks=nblocks)

        sm = jax.jit(smooth_given)
        t0 = time.time()
        float(np.asarray(sm(fr).mean.sum()))
        print(f"smoother-given-filter compile+1st: {time.time()-t0:6.1f}s", flush=True)
        runs = []
        for i in range(5):
            # vary inputs: the remote service memoizes identical calls
            fr2 = fr._replace(m=fr.m + jnp.float32((i + 1) * 1e-6))
            t0 = time.time()
            float(np.asarray(sm(fr2).mean.sum()))
            runs.append(time.time() - t0)
        el = min(runs)
        print(
            f"smoother-given-filter per-dispatch: {el*1e3:9.2f} ms "
            f"({N/el/1e6:7.2f} M steps/s; incl. ~29 ms tunnel RTT)",
            flush=True,
        )
    if only in ("segfilter", "segsmooth"):
        # Segmented streaming engine (ssm/segmented.py): N beyond the
        # ~1.1e6-per-dispatch XLA:TPU buffer-plan ceiling (T(4,128) tile
        # padding of (N,3,3) buffers, 56.9x — measured r4) via exact
        # state-carried segment dispatches with PER-SEGMENT discretization.
        from gpar_at_scale_tpu.ssm.segmented import (
            SEGMENT_SIZE,
            segmented_decorrelate_t,
            segmented_smooth_t,
        )

        seg = next(
            (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--segment=")),
            SEGMENT_SIZE,
        )
        nseg = -(-N // seg)

        def bench_host(name, fn, reps=3):
            t0 = time.time()
            first = float(np.asarray(fn(0)))
            c = time.time() - t0
            runs = []
            for i in range(1, reps + 1):
                t0 = time.time()
                float(np.asarray(fn(i)))  # host fetch = completion barrier
                runs.append(time.time() - t0)
            el = min(runs)
            print(
                f"{name:>22}: compile+1st {c:6.1f}s  run {el*1e3:9.2f} ms "
                f"({N/el/1e6:7.2f} M steps/s; {nseg} dispatches)  ll={first:.1f}",
                flush=True,
            )

        if only == "segfilter":

            def run_f(i):
                ll, _ = segmented_decorrelate_t(
                    k, t, 0.09, y + jnp.float32(i * 1e-6), segment_size=seg,
                    num_blocks=nblocks,
                )
                return ll

            bench_host(f"seg filter s={seg}", run_f)
        else:

            def run_s(i):
                sm = segmented_smooth_t(
                    k, t, 0.09, y + jnp.float32(i * 1e-6), segment_size=seg,
                    num_blocks=nblocks,
                )
                return sm.ll[0] + sm.mean[-1]

            bench_host(f"seg smooth s={seg}", run_s)
    if only == "ffbs":
        # Joint posterior sampling (posterior_rand, src/gp/tmp.jl:167) on
        # the blocked engine: forward filter + FFBS affine suffix scan as
        # SEPARATE dispatches (the split that keeps million-step programs
        # compilable here; r4 verdict item 6).
        from gpar_at_scale_tpu.ssm.blocked import (
            _chol_floor,
            _smoother_elements_fast,
            blocked_affine_suffix_scan,
            blocked_filter,
        )

        S = next(
            (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--samples=")),
            4,
        )
        key = jax.random.PRNGKey(0)
        jfil = jax.jit(lambda yy: blocked_filter(lg, yy, num_blocks=nblocks))

        # THREE dispatches (filter / elements+noise / affine scan), with the
        # inter-dispatch residency slimmed to fit 16 GB at N=1e6: the filter
        # result is FREED before the scan dispatch, and the (N, d, S) noise /
        # mixed-g arrays travel FLAT (N, d*S) — the T(4,128) tile layout pads
        # 3-d arrays ~4x (measured: fused and fr-resident variants both OOM).
        @jax.jit
        def jelems(res, xi_flat):
            E, g, L = _smoother_elements_fast(lg, res)
            xi = xi_flat.reshape(N, lg.dim, S)
            g_s = g + _chol_floor(L) @ xi
            # E travels flat too: a (N, d, d) output buffer is tiled
            # T(4,128) on TPU (~2 GB at N=1e6 vs 36 MB packed).
            return E.reshape(N, lg.dim * lg.dim), g_s.reshape(N, lg.dim * S)

        @jax.jit
        def jscan(E_flat, g_flat):
            _, x = blocked_affine_suffix_scan(
                E_flat.reshape(N, lg.dim, lg.dim),
                g_flat.reshape(N, lg.dim, S),
                num_blocks=nblocks,
            )
            return jnp.einsum("d,nds->sn", lg.H.astype(lg.A.dtype), x)

        d = lg.A.shape[-1]

        def one_draw(i):
            fr = jfil(y[:, None] + jnp.float32(i * 1e-6))
            float(np.asarray(fr.ll[0]))
            t0 = time.time()
            xi = jax.random.normal(
                jax.random.fold_in(key, i), (N, d * S), jnp.float32
            )
            E, g_flat = jelems(fr, xi)
            del fr, xi  # free filter buffers before the scan dispatch
            f = jscan(E, g_flat)
            del E, g_flat
            float(np.asarray(f[0, 0]))
            return f, time.time() - t0

        t0 = time.time()
        fr = jfil(y[:, None])
        float(np.asarray(fr.ll[0]))
        c_f = time.time() - t0
        del fr
        t0 = time.time()
        f, _ = one_draw(0)
        c_s = time.time() - t0
        print(f"ffbs compiles: filter {c_f:6.1f}s  elems+scan {c_s:6.1f}s", flush=True)
        runs_f, runs_s = [], []
        for i in range(1, 5):
            t0 = time.time()
            fr = jfil(y[:, None] + jnp.float32(i * 1e-6))
            float(np.asarray(fr.ll[0]))
            runs_f.append(time.time() - t0)
            del fr
            f, el = one_draw(i)
            runs_s.append(el)
        el_f, el_s = min(runs_f), min(runs_s)
        fm = np.asarray(f)
        print(
            f"ffbs joint draw [{S} samples x {N:,} steps]: filter "
            f"{el_f*1e3:9.2f} ms + sample {el_s*1e3:9.2f} ms = "
            f"{(el_f+el_s)*1e3:9.2f} ms ({N*S/el_s/1e6:7.2f} M sample-steps/s "
            f"in the sampling pass); draw mean {fm.mean():.4f} sd {fm.std():.4f}",
            flush=True,
        )
    if only == "segsample":
        from gpar_at_scale_tpu.ssm.markov import discretize, to_sde
        from gpar_at_scale_tpu.ssm.segmented import (
            SEGMENT_SIZE,
            segmented_posterior_sample,
        )

        seg = next(
            (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--segment=")),
            SEGMENT_SIZE,
        )
        S = next(
            (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--samples=")),
            4,
        )
        nseg = -(-N // seg)
        lg_seg = jax.jit(lambda tt: discretize(to_sde(k, jnp.float32), tt, 0.09))(t)
        key = jax.random.PRNGKey(0)

        def run_sample(i):
            f = segmented_posterior_sample(
                jax.random.fold_in(key, i), lg_seg, y + jnp.float32(i * 1e-6),
                num_samples=S, segment_size=seg, num_blocks=nblocks,
            )
            return f[0, 0]

        t0 = time.time()
        float(np.asarray(run_sample(0)))
        c = time.time() - t0
        runs = []
        for i in range(1, 4):
            t0 = time.time()
            float(np.asarray(run_sample(i)))
            runs.append(time.time() - t0)
        el = min(runs)
        print(
            f"seg ffbs s={seg} [{S} samples x {N:,}]: compile+1st {c:6.1f}s  "
            f"run {el*1e3:9.2f} ms ({N*S/el/1e6:7.2f} M sample-steps/s; "
            f"{2*nseg} dispatches incl. filter)",
            flush=True,
        )
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
    if ("--no-seq" not in sys.argv and only is None) or only == "seq":
        el_s = bench("seq scan", lambda: decorrelate(lg, y), 2)
        if el_b is not None:
            print(f"blocked speedup vs seq: {el_s/el_b:.1f}x")
    if "--assoc" in sys.argv or only == "assoc":
        from gpar_at_scale_tpu.ssm.pkalman import parallel_decorrelate

        el_a = bench("assoc scan", lambda: parallel_decorrelate(lg, y), 2)
        if el_b is not None:
            print(f"blocked speedup vs assoc: {el_a/el_b:.1f}x")


if __name__ == "__main__":
    main()
