"""Engine-dispatch diagnosis: why the Pallas blocked-scan kernel measured
0.06 M steps/s after a 226 s compile in r2 (VERDICT r2 "what's weak" #3).

Separates the three suspects by timing each in isolation at one N:

  1. compile cost, kernel alone         — ONE un-wrapped jit(pallas_decorrelate)
     vs compile cost, reps-scan wrapper — jit(lax.scan of 10 calls)
     (if the wrapper explodes compile time, the bench harness was the problem)
  2. per-call execution, kernel alone   — timed per single dispatch, minus the
     measured tunnel RTT of an empty dispatch (if execution >> RTT + roofline,
     the kernel is slow THROUGH THIS RELAY; the same kernel's interpret-mode
     numerics are already oracle-tested on CPU in tests/test_pallas_kalman.py)
  3. the blocked XLA engine at the same N as the control (same algorithm,
     no hand-written kernel).

Usage: python benchmarks/diag_pallas.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpar_at_scale_tpu.kernels import Matern52
    from gpar_at_scale_tpu.ops.pallas_kalman import pallas_decorrelate
    from gpar_at_scale_tpu.ssm.blocked import blocked_decorrelate
    from gpar_at_scale_tpu.ssm.markov import lgssm_of

    N = int(next((a for a in sys.argv[1:] if not a.startswith("--")), 32768))
    rng = np.random.default_rng(0)
    t = jnp.asarray(np.cumsum(rng.uniform(0.5, 1.5, N)) / 1000.0, jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(t) * 3) + 0.3 * rng.normal(size=N), jnp.float32)
    k = Matern52(lengthscale=1.0, variance=1.0)
    lg = jax.block_until_ready(jax.jit(lambda t: lgssm_of(k, t, 0.09, jnp.float32))(t))
    print(f"N={N}  device={jax.devices()[0]}", flush=True)

    # Tunnel round-trip floor: an empty-ish dispatch, host-fetched.
    tiny = jax.jit(lambda x: x * 2.0 + 1.0)
    float(np.asarray(tiny(jnp.float32(1.0))))  # compile (+ service warmup)
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(np.asarray(tiny(jnp.float32(i))))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"dispatch RTT floor: {rtt*1e3:.1f} ms", flush=True)

    # 1. kernel alone: compile, then per-dispatch execution.
    f = jax.jit(lambda y: pallas_decorrelate(lg, y)[0])
    t0 = time.perf_counter()
    float(np.asarray(f(y)))
    c_alone = time.perf_counter() - t0
    runs = []
    for i in range(5):
        t0 = time.perf_counter()
        float(np.asarray(f(y + jnp.float32(i) * 1e-6)))
        runs.append(time.perf_counter() - t0)
    r_alone = min(runs)
    print(
        f"pallas kernel alone: compile+1st {c_alone:6.1f}s  "
        f"per-dispatch {r_alone*1e3:8.1f} ms  (minus RTT {(r_alone-rtt)*1e3:8.1f} ms"
        f" = {N/max(r_alone-rtt,1e-9)/1e6:6.2f} M steps/s)",
        flush=True,
    )

    # 2. the r2 bench harness shape: 10 calls inside one lax.scan.
    @jax.jit
    def wrapped(y):
        def body(c, _):
            ll = pallas_decorrelate(lg, y + c * 1e-9)[0]
            return c + ll, None

        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return tot

    t0 = time.perf_counter()
    float(np.asarray(wrapped(y)))
    c_wrap = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(wrapped(y)))
    r_wrap = (time.perf_counter() - t0) / 10
    print(
        f"pallas in reps-scan: compile+1st {c_wrap:6.1f}s  per-call {r_wrap*1e3:8.1f} ms",
        flush=True,
    )

    # 3. blocked XLA control at the same N (same two-pass algorithm).
    g = jax.jit(lambda y: blocked_decorrelate(lg, y)[0])
    t0 = time.perf_counter()
    float(np.asarray(g(y)))
    c_blk = time.perf_counter() - t0
    runs = []
    for i in range(5):
        t0 = time.perf_counter()
        float(np.asarray(g(y + jnp.float32(i) * 1e-6)))
        runs.append(time.perf_counter() - t0)
    r_blk = min(runs)
    print(
        f"blocked XLA control: compile+1st {c_blk:6.1f}s  "
        f"per-dispatch {r_blk*1e3:8.1f} ms  (minus RTT = "
        f"{N/max(r_blk-rtt,1e-9)/1e6:6.2f} M steps/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
