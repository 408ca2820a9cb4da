"""Compute-bound MFU evidence (VERDICT r4 weak #3).

The EEG pipeline headline is latency-bound at N=156 (0.01% MFU) — true but
it leaves "speed-of-light per-chip linear algebra" (BASELINE.md) argued,
never shown.  This driver measures the workload's genuinely compute-bound
stages on the real chip and reports achieved FLOP/s against v5e peak:

  (a) the DTC Gram reduction  G = W^T W  over the whitened column stack at
      N = 1e6, M = 256 — the O(N M^2) stage of every large-M DTC objective
      (``ssm/blocked_grad.whiten_fwd_aux``), in f32-highest (6-pass bf16)
      and bf16 variants;
  (b) the dense whitening backend at N = 2048 with a 2048-column RHS
      (chol + triangular solve, ``gp/dtc.py`` dense branch at
      ``DENSE_N_MAX``);
  (c) a square bf16 matmul control (4096^3) — the achievable ceiling
      through this tunnel, separating workload MFU from environment MFU.

Peak reference: TPU v5e ~197 TFLOP/s bf16; f32 via the "highest" 6-pass
decomposition has an effective ceiling of ~197/6 = 33 TFLOP/s.

Usage: python benchmarks/mfu.py [--reps=50] [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._common import setup_jax  # noqa: E402

jax = setup_jax(cpu="--cpu" in sys.argv, x64=False)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

PEAK_BF16 = 197e12
PEAK_F32_HIGHEST = PEAK_BF16 / 6.0  # 6-pass bf16 decomposition


def _arg(name, default):
    return next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith(f"--{name}=")),
        default,
    )


def timed_loop(step, init_args, reps):
    """reps iterations inside ONE jit via lax.scan with a data-dependent
    carry (so XLA cannot hoist the op); returns best-of-3 seconds/iter.
    A 1-rep call measures and subtracts the dispatch overhead."""

    def make_run(n):
        @jax.jit
        def run(c0, args):
            def body(c, _):
                return step(c, args), None

            c, _ = jax.lax.scan(body, c0, None, length=n)
            return c

        return run

    runs = {1: make_run(1), reps: make_run(reps)}
    run_n = lambda n, eps: runs[n](jnp.float32(eps), init_args)
    float(np.asarray(run_n(1, 0.0)))  # compile both shapes
    float(np.asarray(run_n(reps, 0.0)))
    best = np.inf
    for i in range(3):
        t0 = time.time()
        float(np.asarray(run_n(1, 1e-6 * (i + 1))))
        t1 = time.time() - t0
        t0 = time.time()
        float(np.asarray(run_n(reps, 1e-6 * (i + 1))))
        t2 = time.time() - t0
        best = min(best, (t2 - t1) / (reps - 1))
    return best


def report(name, flops, secs, peak):
    gfs = flops / secs / 1e9
    print(
        f"{name:<46s} {secs*1e3:9.3f} ms/iter  {gfs:10.1f} GFLOP/s  "
        f"= {100.0*gfs*1e9/peak:6.2f}% of {peak/1e12:.0f} TF peak",
        flush=True,
    )
    return gfs


def main():
    reps = _arg("reps", 50)
    small = "--small" in sys.argv  # CPU smoke-test shapes
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]}  reps={reps}", flush=True)
    float(np.asarray(jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64)))))  # warmup

    # ---- (a) DTC Gram reduction at N=1e6, M=256 --------------------------
    N, M = (20_000, 64) if small else (1_000_000, 256)
    W = jnp.asarray(rng.normal(size=(N, M + 1)), jnp.float32)
    flops = 2.0 * N * (M + 1) ** 2

    # NOTE each step consumes the FULL output (jnp.sum) — consuming a single
    # entry lets XLA dead-code the matmul down to one column's dot product
    # (measured r5 attempt 1: "3.5 PFLOP/s").

    def gram_highest(c, args):
        (Wa,) = args
        W2 = Wa.at[0, 0].add(c * 1e-20)
        with jax.default_matmul_precision("highest"):
            G = W2.T @ W2
        return jnp.sum(G) * 1e-20 + c * 0.5

    s = timed_loop(gram_highest, (W,), reps)
    report(f"(a) Gram W^T W  ({N:,} x {M+1}) f32-highest", flops, s, PEAK_F32_HIGHEST)

    Wb = W.astype(jnp.bfloat16)

    def gram_bf16(c, args):
        (Wa,) = args
        W2 = Wa + c.astype(jnp.bfloat16) * 1e-8
        G = jnp.matmul(W2.T, W2, preferred_element_type=jnp.float32)
        return jnp.sum(G) * 1e-20 + c * 0.5

    s = timed_loop(gram_bf16, (Wb,), reps)
    report(f"    Gram W^T W  ({N:,} x {M+1}) bf16", flops, s, PEAK_BF16)

    # ---- (b) dense whitening at DENSE_N_MAX with wide RHS ----------------
    n_d, m_d = (256, 256) if small else (2048, 2048)
    t_d = np.sort(rng.uniform(0, 8, size=n_d))
    D2 = (t_d[:, None] - t_d[None, :]) ** 2
    Sigma = jnp.asarray(np.exp(-0.5 * D2 / 0.25) + 0.1 * np.eye(n_d), jnp.float32)
    B = jnp.asarray(rng.normal(size=(n_d, m_d)), jnp.float32)
    flops = n_d**3 / 3.0 + n_d**2 * m_d  # chol + trisolve

    def dense_whiten(c, args):
        S0, B0 = args
        S1 = S0 + c * 1e-20 * jnp.eye(n_d, dtype=jnp.float32)
        with jax.default_matmul_precision("highest"):
            L = jnp.linalg.cholesky(S1)
            Wd = jax.scipy.linalg.solve_triangular(L, B0 + c * 1e-20, lower=True)
        return jnp.sum(Wd) * 1e-20 + c * 0.5

    s = timed_loop(dense_whiten, (Sigma, B), max(8, reps // 4))
    report(f"(b) dense whiten chol+trisolve ({n_d} x {m_d})", flops, s, PEAK_F32_HIGHEST)

    # ---- (c) bf16 square matmul control ----------------------------------
    k = 512 if small else 4096
    A1 = jnp.asarray(rng.normal(size=(k, k)), jnp.bfloat16)
    A2 = jnp.asarray(rng.normal(size=(k, k)), jnp.bfloat16)
    flops = 2.0 * k**3

    def mm(c, args):
        X1, X2 = args
        Y = jnp.matmul(
            X1 + c.astype(jnp.bfloat16) * 1e-8, X2, preferred_element_type=jnp.float32
        )
        return jnp.sum(Y) * 1e-20 + c * 0.5

    s = timed_loop(mm, (A1, A2), reps)
    report(f"(c) control bf16 matmul {k}^3", flops, s, PEAK_BF16)


if __name__ == "__main__":
    main()
