"""Compile-bisect for the staged million-DTC programs (r4).

The whiten-only program (arrays jitted separately; filter returning G/logdet)
compiles in ~30 s at N=1e6 through this sandbox's remote compile service,
but the train and predict stages stalled >25 min with zero CPU — the r3
"fused filter+smoother" pathology signature.  This driver isolates WHICH of
the staged programs stalls: each variant compiles exactly ONE jit in its own
subprocess under a hard timeout, so a stall is a named row, not a hung run.

Usage (driver): python benchmarks/diag_dtc.py [N] [--m=32] [--timeout=420]
       (worker): python benchmarks/diag_dtc.py [N] [--m=32] --variant=NAME
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    "whiten-gram",      # control: filter over M+1 cols, outputs (G, logdet)
    "whiten-aux-noM",   # + aux outputs v,S,K,P (no per-column m)
    "whiten-aux",       # + aux outputs incl. m (N, d, M+1)  [= train jfwd]
    "filter-cols",      # blocked_filter full FilterResult on M+1 cols [= predict jfilter]
    "smooth-given",     # blocked_smooth given FilterResult, M+1 cols [= predict jsmooth]
    "bwd",              # whiten_bwd: suffix scan + contractions [= train jbwd]
    "pull",             # vjp pullback through arrays + adam    [= train jpull]
    "fused-arrays-whiten",  # lgssm_of + filter fused, G-only   [~ predict q_u]
]


def worker(N, M, variant):
    from examples._common import setup_jax

    jax = setup_jax(cpu=False, x64=False)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gpar_at_scale_tpu.kernels import Matern52
    from gpar_at_scale_tpu.ssm.blocked import blocked_filter, blocked_smooth
    from gpar_at_scale_tpu.ssm.blocked_grad import whiten_bwd, whiten_fwd_aux
    from gpar_at_scale_tpu.ssm.markov import lgssm_of
    from gpar_at_scale_tpu.utils.params import unpack_gpar

    f32 = jnp.float32
    rng = np.random.default_rng(0)
    t = jnp.asarray(np.cumsum(rng.uniform(0.5, 1.5, N)) / 1000.0, f32)
    X = jnp.asarray(rng.normal(size=(N, 2)), f32)
    y = jnp.asarray(np.sin(np.asarray(t)) + 0.3 * rng.normal(size=N), f32)
    Z = jnp.asarray(np.asarray(X)[:: max(1, N // M)][:M], f32)
    p0 = jnp.zeros(5, f32)

    def arrays(p):
        tl, tsig, ol, osig, ns = unpack_gpar(p)
        time_k = Matern52(lengthscale=tl, variance=tsig**2)
        out_k = Matern52(lengthscale=ol, variance=osig**2)
        lg = lgssm_of(time_k, t, ns**2, f32)
        Kfu = out_k(X, Z)
        U = jnp.concatenate([y[:, None], Kfu], axis=1)
        Kuu = out_k(Z, Z) + ns**2 * jnp.eye(Z.shape[0], dtype=f32)
        return lg.A, lg.Q, jnp.broadcast_to(lg.R, (N,)), lg.H, U, Kuu

    # service-warmup jit so the variant's time is the variant's compile
    float(np.asarray(jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64)))))
    t0 = time.time()
    A, Q, R, H, U, Kuu = jax.jit(arrays)(p0)
    print(f"arrays jit: {time.time()-t0:.1f}s", flush=True)
    lg = None

    t0 = time.time()
    if variant == "whiten-gram":
        out = jax.jit(lambda *a: whiten_fwd_aux(*a)[:2])(A, Q, R, H, U)
    elif variant == "whiten-aux-noM":

        def f(A, Q, R, H, U):
            G, ld, (v, S, K, m, P) = whiten_fwd_aux(A, Q, R, H, U)
            return G, ld, v, S, K, P

        out = jax.jit(f)(A, Q, R, H, U)
    elif variant == "whiten-aux":
        out = jax.jit(whiten_fwd_aux)(A, Q, R, H, U)
    elif variant == "filter-cols":
        from gpar_at_scale_tpu.ssm.markov import LGSSM

        out = jax.jit(blocked_filter)(LGSSM(A=A, Q=Q, H=H, R=R), U)
    elif variant == "smooth-given":
        from gpar_at_scale_tpu.ssm.markov import LGSSM

        lgs = LGSSM(A=A, Q=Q, H=H, R=R)
        fr = jax.jit(blocked_filter)(lgs, U)
        print(f"  (filter-cols prereq: {time.time()-t0:.1f}s)", flush=True)
        t0 = time.time()
        out = jax.jit(lambda lg_, U_, fr_: blocked_smooth(lg_, U_, filter_result=fr_))(
            lgs, U, fr
        )
    elif variant == "bwd":
        G, ld, aux = jax.jit(whiten_fwd_aux)(A, Q, R, H, U)
        print(f"  (whiten-aux prereq: {time.time()-t0:.1f}s)", flush=True)
        ctG = jnp.eye(M + 1, dtype=f32)
        t0 = time.time()
        out = jax.jit(whiten_bwd)(A, Q, R, H, aux, ctG, jnp.float32(1.0))
    elif variant == "pull":
        opt = optax.adam(5e-2)
        ct_A, ct_Q, ct_R = jnp.zeros_like(A), jnp.zeros_like(Q), jnp.zeros_like(R)
        ct_U, ct_K = jnp.zeros_like(U), jnp.zeros_like(Kuu)
        st = opt.init(p0)

        @jax.jit
        def jpull(p, st, ct_A, ct_Q, ct_R, ct_U, ct_K):
            def drop_h(o):
                a, q, r, h, u, k = o
                return a, q, r, u, k

            _, vjp = jax.vjp(lambda pp: drop_h(arrays(pp)), p)
            (g,) = vjp((ct_A, ct_Q, ct_R, ct_U, ct_K))
            up, st2 = opt.update(-g / N, st)
            return optax.apply_updates(p, up), st2

        out = jpull(p0, st, ct_A, ct_Q, ct_R, ct_U, ct_K)
    elif variant == "fused-arrays-whiten":

        @jax.jit
        def f(p):
            A, Q, R, H, U, Kuu = arrays(p)
            G, ld, _ = whiten_fwd_aux(A, Q, R, H, U)
            return G, ld

        out = f(p0)
    else:
        raise SystemExit(f"unknown variant {variant}")
    compile_s = time.time() - t0
    # host fetch of one leaf = true completion
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    print(f"{variant}: compile+run {compile_s:.1f}s (+fetch {time.time()-t0-compile_s:.1f}s)", flush=True)


def main():
    N = int(next((a for a in sys.argv[1:] if not a.startswith("--")), 1_000_000))
    M = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--m=")), 32)
    variant = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--variant=")), None
    )
    if variant:
        worker(N, M, variant)
        return
    tmo = next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--timeout=")), 420
    )
    print(f"diag_dtc: N={N} M={M} per-variant timeout {tmo}s", flush=True)
    for v in VARIANTS:
        t0 = time.time()
        # run with hard timeout; a stalled compile is killed and reported
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(N), f"--m={M}",
                 f"--variant={v}"],
                capture_output=True, text=True, timeout=tmo, check=False,
            )
            tag = f"exit={r.returncode}"
            body = (r.stdout or "").strip().replace("\n", " | ")
        except subprocess.TimeoutExpired as e:
            tag = "TIMEOUT"
            body = ((e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")).strip().replace("\n", " | ")
        print(f"[{v:>22}] {tag} ({time.time()-t0:.0f}s): {body}", flush=True)


if __name__ == "__main__":
    main()
