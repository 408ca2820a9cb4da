"""Scaled-GPAR DTC at 1M steps — the flagship model at north-star scale.

The repo's namesake algorithm (reference: ``src/gp/dtc.jl:83-128``,
``src/gp/gpar_scaled_inference.jl:20-136``): one conditional GP
f = f_x (DTC over M inducing points) + f_t (temporal LGSSM), with every
Sigma_y^{-1/2} solve running through the blocked two-pass Kalman engine.
Three measured rows:

  (a) ``whiten``  — batched whitening of the (M+1)-column stack
      [y - m | K_fu] in ONE blocked filter pass (the K6 fix at scale).
  (b) ``train``   — full 5-hyperparameter gradient step on the DTC bound via
      the batched closed-form disturbance-smoother VJP
      (``ssm/blocked_grad.whiten_gram``), staged as separately compiled
      dispatches: prepare / forward-whiten / bound+Gram-cotangents /
      backward-adjoint / pullback+Adam.  Plain ``jax.grad`` of the fused
      batched filter is mathematically identical but produces the program
      class that stalls this sandbox's remote compile service at N = 1e6
      (BENCHMARKS.md "engine dispatch diagnosis"); the split halves compile
      in seconds each.  ``--fused`` opts into the one-jit custom-VJP step
      for healthy toolchains.
  (c) ``predict`` — exact analytic predictive (``gp/dtc.py::predict_scaled``
      algebra) at N + N* points via split filter / smoother-given-filter
      dispatches.

``--check`` (CPU): assert the staged training gradient == one-jit
``jax.grad`` of ``dtc_objective(filter_fn="blocked")`` at small N.

Usage: python benchmarks/million_dtc.py [N] [--m=32] [--steps=20]
       [--nstar=10000] [--only=whiten|train|predict] [--check] [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._common import chol_psd, setup_jax  # noqa: E402

jax = setup_jax(cpu="--cpu" in sys.argv, x64=False)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_LOG_2PI = 1.8378770664093453


def make_data(N, N_star, rng):
    """Chained-conditional synthetic: y = f_t(t) + f_x(X) + noise, with test
    times spliced inside the training range (the reference's prediction
    regime, ``src/gp/gpar_scaled_inference.jl:74-87``)."""
    t_all = np.sort(rng.uniform(0.0, N / 1000.0, size=N + N_star))
    idx = rng.permutation(N + N_star)
    test_idx = np.sort(idx[:N_star])
    train_idx = np.sort(idx[N_star:])
    t, t_star = t_all[train_idx], t_all[test_idx]

    def xcols(tv):
        return np.stack(
            [np.sin(0.7 * tv) + 0.1 * np.cos(3.1 * tv), np.cos(0.23 * tv)], axis=1
        )

    X, X_star = xcols(t), xcols(t_star)
    f_t = lambda tv: 0.8 * np.sin(2.2 * tv) * np.cos(0.31 * tv)
    f_x = lambda Xv: 0.6 * np.sin(1.3 * Xv[:, 0]) + 0.4 * Xv[:, 1]
    sn = 0.25
    y = f_t(t) + f_x(X) + sn * rng.normal(size=N)
    truth_star = f_t(t_star) + f_x(X_star)
    return t, X, y, t_star, X_star, truth_star, sn


def main():
    from gpar_at_scale_tpu.kernels import Matern52
    from gpar_at_scale_tpu.ssm.blocked_grad import whiten_bwd, whiten_fwd_aux
    from gpar_at_scale_tpu.ssm.markov import lgssm_of
    from gpar_at_scale_tpu.utils.params import pack_gpar, unpack_gpar

    import optax

    N = int(next((a for a in sys.argv[1:] if not a.startswith("--")), 1_000_000))
    M = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--m=")), 32)
    STEPS = next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--steps=")), 20
    )
    N_star = next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--nstar=")), 10_000
    )
    only = next((a.split("=")[1] for a in sys.argv[1:] if a.startswith("--only=")), None)

    f32 = jnp.float32
    rng = np.random.default_rng(0)
    t_np, X_np, y_np, ts_np, Xs_np, truth_star, true_sn = make_data(N, N_star, rng)
    t = jnp.asarray(t_np, f32)
    X = jnp.asarray(X_np, f32)
    y = jnp.asarray(y_np, f32)
    Z = jnp.asarray(X_np[:: max(1, N // M)][:M], f32)

    # warm the remote compile service (r3: first compile in a process pays
    # ~80-140 s of connection warmup regardless of program size)
    float(np.asarray(jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64)))))
    print(f"N={N:,}  M={Z.shape[0]}  N*={N_star:,}  device={jax.devices()[0]}", flush=True)

    def build(p):
        tl, tsig, ol, osig, ns = unpack_gpar(p)
        time_k = Matern52(lengthscale=tl, variance=tsig**2)
        out_k = Matern52(lengthscale=ol, variance=osig**2)
        return time_k, out_k, ns**2

    def arrays(p):
        """p -> every input of the staged bound: LGSSM arrays, column stack
        U = [y | K_fu], ridged K_uu (auto ridge = observation noise, the
        reference's u-FiniteGP noise, ``src/gp/dtc.jl:35``)."""
        time_k, out_k, nv = build(p)
        lg = lgssm_of(time_k, t, nv, f32)
        Kfu = out_k(X, Z)
        U = jnp.concatenate([y[:, None], Kfu], axis=1)
        Kuu = out_k(Z, Z) + nv * jnp.eye(Z.shape[0], dtype=f32)
        return lg.A, lg.Q, jnp.broadcast_to(lg.R, (N,)), lg.H, U, Kuu

    def bound_from_gram(G, logdet, Kuu):
        """P-form DTC bound from the whitened Gram (same algebra as
        ``gp/dtc.py::dtc_objective``)."""
        with jax.default_matmul_precision("highest"):
            aa, g, Gb = G[0, 0], G[1:, 0], G[1:, 1:]
            L_uu = jnp.linalg.cholesky(Kuu)
            L_P = jnp.linalg.cholesky(Gb + Kuu)
            wp = jax.scipy.linalg.solve_triangular(L_P, g, lower=True)
            ld = lambda L: 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            return -0.5 * (
                N * _LOG_2PI + logdet + ld(L_P) - ld(L_uu) + aa - jnp.sum(wp**2)
            )

    p0 = jnp.asarray(pack_gpar(0.5, 1.0, 1.0, 0.7, 0.2), f32)

    if "--check" in sys.argv:
        _check(arrays, bound_from_gram, whiten_fwd_aux, whiten_bwd, build, t, X, Z, y, N)
        return

    MIXED = next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--mixed-bwd=")),
        0,
    )
    # --fwd-chunk=K: stage the FORWARD whitening as K-column filter chunks
    # that emit their whitened columns W_c, then one (M+1)x(M+1) Gram
    # matmul over the stored W.  At M = 256 the single-dispatch forward's
    # plan holds (N, d, 257) element temps (~12 GB padded) and OOMs
    # (measured r5: m256_whiten RESOURCE_EXHAUSTED); W itself is only
    # ~1.5 GB, so chunk-filter + store + one MXU matmul fits.  Exact.
    FWDC = next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--fwd-chunk=")),
        0,
    )
    jarrays = jax.jit(arrays)

    # FLAT inter-dispatch layout: (N, d, d) buffers are tiled T(4,128)
    # (~2 GB each at N=1e6 vs 36 MB packed) and (N, M+1) pads the column
    # axis to 128-multiples; shipping A/Q/U flat between programs and
    # reshaping inside the consumer keeps the resident set ~1 GB instead
    # of ~6 GB (the m256 train OOM, r5).
    _d_state = int(jax.eval_shape(arrays, p0)[0].shape[-1])
    _ncols = Z.shape[0] + 1

    @jax.jit
    def jarrays_flat(p):
        A, Q, R, H, U, Kuu = arrays(p)
        return A.reshape(-1), Q.reshape(-1), R, H, U.reshape(-1), Kuu

    def _unflat(Af, Qf, Uf):
        A = Af.reshape(N, _d_state, _d_state)
        Q = Qf.reshape(N, _d_state, _d_state)
        U = Uf.reshape(N, _ncols)
        return A, Q, U

    if FWDC:
        from gpar_at_scale_tpu.ssm.blocked import blocked_filter as _bfilter
        from gpar_at_scale_tpu.ssm.markov import LGSSM as _LGSSM

        # NOTE each program takes the PREBUILT arrays as traced arguments.
        # Inlining arrays(p) (kernel eval + discretize) into the same
        # program as the filter stalls the remote compile service on EVERY
        # attempt at M=128 (r5; 3 stalls >10 min), while the arrays-as-args
        # whiten compiles in ~40 s — the same split that makes
        # chain_scale.py's shared compile set work.
        @jax.jit
        def jw_chunk(Af, Qf, R, H, Uf, j):
            A, Q, U = _unflat(Af, Qf, Uf)
            Upad = jnp.pad(U, ((0, 0), (0, (-U.shape[1]) % FWDC)))
            Uc = jax.lax.dynamic_slice_in_dim(Upad, j, FWDC, 1)
            res = _bfilter(_LGSSM(A=A, Q=Q, H=H, R=R), Uc)
            W_c = res.v / jnp.sqrt(res.S)[:, None]
            return W_c, jnp.sum(jnp.log(res.S))

        @jax.jit
        def jgram_cat(Ws):
            W = jnp.concatenate(Ws, axis=1)
            with jax.default_matmul_precision("highest"):
                return W.T @ W

        def fwd_chunked(p):
            arrs = jarrays_flat(p)
            Af, Qf, R, H, Uf, Kuu = arrs
            ncols = Z.shape[0] + 1
            padded = ncols + (-ncols) % FWDC
            Ws, logdet = [], None
            for j in range(0, padded, FWDC):
                W_c, ld = jw_chunk(Af, Qf, R, H, Uf, j)
                Ws.append(W_c)
                logdet = ld
            G = jgram_cat(tuple(Ws))[:ncols, :ncols]
            return G, logdet, Kuu, arrs

    # ---- (a) batched whitening ------------------------------------------
    if only in (None, "whiten") and FWDC:
        t0 = time.time()
        G, ldn, _, _ = fwd_chunked(p0)
        float(np.asarray(ldn))
        print(f"whiten (fwd-chunked) compile+1st: {time.time()-t0:6.1f}s", flush=True)
        ncols = Z.shape[0] + 1
        runs = []
        for i in range(5):
            p_i = p0 + f32((i + 1) * 1e-6)
            t0 = time.time()
            G, ldn, _, _ = fwd_chunked(p_i)
            float(np.asarray(G[0, 0])) + float(np.asarray(ldn))
            runs.append(time.time() - t0)
        el = min(runs)
        print(
            f"(a) batched whiten [fwd-chunk={FWDC}, {ncols} cols x {N:,} steps]: "
            f"{el*1e3:9.2f} ms ({N/el/1e6:7.2f} M steps/s, "
            f"{N*ncols/el/1e6:8.1f} M col-steps/s)",
            flush=True,
        )
    if only in (None, "whiten") and not FWDC:
        A, Q, R, H, U, Kuu = jax.jit(arrays)(p0)

        @jax.jit
        def whiten_pass(A, Q, R, H, U):
            G, logdet, _ = whiten_fwd_aux(A, Q, R, H, U)
            return G, logdet

        t0 = time.time()
        G, ldn = whiten_pass(A, Q, R, H, U)
        float(np.asarray(ldn))  # host fetch = true completion barrier
        print(f"whiten compile+1st: {time.time()-t0:6.1f}s", flush=True)
        runs = []
        for i in range(5):
            U2 = U + f32((i + 1) * 1e-6)  # vary args: remote service memoizes
            t0 = time.time()
            G, ldn = whiten_pass(A, Q, R, H, U2)
            float(np.asarray(ldn))
            runs.append(time.time() - t0)
        el = min(runs)
        print(
            f"(a) batched whiten [{U.shape[1]} cols x {N:,} steps]: "
            f"{el*1e3:9.2f} ms ({N/el/1e6:7.2f} M steps/s, "
            f"{N*U.shape[1]/el/1e6:8.1f} M col-steps/s)",
            flush=True,
        )

    # ---- (b-mixed) bounded-memory train step at ANY M --------------------
    # --mixed-bwd=K: the factored-cotangent backward (ctsym = -F F^T on the
    # host in f64; linearity of filter/scan in observation columns =>
    # r @ F = scan(filter(U @ F))) runs the backward over K mixed columns
    # at a time with per-chunk pullback to the 5-vector gradient — nothing
    # full-width resident.  The direct staged backward OOMs at M = 128
    # (full-width aux m is (N, d, M+1); measured RESOURCE_EXHAUSTED r5).
    # Exact: tests/test_mixed_bwd.py.
    if only in (None, "train") and MIXED:
        import scipy.linalg as sla

        from gpar_at_scale_tpu.ssm.blocked_grad import (
            cotangent_factor,
            whiten_bwd_ld_part,
            whiten_bwd_mixed_chunk,
        )

        opt = optax.adam(5e-2)
        Mz = Z.shape[0]

        # arrays-as-args staging throughout (see the fwd-chunk NOTE: fusing
        # arrays(p) into the filter program stalls the remote compiler).
        @jax.jit
        def jwhiten_full(Af, Qf, R, H, Uf):
            A, Q, U = _unflat(Af, Qf, Uf)
            G, logdet, _ = whiten_fwd_aux(A, Q, R, H, U)
            return G, logdet  # aux dead-code-eliminated by XLA

        def host_bound(G, logdet, Kuu):
            """P-form bound + closed-form cotangents in host f64 (the M x M
            factorization passes the f32 cliff at cond(Gb+Kuu) ~ N/ridge)."""
            G64 = np.asarray(G, np.float64)
            K64 = np.asarray(Kuu, np.float64)
            aa, g, Gb = G64[0, 0], G64[1:, 0], G64[1:, 1:]
            # chol_psd: the f32 on-chip Gram's own error can leave Gb + Kuu
            # numerically indefinite in f64 (r5 chain finding) — escalating
            # relative jitter, negligible vs the Gram's f32 error.
            L_P, _ = chol_psd(Gb + K64)
            L_K, _ = chol_psd(K64)
            cP = (L_P, True)
            cK = (L_K, True)
            ldP = 2.0 * np.sum(np.log(np.diag(L_P)))
            ldK = 2.0 * np.sum(np.log(np.diag(L_K)))
            beta = sla.cho_solve(cP, g)
            val = -0.5 * (
                N * _LOG_2PI + float(np.asarray(logdet)) + ldP - ldK + aa - g @ beta
            )
            Pinv = sla.cho_solve(cP, np.eye(Mz))
            Kinv = sla.cho_solve(cK, np.eye(Mz))
            Sm = -0.5 * (Pinv + np.outer(beta, beta))
            ct_G = np.zeros((Mz + 1, Mz + 1))
            ct_G[0, 0] = -0.5
            ct_G[1:, 0] = beta
            ct_G[1:, 1:] = Sm
            ct_K = Sm + 0.5 * Kinv
            return val, ct_G, -0.5, ct_K

        @jax.jit
        def jchunk(Af, Qf, R, H, Uf, Fk):
            A, Q, U = _unflat(Af, Qf, Uf)
            cA, cQ, cR, cU = whiten_bwd_mixed_chunk(A, Q, R, H, U, Fk)
            return cA.reshape(-1), cQ.reshape(-1), cR, cU.reshape(-1)

        @jax.jit
        def jld(Af, Qf, R, H, ct_ld, Uf):
            A, Q, U = _unflat(Af, Qf, Uf)
            cA, cQ, cR = whiten_bwd_ld_part(A, Q, R, H, ct_ld)
            return cA.reshape(-1), cQ.reshape(-1), cR, jnp.zeros(U.size, U.dtype)

        @jax.jit
        def jacc(cts, dlt):
            return jax.tree.map(jnp.add, cts, dlt)

        @jax.jit
        def jpull(p, st, cAf, cQf, cR, cUf, ct_K):
            def rebuild(pp):
                A, Q, R, H, U, Kuu = arrays(pp)
                return A, Q, R, U, Kuu

            cA = cAf.reshape(N, _d_state, _d_state)
            cQ = cQf.reshape(N, _d_state, _d_state)
            cU = cUf.reshape(N, Mz + 1)
            _, vjp = jax.vjp(rebuild, p)
            (g,) = vjp((cA, cQ, cR, cU, ct_K))
            g = -g / N
            up, st = opt.update(g, st)
            return optax.apply_updates(p, up), st

        def run_mixed(p0, steps, verbose=False):
            p, st = p0, opt.init(p0)
            vals = []
            for s_i in range(steps):
                t0 = time.time()
                if FWDC:
                    G, logdet, Kuu, (Af, Qf, R, H, Uf, _) = fwd_chunked(p)
                else:
                    Af, Qf, R, H, Uf, Kuu = jarrays_flat(p)
                    G, logdet = jwhiten_full(Af, Qf, R, H, Uf)
                val, ct_G, ct_ld, ct_K = host_bound(G, logdet, Kuu)
                del G, logdet, Kuu
                F = cotangent_factor(ct_G).astype(np.float32)
                Bc = F.shape[0]
                cts = jld(Af, Qf, R, H, jnp.float32(ct_ld), Uf)
                for j in range(0, Bc, MIXED):
                    Fk = F[:, j : j + MIXED]
                    if Fk.shape[1] < MIXED:  # zero cols contribute exactly 0
                        Fk = np.pad(Fk, ((0, 0), (0, MIXED - Fk.shape[1])))
                    cts = jacc(cts, jchunk(Af, Qf, R, H, Uf, jnp.asarray(Fk, f32)))
                del Af, Qf, R, H, Uf  # free the args before the pullback
                p, st = jpull(p, st, *cts, jnp.asarray(ct_K, f32))
                del cts
                vals.append(val)
                if verbose and s_i == 0:
                    float(np.asarray(p[0]))
                    print(f"  [first mixed step] {time.time()-t0:.1f}s", flush=True)
            float(np.asarray(p[0]))  # barrier
            return p, vals

        t0 = time.time()
        p, vals = run_mixed(p0, STEPS, verbose=True)
        print(f"mixed train compile+{STEPS} steps: {time.time()-t0:6.1f}s", flush=True)
        t0 = time.time()
        p, vals = run_mixed(p0, STEPS)
        steady = time.time() - t0
        nll = [-v / N for v in vals]
        tl, tsig, ol, osig, ns = (float(v) for v in unpack_gpar(p))
        nchunk = -(-(Mz + 1) // MIXED)
        print(
            f"(b) DTC train [mixed-bwd, M={Mz}, chunk={MIXED}]: "
            f"{steady/STEPS*1e3:9.1f} ms/step ({N*STEPS/steady/1e6:7.2f} M "
            f"filter steps/s fwd; ~{3+nchunk} dispatches/step)",
            flush=True,
        )
        print(f"    nll/N trace: {['%.4f' % v for v in nll]}", flush=True)
        print(
            f"    optimized (tl, ts, ol, os, sn) = ({tl:.3f}, {tsig:.3f}, "
            f"{ol:.3f}, {osig:.3f}, {ns:.3f})  true noise {true_sn}",
            flush=True,
        )

    # ---- (b) staged DTC training step -----------------------------------
    # THREE separately-compiled dispatches per step (fwd / bwd / pullback).
    # Folding arrays into fwd and the bound's Gram-cotangents into bwd
    # minimizes compile events per process: this sandbox's remote compile
    # service stalls NONDETERMINISTICALLY per compile (measured
    # results_r4/diag_dtc_1m*.txt: the same program compiles in ~21 s on one
    # attempt and hangs >420 s on another, even a 64x64 warmup jit can
    # hang), so fewer compiles = fewer stall rolls; the queue retries the
    # whole row on a stall.
    if only in (None, "train") and not MIXED:
        opt = optax.adam(5e-2)

        @jax.jit
        def jfwd(p):
            A, Q, R, H, U, Kuu = arrays(p)
            G, logdet, aux = whiten_fwd_aux(A, Q, R, H, U)
            return A, Q, R, H, U, Kuu, G, logdet, aux

        @jax.jit
        def jbwd(A, Q, R, H, Kuu, G, logdet, aux):
            val, (ct_G, ct_ld, ct_K) = jax.value_and_grad(
                bound_from_gram, argnums=(0, 1, 2)
            )(G, logdet, Kuu)
            ct_A, ct_Q, ct_R, ct_U = whiten_bwd(A, Q, R, H, aux, ct_G, ct_ld)
            return val, ct_A, ct_Q, ct_R, ct_U, ct_K

        # --bwd-chunk=K (default 8): stage the backward as
        # bound-grads / elements / K-column suffix-scan chunks / scores —
        # the fused wide-column jbwd program stalled the remote compile
        # service on every attempt (r4 measured: wide-suffix-scan programs
        # 0/5 vs narrow ones and wide FORWARD filters compiling in ~20-30 s;
        # the affine adjoint recursion is per-column independent, so
        # chunked == fused exactly).  --bwd-chunk=0 opts back into the
        # one-program jbwd for healthy toolchains.
        BK = next(
            (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--bwd-chunk=")),
            8,
        )
        if BK:
            from gpar_at_scale_tpu.ssm.blocked import blocked_suffix_scan
            from gpar_at_scale_tpu.ssm.blocked_grad import (
                whiten_bwd_elements,
                whiten_bwd_scores,
            )

            @jax.jit
            def jbound(G, logdet, Kuu):
                val, (ct_G, ct_ld, ct_K) = jax.value_and_grad(
                    bound_from_gram, argnums=(0, 1, 2)
                )(G, logdet, Kuu)
                return val, ct_G, ct_ld, ct_K

            jelems = jax.jit(whiten_bwd_elements)
            jpad_b = jax.jit(
                lambda b: jnp.pad(b, ((0, 0), (0, 0), (0, (-b.shape[2]) % BK)))
            )
            jslice_b = jax.jit(
                lambda b, j: jax.lax.dynamic_slice_in_dim(b, j, BK, 2)
            )
            jsuffix = jax.jit(lambda C, bc, W: blocked_suffix_scan(C, bc, W))
            jcat_r = jax.jit(
                lambda rs, ncols: jnp.concatenate(rs, axis=2)[:, :, :ncols],
                static_argnums=1,
            )
            jscores = jax.jit(whiten_bwd_scores)

        @jax.jit
        def jpull(p, st, ct_A, ct_Q, ct_R, ct_U, ct_K):
            _, vjp = jax.vjp(lambda pp: _drop_h(arrays(pp)), p)
            (g,) = vjp((ct_A, ct_Q, ct_R, ct_U, ct_K))
            g = -g / N  # minimize nll = -bound / N
            up, st = opt.update(g, st)
            return optax.apply_updates(p, up), st

        def _drop_h(out):
            A, Q, R, H, U, Kuu = out
            return A, Q, R, U, Kuu

        def run(p0, steps, verbose=False):
            # jit calls block on COMPILE (execution is async), so first-step
            # pre-prints name the staller even when it never returns.
            p, st = p0, opt.init(p0)
            vals = []

            def timed(name, first, fn, *a):
                if not first:
                    return fn(*a)
                print(f"  [first step] {name}...", end="", flush=True)
                t0 = time.time()
                out = fn(*a)
                print(f" {time.time()-t0:.1f}s", flush=True)
                return out

            for s_i in range(steps):
                first = verbose and s_i == 0
                A, Q, R, H, U, Kuu, G, logdet, aux = timed("jfwd", first, jfwd, p)
                if BK:
                    val, ct_G, ct_ld, ct_K = timed("jbound", first, jbound, G, logdet, Kuu)
                    C, b, W = timed("jelems", first, jelems, A, H, aux)
                    b = timed("jpad_b", first, jpad_b, b)
                    ncols = U.shape[1]
                    rs, Nmat = [], None
                    for j in range(0, b.shape[2], BK):
                        _, r_c, Nm = timed(
                            f"jsuffix[{j}]", first, jsuffix, C, jslice_b(b, j), W
                        )
                        rs.append(r_c)
                        if Nmat is None:
                            Nmat = Nm
                    r = timed("jcat_r", first, jcat_r, tuple(rs), ncols)
                    ct_A, ct_Q, ct_R, ct_U = timed(
                        "jscores", first, jscores, A, Q, R, H, aux, r, Nmat, ct_G, ct_ld
                    )
                else:
                    val, ct_A, ct_Q, ct_R, ct_U, ct_K = timed(
                        "jbwd", first, jbwd, A, Q, R, H, Kuu, G, logdet, aux
                    )
                p, st = timed("jpull", first, jpull, p, st, ct_A, ct_Q, ct_R, ct_U, ct_K)
                vals.append(val)
            float(np.asarray(vals[-1])) + float(np.asarray(p[0]))  # barrier
            return p, vals

        t0 = time.time()
        p, vals = run(p0, STEPS, verbose=True)
        print(f"train compile+{STEPS} steps: {time.time()-t0:6.1f}s", flush=True)
        t0 = time.time()
        p, vals = run(p0, STEPS)
        steady = time.time() - t0
        nll = [-float(np.asarray(v)) / N for v in vals]
        tl, tsig, ol, osig, ns = (float(v) for v in unpack_gpar(p))
        ndisp = 3 if not BK else 7 + -(-(Z.shape[0] + 1) // BK)
        print(
            f"(b) DTC train [5 hyperparams, M={Z.shape[0]}]: "
            f"{steady/STEPS*1e3:9.1f} ms/step ({N*STEPS/steady/1e6:7.2f} M "
            f"filter steps/s fwd+bwd; ~{ndisp} dispatches/step)",
            flush=True,
        )
        print(f"    nll/N trace: {['%.4f' % v for v in nll]}", flush=True)
        print(
            f"    optimized (tl, ts, ol, os, sn) = ({tl:.3f}, {tsig:.3f}, "
            f"{ol:.3f}, {osig:.3f}, {ns:.3f})  true noise {true_sn}",
            flush=True,
        )

    # ---- (c) analytic predictive at N + N* via split dispatches ----------
    if only in (None, "predict"):
        from gpar_at_scale_tpu.ssm.blocked import blocked_filter, blocked_smooth

        time_k, out_k, nv = build(p0)
        t_star = jnp.asarray(ts_np, f32)
        X_star = jnp.asarray(Xs_np, f32)

        @jax.jit
        def q_u(p):
            A, Q, R, H, U, Kuu = arrays(p)
            G, logdet, _ = whiten_fwd_aux(A, Q, R, H, U)
            with jax.default_matmul_precision("highest"):
                g, Gb = G[1:, 0], G[1:, 1:]
                L_uu = jnp.linalg.cholesky(Kuu)
                # D = A A^T + I = L_uu^-1 (Gb + Kuu) L_uu^-T
                AAt = jax.scipy.linalg.solve_triangular(
                    L_uu,
                    jax.scipy.linalg.solve_triangular(L_uu, Gb, lower=True).T,
                    lower=True,
                )
                D = AAt + jnp.eye(AAt.shape[0], dtype=f32)
                L_D = jnp.linalg.cholesky(0.5 * (D + D.T))
                Aalpha = jax.scipy.linalg.solve_triangular(L_uu, g, lower=True)
                m_eps = jax.scipy.linalg.solve_triangular(
                    L_D.T,
                    jax.scipy.linalg.solve_triangular(L_D, Aalpha, lower=True),
                    lower=False,
                )
            return m_eps, L_D, L_uu

        @jax.jit
        def prepare(p, m_eps, L_D, L_uu):
            """Splice train+test, build the (M+1)-column smoothing stack."""
            time_k, out_k, nv = build(p)
            t_all = jnp.concatenate([t, t_star])
            V_all = jnp.concatenate([X, X_star], axis=0)
            y_all = jnp.concatenate([y, jnp.zeros((N_star,), f32)])
            noise_all = jnp.concatenate(
                [jnp.full((N,), nv, f32), jnp.full((N_star,), 1e10, f32)]
            )
            order = jnp.argsort(t_all)
            t_s, V_s, y_s, noise_s = (
                t_all[order], V_all[order], y_all[order], noise_all[order]
            )
            lg = lgssm_of(time_k, t_s, noise_s, f32)
            with jax.default_matmul_precision("highest"):
                K_su = out_k(V_s, Z)
                Phi = jax.scipy.linalg.solve_triangular(L_uu, K_su.T, lower=True).T
                fx_bar = Phi @ m_eps
                Gm = jax.scipy.linalg.solve_triangular(L_D, Phi.T, lower=True).T
                cols = jnp.concatenate([(y_s - fx_bar)[:, None], Gm], axis=1)
            return lg, cols, fx_bar, Gm, order

        @jax.jit
        def finish(sm_mean, sm_var, fx_bar, Gm, order):
            with jax.default_matmul_precision("highest"):
                mean_all = fx_bar + sm_mean[:, 0]
                Hm = Gm - sm_mean[:, 1:]  # (I - S) G
                var_all = jnp.sum(Hm * Hm, axis=1) + sm_var
            inv = jnp.argsort(order)
            return mean_all[inv][N:], jnp.maximum(var_all, 0.0)[inv][N:]

        jfilter = jax.jit(blocked_filter)
        jsmooth = jax.jit(
            lambda lg, cols, fr: blocked_smooth(lg, cols, filter_result=fr)
        )
        # --chunk-cols=K: run the filter+smoother over the M+1 columns in
        # K-column chunks sharing ONE compile each (the 33-column
        # smooth-given program drew repeated remote-compile stalls in
        # diag_dtc_1m; the K-column program is the r3-proven low-column
        # class).  Smoothing is per-column independent given the shared
        # (E, L) algebra, so chunked == fused exactly.
        chunk = next(
            (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--chunk-cols=")),
            0,
        )
        if chunk:
            jslice = jax.jit(
                lambda c, j: jax.lax.dynamic_slice_in_dim(c, j, chunk, 1)
            )
            jpad = jax.jit(
                lambda c: jnp.pad(c, ((0, 0), (0, (-c.shape[1]) % chunk)))
            )
            jcat = jax.jit(
                lambda ms, ncols: jnp.concatenate(ms, axis=1)[:, :ncols],
                static_argnums=1,
            )

        def predict(p):
            m_eps, L_D, L_uu = q_u(p)
            lg, cols, fx_bar, Gm, order = prepare(p, m_eps, L_D, L_uu)
            if chunk:
                ncols = cols.shape[1]
                pad = (-ncols) % chunk
                if pad:
                    cols = jpad(cols)
                means = []
                sm_var = None
                for j in range(0, ncols + pad, chunk):
                    cj = jslice(cols, j)
                    fr = jfilter(lg, cj)
                    sm = jsmooth(lg, cj, fr)
                    means.append(sm.mean)
                    sm_var = sm.var
                sm_mean = jcat(tuple(means), ncols)
            else:
                fr = jfilter(lg, cols)
                sm = jsmooth(lg, cols, fr)
                sm_mean, sm_var = sm.mean, sm.var
            mu, var = finish(sm_mean, sm_var, fx_bar, Gm, order)
            float(np.asarray(mu[0]))  # barrier
            return mu, var

        t0 = time.time()
        mu, var = predict(p0)
        print(f"predict compile+1st: {time.time()-t0:6.1f}s", flush=True)
        t0 = time.time()
        mu, var = predict(p0)
        el = time.time() - t0
        mu_np = np.asarray(mu)
        rmse = float(np.sqrt(np.mean((mu_np - truth_star) ** 2)))
        inside = np.mean(
            np.abs(mu_np - truth_star) < 2 * np.sqrt(np.asarray(var) + true_sn**2)
        )
        print(
            f"(c) predict [{N:,}+{N_star:,} pts, analytic, split dispatches]: "
            f"{el:8.2f} s  ({(N+N_star)/el/1e6:6.2f} M pts/s)",
            flush=True,
        )
        print(
            f"    rmse vs latent truth {rmse:.4f} (obs noise {true_sn}); "
            f"2-sigma coverage {inside:.3f}",
            flush=True,
        )


def _check(arrays, bound_from_gram, whiten_fwd_aux, whiten_bwd, build, t, X, Z, y, N):
    """Staged gradient == one-jit jax.grad of dtc_objective(filter_fn="blocked")."""
    from gpar_at_scale_tpu.gp.dtc import dtc_objective
    from gpar_at_scale_tpu.ssm.markov import lgssm_of

    p = jnp.asarray([0.12, -0.2, 0.3, 0.04, -1.3], jnp.float32)

    def staged(pp):
        A, Q, R, H, U, Kuu = arrays(pp)
        G, logdet, aux = whiten_fwd_aux(A, Q, R, H, U)
        val, (ct_G, ct_ld, ct_K) = jax.value_and_grad(
            bound_from_gram, argnums=(0, 1, 2)
        )(G, logdet, Kuu)
        ct_A, ct_Q, ct_R, ct_U = whiten_bwd(A, Q, R, H, aux, ct_G, ct_ld)
        _, vjp = jax.vjp(lambda q: tuple(x for i, x in enumerate(arrays(q)) if i != 3), pp)
        (g,) = vjp((ct_A, ct_Q, ct_R, ct_U, ct_K))
        return val, g

    def fused(pp):
        time_k, out_k, nv = build(pp)
        lg = lgssm_of(time_k, t, nv, jnp.float32)
        return dtc_objective(
            out_k, lg, X, Z, y, uu_ridge="auto", filter_fn="blocked"
        )

    v_s, g_s = staged(p)
    v_f, g_f = jax.value_and_grad(fused)(p)
    dv = abs(float(v_s) - float(v_f)) / abs(float(v_f))
    dg = float(np.max(np.abs(np.asarray(g_s) - np.asarray(g_f))))
    rg = dg / float(np.max(np.abs(np.asarray(g_f))))
    print(f"check N={N}: bound rel diff {dv:.2e}; grad max abs diff {dg:.3e} "
          f"(rel {rg:.2e})")
    assert dv < 1e-5 and rg < 1e-4, "staged gradient mismatch"
    print("staged == fused: OK")


if __name__ == "__main__":
    main()
