"""State-space GPAR at 1M steps: SMC hyperparameter posterior with the
blocked two-pass Kalman likelihood (north-star config 4).

SMC with random-walk mutations needs only likelihood VALUES; each tempering
stage evaluates the exact O(N) Kalman NLML for every particle through the
blocked engine (``ssm/blocked.py``) — full Bayesian inference over the
temporal-GP hyperparameters at a scale where the reference's sequential
filter would take ~minutes per evaluation and dense methods are unthinkable
(O(N^3) = 1e18 flops).

Pipeline: tempered SMC over (log_l, log_sigma_f, log_sigma_n) -> posterior
cloud -> smoothed predictive at the posterior-median hyperparameters via the
blocked RTS smoother.

``--host``: host-driven staging (``inference.smc.smc_host``) with the
vmapped blocked likelihood evaluated in chunks of ``--chunk`` particles per
device dispatch — the one-jit SMC program over 64 particles x 1M steps
carries ~8 GB of live scan state and never finishes compiling through this
sandbox's remote compile service (BENCHMARKS.md "engine dispatch
diagnosis").

``--map-init``: reference-bridged SMC.  At N=1e6 the log-likelihood spread
across prior-drawn particles is O(1e5), so ESS-adaptive tempering starts at
beta steps of ~1e-5; the steps grow geometrically and beta=1 IS reached —
measured: 16 stages / 1056 evals on the v5e
(``results_r3/million_smc_1m_host.txt``) — but most stages are spent
climbing the exponent.  This option installs the standard cheaper bridge
(SMC samplers with a fitted importance reference): host-driven Nelder-Mead
to the MAP re-using the SAME compiled likelihood program (zero extra
compiles), a finite-difference diagonal-Laplace scale, then temper from the
Gaussian reference q0 = N(map, (3*laplace)^2) to the exact target
prior*lik by writing the incremental potential as logprior + loglik -
logq0; logZ then estimates the true model evidence.  Measured at N=4096 on
CPU: beta=1 in 6 stages vs 16.

Usage: python benchmarks/million_smc.py [N] [--particles=64] [--host]
       [--chunk=8] [--mutations=3] [--map-init]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from gpar_at_scale_tpu.inference.smc import smc
    from gpar_at_scale_tpu.kernels import Matern52
    from gpar_at_scale_tpu.ssm.blocked import blocked_logpdf, blocked_smooth
    from gpar_at_scale_tpu.ssm.markov import lgssm_of
    from gpar_at_scale_tpu.utils.params import unpack_gp

    N = int(next((a for a in sys.argv[1:] if not a.startswith("--")), 1_000_000))
    P = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--particles=")), 64)

    rng = np.random.default_rng(0)
    true_l, true_sf, true_sn = 0.7, 1.2, 0.3
    t_np = np.cumsum(rng.uniform(0.5, 1.5, N)) / 1000.0
    # sample a ground-truth Matern path via the LGSSM recursion (cheap in numpy
    # would be slow; use a sine + OU-ish surrogate signal instead)
    f = 1.2 * np.sin(2 * np.pi * t_np / 7.0) * np.cos(2 * np.pi * t_np / 1.3)
    y_np = f + true_sn * rng.normal(size=N)

    t = jnp.asarray(t_np, jnp.float32)
    y = jnp.asarray(y_np, jnp.float32)

    def loglik(params):
        l, sf, sn = unpack_gp(params)
        k = Matern52(lengthscale=l, variance=sf**2)
        lgssm = lgssm_of(k, t, sn**2, jnp.float32)
        return blocked_logpdf(lgssm, y)

    def logprior(params):
        return -0.5 * jnp.sum(params**2) / 4.0

    def _predict(med, t, y, f, N, true_sn):
        # Split into two separately-jitted dispatches (filter, then
        # smoother-given-FilterResult): the FUSED filter+smoother program at
        # N=1e6 never finishes compiling through this sandbox's remote
        # compile service (BENCHMARKS.md "engine dispatch diagnosis").
        from gpar_at_scale_tpu.ssm.blocked import blocked_filter

        l, sf, sn = med
        k = Matern52(lengthscale=float(l), variance=float(sf) ** 2)
        lgssm = lgssm_of(k, t, float(sn) ** 2, jnp.float32)
        t0 = time.time()
        fr = jax.jit(blocked_filter)(lgssm, y)
        sm = jax.jit(
            lambda lg, yy, fres: blocked_smooth(lg, yy, filter_result=fres)
        )(lgssm, y, fr)
        fm = np.asarray(sm.mean)  # host fetch = true completion (tunnel barrier)
        rmse = float(np.sqrt(np.mean((fm - f) ** 2)))
        print(
            f"smoothed predictive (all {N:,} pts): rmse vs latent truth "
            f"{rmse:.4f} (noise {true_sn}) in {time.time()-t0:.1f}s", flush=True,
        )

    key = jax.random.PRNGKey(0)
    k_init, k_smc = jax.random.split(key)
    x0 = jax.random.normal(k_init, (P, 3), jnp.float32) * 0.5

    print(f"N={N:,}  particles={P}  device={jax.devices()[0]}", flush=True)

    med_arg = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--median=")), None
    )
    if "--predict-only" in sys.argv:
        # rerun just the final smoothed predictive (e.g. after a timeout killed
        # it) at given posterior-median hyperparameters: --median=l,sf,sn
        med = np.array([float(v) for v in med_arg.split(",")])
        _predict(med, t, y, f, N, true_sn)
        return
    if "--host" in sys.argv:
        from gpar_at_scale_tpu.inference.smc import smc_host

        CH = next(
            (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--chunk=")), 1
        )
        # chunk=1 (default here): one particle per dispatch through the plain
        # jit(loglik) program — identical structure to the standalone filter
        # that is known to compile and fit.  The vmapped 8-particle variant
        # plans 62 GB of HBM through the remote compile service
        # (results_r3/million_smc_1m_host.err) — ~8 GB per particle where the
        # sequential program needs ~2 GB, i.e. the planner keeps all lanes'
        # scan temporaries live; chunk>1 is only worth it on a healthy
        # toolchain.
        jll_1 = jax.jit(loglik)
        jll_v = jax.jit(jax.vmap(loglik)) if CH > 1 else None

        def log_lik_batch(xs):
            xs = np.asarray(xs, np.float32)
            if CH == 1:
                return np.array([float(np.asarray(jll_1(jnp.asarray(x)))) for x in xs])
            out = []
            for i in range(0, len(xs), CH):
                chunk = xs[i : i + CH]
                npad = CH - len(chunk)
                if npad:
                    chunk = np.concatenate([chunk, chunk[-1:].repeat(npad, 0)])
                vals = np.asarray(jll_v(jnp.asarray(chunk)))  # host fetch = barrier
                out.append(vals[: CH - npad])
            return np.concatenate(out)

        def log_prior_batch(xs):
            return -0.5 * np.sum(np.asarray(xs) ** 2, axis=1) / 4.0

        t0 = time.time()
        MUT = next(
            (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--mutations=")), 3
        )
        if "--map-init" in sys.argv:
            from scipy.optimize import minimize

            n_extra = 0

            def negll(p):
                nonlocal n_extra
                n_extra += 1
                return -float(np.asarray(jll_1(jnp.asarray(p, jnp.float32))))

            t_map = time.time()
            opt = minimize(
                negll, np.zeros(3), method="Nelder-Mead",
                options={"maxfev": 80, "xatol": 1e-3, "fatol": 0.5},
            )
            pmap = opt.x
            # diagonal finite-difference Laplace scale per dimension
            h = 0.02
            f0 = -opt.fun
            s = np.empty(3)
            for i in range(3):
                e = np.zeros(3); e[i] = h
                fp, fm = -negll(pmap + e), -negll(pmap - e)
                curv = max((2 * f0 - fp - fm) / h**2, 1e-2)  # -d2f/dx2
                s[i] = 1.0 / np.sqrt(curv)
            print(
                f"MAP (Nelder-Mead, host-driven, {n_extra} evals, "
                f"{time.time()-t_map:.1f}s): {np.round(pmap, 3)}  "
                f"laplace scale {np.round(s, 4)}", flush=True,
            )
            q_scale = 3.0 * s
            x0 = pmap[None, :] + q_scale[None, :] * np.asarray(
                jax.random.normal(k_init, (P, 3), jnp.float32)
            )

            def logq0(xs):
                z = (np.asarray(xs) - pmap[None, :]) / q_scale[None, :]
                return (
                    -0.5 * np.sum(z * z, axis=1)
                    - np.log(q_scale).sum()
                    - 1.5 * np.log(2 * np.pi)
                )

            raw_lik = log_lik_batch

            def log_lik_batch_bridged(xs):
                # incremental potential: target (prior*lik) over reference q0
                return raw_lik(xs) + log_prior_batch(xs) - logq0(xs)

            res = smc_host(
                0, logq0, log_lik_batch_bridged, np.asarray(x0),
                num_mutations=MUT, ess_threshold=0.5, max_stages=20, verbose=True,
            )
            res = res._replace(num_lik_evals=res.num_lik_evals + n_extra)
        else:
            res = smc_host(
                0, log_prior_batch, log_lik_batch, np.asarray(x0),
                num_mutations=MUT, ess_threshold=0.5, max_stages=20, verbose=True,
            )
        el = time.time() - t0
        post = np.asarray(res.particles)
        print(
            f"SMC host-driven: {el:.1f}s  stages={res.num_stages}  "
            f"beta={res.final_beta:.2f}  logZ={res.log_evidence:.1f}  "
            f"accept={res.acceptance:.2f}"
        )
        n_evals = res.num_lik_evals
        print(f"{n_evals} likelihood evals ({n_evals*N/el/1e6:.2f} M filter steps/s "
              f"incl. compile+staging)")
    else:
        run = jax.jit(
            lambda key, x0: smc(
                key, logprior, loglik, x0, num_mutations=3, ess_threshold=0.5, max_stages=20
            )
        )
        t0 = time.time()
        res = run(k_smc, x0)
        post = np.asarray(res.particles)
        el = time.time() - t0
        print(f"SMC (compile+run): {el:.1f}s  stages={int(res.num_stages)}  "
              f"beta={float(res.final_beta):.2f}  logZ={float(res.log_evidence):.1f}")
        t0 = time.time()
        res = run(k_smc, x0)
        post = np.asarray(res.particles)
        el = time.time() - t0
        # total likelihood evaluations: stages * (1 + mutations) * particles
        n_evals = int(res.num_stages) * 4 * P
        print(f"SMC (warm): {el:.1f}s  ~{n_evals} likelihood evals "
              f"({n_evals*N/el/1e9:.1f} B filter steps/s)")

    med = np.exp(np.median(post, axis=0)) + 1e-3
    print(f"posterior median (l, sigma_f, sigma_n): {np.round(med, 3)}  "
          f"true noise: {true_sn}")

    # predictive smoothing at the median hyperparameters over the FULL N
    _predict(med, t, y, f, N, true_sn)


if __name__ == "__main__":
    main()
