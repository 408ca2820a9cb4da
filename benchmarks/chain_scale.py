"""16-output GPAR chain at N = 1e6 on one chip — BASELINE.md config 5's
model shape at the flagship sequence length.

The reference's centerpiece is the chained scaled pipeline
(``examples/GPAR_scaled_examples.jl:86-216``: y1 temporal, y2/y3 scaled
conditionals, feed-forward of predicted means at ``:172``), demonstrated at
N = 10k with a 170-250 s Nelder-Mead budget per conditional.  This driver
runs the SAME pipeline shape at P outputs and N = 1e6:

  * output 1 — temporal GP: staged closed-form-gradient Adam steps on the
    exact O(N) Kalman NLML (``ssm/blocked_grad``), then spliced-series
    smoothing prediction;
  * outputs 2..P — scaled DTC conditionals (temporal structured noise,
    M inducing points), each trained with the staged disturbance-smoother
    VJP and predicted with the exact analytic predictive, feeding forward
    predicted means down the chain (``GPAR_examples/toy_example.jl:118-135``).

ONE compile set serves all P-1 conditionals: conditioning inputs are
zero-padded to the fixed chain width (stationary kernels ignore
constant-zero dims — their pairwise distances are unchanged; the same
width-padding argument as ``models/gpar.py::fit_conditionals_parallel``),
so (p, X, Z, y) are traced arguments of shape-stable programs and the
remote-compile cost is paid once, not per output.

Usage: python benchmarks/chain_scale.py [N] [--outputs=16] [--m=32]
       [--steps=10] [--nstar=10000] [--chunk-cols=8] [--bwd-chunk=8] [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._common import chol_psd, farthest_points, setup_jax  # noqa: E402

jax = setup_jax(cpu="--cpu" in sys.argv, x64=False)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_LOG_2PI = 1.8378770664093453


def _arg(name, default):
    return next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith(f"--{name}=")),
        default,
    )


def make_chain_data(N, N_star, P, rng, sn=0.25):
    """P-output chained synthetic series: y_1 purely temporal; output i >= 2
    a nonlinear function of the previous output and y_1 plus its own
    temporal component (the chained structure of
    ``src/data/toy_data.jl:76-98`` widened to P outputs).  Latent truth is
    chained on NOISE-FREE values; observations add iid noise per output."""
    t_all = np.sort(rng.uniform(0.0, (N + N_star) / 1000.0, size=N + N_star))
    idx = rng.permutation(N + N_star)
    test_idx = np.sort(idx[:N_star])
    train_idx = np.sort(idx[N_star:])
    t, t_star = t_all[train_idx], t_all[test_idx]

    w1 = 1.0 + 0.31 * np.arange(P)
    w2 = 0.17 + 0.059 * np.arange(P)
    amp = 0.8 - 0.3 * np.arange(P) / P

    def f_t(i, tv):
        return amp[i] * np.sin(w1[i] * tv) * np.cos(w2[i] * tv)

    def chain(tv, n_pts, noise):
        lat = np.zeros((n_pts, P))
        obs = np.zeros((n_pts, P))
        lat[:, 0] = f_t(0, tv)
        obs[:, 0] = lat[:, 0] + sn * noise[:, 0]
        for i in range(1, P):
            lat[:, i] = (
                0.55 * np.tanh(lat[:, i - 1])
                + 0.35 * np.sin(1.3 * lat[:, 0])
                + f_t(i, tv)
            )
            obs[:, i] = lat[:, i] + sn * noise[:, i]
        return lat, obs

    _, Y = chain(t, N, rng.normal(size=(N, P)))
    lat_star, _ = chain(t_star, N_star, np.zeros((N_star, P)))
    return t, Y, t_star, lat_star, sn


def main():
    import optax

    from gpar_at_scale_tpu.kernels import Matern52
    from gpar_at_scale_tpu.ssm.blocked import (
        blocked_filter,
        blocked_smooth,
        blocked_suffix_scan,
    )
    from gpar_at_scale_tpu.ssm.blocked_grad import (
        loglik_bwd,
        loglik_fwd_aux,
        whiten_bwd_elements,
        whiten_bwd_scores,
        whiten_fwd_aux,
    )
    from gpar_at_scale_tpu.ssm.markov import lgssm_of
    from gpar_at_scale_tpu.utils.params import pack_gp, pack_gpar, unpack_gp, unpack_gpar

    N = int(next((a for a in sys.argv[1:] if not a.startswith("--")), 1_000_000))
    P = _arg("outputs", 16)
    M = _arg("m", 32)
    STEPS = _arg("steps", 10)
    N_star = _arg("nstar", 10_000)
    CHUNK = _arg("chunk-cols", 8)
    BK = _arg("bwd-chunk", 8)
    WIDTH = P - 1  # fixed zero-padded conditioning width

    f32 = jnp.float32
    rng = np.random.default_rng(0)
    t_np, Y_np, ts_np, lat_star, true_sn = make_chain_data(N, N_star, P, rng)
    t = jnp.asarray(t_np, f32)
    t_star = jnp.asarray(ts_np, f32)
    Y = jnp.asarray(Y_np, f32)

    # warm the remote compile service (connection warmup is ~80-140 s on the
    # first compile of a process regardless of program size)
    float(np.asarray(jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64)))))
    print(
        f"N={N:,}  outputs={P}  M={M}  N*={N_star:,}  steps/cond={STEPS}  "
        f"device={jax.devices()[0]}",
        flush=True,
    )

    def pad_w(Xc):
        n_r, w = Xc.shape
        if w == WIDTH:
            return Xc
        return jnp.concatenate([Xc, jnp.zeros((n_r, WIDTH - w), f32)], axis=1)

    # ---------------- output 1: temporal GP ------------------------------
    opt1 = optax.adam(5e-2)

    @jax.jit
    def t_fwd(p, y1):
        l, ps, ns = unpack_gp(p)
        lg = lgssm_of(Matern52(lengthscale=l, variance=ps**2), t, ns**2, f32)
        R = jnp.broadcast_to(lg.R, (N,))
        ll, aux = loglik_fwd_aux(lg.A, lg.Q, R, lg.H, y1)
        return lg.A, lg.Q, R, lg.H, ll, aux

    @jax.jit
    def t_bwd(A, Q, R, H, aux):
        return loglik_bwd(A, Q, R, H, aux)

    @jax.jit
    def t_pull(p, st, dA, dQ, dR):
        def rebuild(pp):
            l, ps, ns = unpack_gp(pp)
            lg = lgssm_of(Matern52(lengthscale=l, variance=ps**2), t, ns**2, f32)
            return lg.A, lg.Q, jnp.broadcast_to(lg.R, (N,))

        _, vjp = jax.vjp(rebuild, p)
        (g,) = vjp((dA, dQ, dR))
        g = -g / N
        up, st = opt1.update(g, st)
        return optax.apply_updates(p, up), st

    def train_first(p0, y1, steps):
        p, st = p0, opt1.init(p0)
        lls = []
        for _ in range(steps):
            A, Q, R, H, ll, aux = t_fwd(p, y1)
            dA, dQ, dR, _ = t_bwd(A, Q, R, H, aux)
            p, st = t_pull(p, st, dA, dQ, dR)
            lls.append(ll)
        float(np.asarray(p[0]))  # barrier
        return p, [float(np.asarray(v)) for v in lls]

    # ---------------- scaled conditionals: shared staged programs ---------
    opt = optax.adam(5e-2)

    def arrays(p, Xc, Zc, y):
        tl, tsig, ol, osig, ns = unpack_gpar(p)
        time_k = Matern52(lengthscale=tl, variance=tsig**2)
        out_k = Matern52(lengthscale=ol, variance=osig**2)
        lg = lgssm_of(time_k, t, ns**2, f32)
        Kfu = out_k(Xc, Zc)
        U = jnp.concatenate([y[:, None], Kfu], axis=1)
        Kuu = out_k(Zc, Zc) + ns**2 * jnp.eye(M, dtype=f32)
        return lg.A, lg.Q, jnp.broadcast_to(lg.R, (N,)), lg.H, U, Kuu

    @jax.jit
    def jfwd(p, Xc, Zc, y):
        A, Q, R, H, U, Kuu = arrays(p, Xc, Zc, y)
        G, logdet, aux = whiten_fwd_aux(A, Q, R, H, U)
        return A, Q, R, H, U, Kuu, G, logdet, aux

    jitter_max = [0.0]  # max relative diagonal jitter accepted this output

    def host_bound(G, logdet, Kuu):
        """P-form bound + closed-form cotangents, on the HOST in f64.

        The M x M algebra is tiny, but at N = 1e6 the Gram's entries are
        O(N) while its floor is the O(noise^2) ridge: cond(Gb + Kuu) ~ 5e9
        for strongly-correlated K_fu columns (measured: the chain's 1-D
        early conditionals), past the f32 Cholesky cliff — the on-chip f32
        factorization NaNs.  f64 on the host costs microseconds and keeps
        every O(N) program f32 on-chip.  The on-chip f32 Gram's OWN error
        (~sqrt(N)*eps_f32 of the O(N) diagonal) can still leave Gb + Kuu
        numerically indefinite in f64 (measured r5 attempt 1 at the 2nd
        conditional), so the factorizations go through ``chol_psd``
        (escalating relative jitter, reported per output).  Cotangents
        (matching jax.grad of the on-chip P-form, entries only where
        consumed):
            beta = P^-1 g,  S = -(P^-1 + beta beta^T)/2
            ct_G[0,0] = -1/2; ct_G[1:,0] = beta; ct_G[1:,1:] = S
            ct_ld = -1/2;  ct_K = S + Kuu^-1/2."""
        import scipy.linalg as sla

        G64 = np.asarray(G, np.float64)
        K64 = np.asarray(Kuu, np.float64)
        aa, g, Gb = G64[0, 0], G64[1:, 0], G64[1:, 1:]
        Pm = Gb + K64
        L_P, jP = chol_psd(Pm)
        L_K, jK = chol_psd(K64)
        cP = (L_P, True)
        cK = (L_K, True)
        jitter_max[0] = max(jitter_max[0], jP, jK)
        ldP = 2.0 * np.sum(np.log(np.diag(L_P)))
        ldK = 2.0 * np.sum(np.log(np.diag(L_K)))
        beta = sla.cho_solve(cP, g)
        val = -0.5 * (
            N * _LOG_2PI + float(np.asarray(logdet)) + ldP - ldK + aa - g @ beta
        )
        Pinv = sla.cho_solve(cP, np.eye(M))
        Kinv = sla.cho_solve(cK, np.eye(M))
        S = -0.5 * (Pinv + np.outer(beta, beta))
        ct_G = np.zeros((M + 1, M + 1))
        ct_G[0, 0] = -0.5
        ct_G[1:, 0] = beta
        ct_G[1:, 1:] = S
        ct_K = S + 0.5 * Kinv
        return (
            np.float32(val),
            jnp.asarray(ct_G, f32),
            jnp.float32(-0.5),
            jnp.asarray(ct_K, f32),
        )

    jelems = jax.jit(whiten_bwd_elements)
    jpad_b = jax.jit(lambda b: jnp.pad(b, ((0, 0), (0, 0), (0, (-b.shape[2]) % BK))))
    jslice_b = jax.jit(lambda b, j: jax.lax.dynamic_slice_in_dim(b, j, BK, 2))
    jsuffix = jax.jit(lambda C, bc, W: blocked_suffix_scan(C, bc, W))
    jcat_r = jax.jit(
        lambda rs, ncols: jnp.concatenate(rs, axis=2)[:, :, :ncols], static_argnums=1
    )
    jscores = jax.jit(whiten_bwd_scores)

    @jax.jit
    def jpull(p, Xc, Zc, y, st, ct_A, ct_Q, ct_R, ct_U, ct_K):
        def rebuild(pp):
            A, Q, R, H, U, Kuu = arrays(pp, Xc, Zc, y)
            return A, Q, R, U, Kuu

        _, vjp = jax.vjp(rebuild, p)
        (g,) = vjp((ct_A, ct_Q, ct_R, ct_U, ct_K))
        g = -g / N
        up, st = opt.update(g, st)
        return optax.apply_updates(p, up), st

    def train_cond(p0, Xc, Zc, y, steps):
        p, st = p0, opt.init(p0)
        vals = []
        for _ in range(steps):
            A, Q, R, H, U, Kuu, G, logdet, aux = jfwd(p, Xc, Zc, y)
            val, ct_G, ct_ld, ct_K = host_bound(G, logdet, Kuu)
            C, b, W = jelems(A, H, aux)
            b = jpad_b(b)
            rs, Nmat = [], None
            for j in range(0, b.shape[2], BK):
                _, r_c, Nm = jsuffix(C, jslice_b(b, j), W)
                rs.append(r_c)
                if Nmat is None:
                    Nmat = Nm
            r = jcat_r(tuple(rs), M + 1)
            ct_A, ct_Q, ct_R, ct_U = jscores(A, Q, R, H, aux, r, Nmat, ct_G, ct_ld)
            p, st = jpull(p, Xc, Zc, y, st, ct_A, ct_Q, ct_R, ct_U, ct_K)
            vals.append(val)
        float(np.asarray(p[0]))  # barrier
        return p, [-float(np.asarray(v)) / N for v in vals]

    @jax.jit
    def jgram(p, Xc, Zc, y):
        A, Q, R, H, U, Kuu = arrays(p, Xc, Zc, y)
        G, logdet, _ = whiten_fwd_aux(A, Q, R, H, U)
        return G, Kuu

    def q_u(p, Xc, Zc, y):
        """q(u) with the M x M factorizations in host f64 (same cliff as
        host_bound: D = I + L_uu^-1 Gb L_uu^-T has cond ~ Gram/ridge)."""
        import scipy.linalg as sla

        G, Kuu = jgram(p, Xc, Zc, y)
        G64 = np.asarray(G, np.float64)
        K64 = np.asarray(Kuu, np.float64)
        g, Gb = G64[1:, 0], G64[1:, 1:]
        L_uu, _ = chol_psd(K64)
        AAt = sla.solve_triangular(
            L_uu, sla.solve_triangular(L_uu, Gb, lower=True).T, lower=True
        )
        D = AAt + np.eye(M)
        L_D, _ = chol_psd(D)
        Aalpha = sla.solve_triangular(L_uu, g, lower=True)
        m_eps = sla.solve_triangular(
            L_D.T, sla.solve_triangular(L_D, Aalpha, lower=True), lower=False
        )
        return (
            jnp.asarray(m_eps, f32),
            jnp.asarray(L_D, f32),
            jnp.asarray(L_uu, f32),
        )

    @jax.jit
    def prepare(p, Xc, Zc, y, Xc_star, m_eps, L_D, L_uu):
        """Splice train+test, build the (1 + M)-column smoothing stack."""
        tl, tsig, ol, osig, ns = unpack_gpar(p)
        time_k = Matern52(lengthscale=tl, variance=tsig**2)
        out_k = Matern52(lengthscale=ol, variance=osig**2)
        t_all = jnp.concatenate([t, t_star])
        V_all = jnp.concatenate([Xc, Xc_star], axis=0)
        y_all = jnp.concatenate([y, jnp.zeros((N_star,), f32)])
        noise_all = jnp.concatenate(
            [jnp.full((N,), ns**2, f32), jnp.full((N_star,), 1e10, f32)]
        )
        order = jnp.argsort(t_all)
        t_s, V_s, y_s, noise_s = (
            t_all[order], V_all[order], y_all[order], noise_all[order]
        )
        lg = lgssm_of(time_k, t_s, noise_s, f32)
        with jax.default_matmul_precision("highest"):
            K_su = out_k(V_s, Zc)
            Phi = jax.scipy.linalg.solve_triangular(L_uu, K_su.T, lower=True).T
            fx_bar = Phi @ m_eps
            Gm = jax.scipy.linalg.solve_triangular(L_D, Phi.T, lower=True).T
            cols = jnp.concatenate([(y_s - fx_bar)[:, None], Gm], axis=1)
        return lg, cols, fx_bar, Gm, order

    @jax.jit
    def finish(sm_mean, sm_var, fx_bar, Gm, order):
        with jax.default_matmul_precision("highest"):
            mean_all = fx_bar + sm_mean[:, 0]
            Hm = Gm - sm_mean[:, 1:]
            var_all = jnp.sum(Hm * Hm, axis=1) + sm_var
        inv = jnp.argsort(order)
        return mean_all[inv][N:], jnp.maximum(var_all, 0.0)[inv][N:]

    jfilter = jax.jit(blocked_filter)
    jsmooth = jax.jit(lambda lg, cols, fr: blocked_smooth(lg, cols, filter_result=fr))
    jslice_c = jax.jit(lambda c, j: jax.lax.dynamic_slice_in_dim(c, j, CHUNK, 1))
    jpad_c = jax.jit(lambda c: jnp.pad(c, ((0, 0), (0, (-c.shape[1]) % CHUNK))))
    jcat_c = jax.jit(
        lambda ms, ncols: jnp.concatenate(ms, axis=1)[:, :ncols], static_argnums=1
    )

    def smooth_cols(lg, cols):
        """Chunked filter + smoother over the column stack (the narrow-
        program dispatch pattern; chunked == fused exactly)."""
        ncols = cols.shape[1]
        if ncols % CHUNK:
            cols = jpad_c(cols)
        means, sm_var = [], None
        for j in range(0, cols.shape[1], CHUNK):
            cj = jslice_c(cols, j)
            fr = jfilter(lg, cj)
            sm = jsmooth(lg, cj, fr)
            means.append(sm.mean)
            sm_var = sm.var
        return jcat_c(tuple(means), ncols), sm_var

    def predict_cond(p, Xc, Zc, y, Xc_star):
        m_eps, L_D, L_uu = q_u(p, Xc, Zc, y)
        lg, cols, fx_bar, Gm, order = prepare(p, Xc, Zc, y, Xc_star, m_eps, L_D, L_uu)
        sm_mean, sm_var = smooth_cols(lg, cols)
        mu, var = finish(sm_mean, sm_var, fx_bar, Gm, order)
        float(np.asarray(mu[0]))  # barrier
        return mu, var

    @jax.jit
    def prepare_first(p, y1):
        l, ps, ns = unpack_gp(p)
        time_k = Matern52(lengthscale=l, variance=ps**2)
        t_all = jnp.concatenate([t, t_star])
        y_all = jnp.concatenate([y1, jnp.zeros((N_star,), f32)])
        noise_all = jnp.concatenate(
            [jnp.full((N,), ns**2, f32), jnp.full((N_star,), 1e10, f32)]
        )
        order = jnp.argsort(t_all)
        lg = lgssm_of(time_k, t_all[order], noise_all[order], f32)
        return lg, y_all[order][:, None], order

    def predict_first(p, y1):
        lg, col, order = prepare_first(p, y1)
        sm_mean, sm_var = smooth_cols(lg, col)
        inv = jnp.argsort(order)
        mu = sm_mean[:, 0][inv][N:]
        var = sm_var[inv][N:]
        float(np.asarray(mu[0]))
        return mu, var

    # ======================= run the chain ================================
    total0 = time.time()
    p0_gp = jnp.asarray(pack_gp(0.5, 1.0, 0.2), f32)
    p0 = jnp.asarray(pack_gpar(0.5, 1.0, 1.0, 0.7, 0.2), f32)

    # --- train + predict output 1 ---
    t0 = time.time()
    p1, lls = train_first(p0_gp, Y[:, 0], STEPS)
    tr1 = time.time() - t0
    t0 = time.time()
    mu1, var1 = predict_first(p1, Y[:, 0])
    pr1 = time.time() - t0
    rmse1 = float(np.sqrt(np.mean((np.asarray(mu1) - lat_star[:, 0]) ** 2)))
    print(
        f"[y01 temporal ] train {tr1:7.1f}s ({tr1/STEPS*1e3:7.1f} ms/step)  "
        f"predict {pr1:6.1f}s  rmse {rmse1:.4f}",
        flush=True,
    )

    pred_means = [mu1]
    pred_vars = [var1]
    rmses, covs, train_s, pred_s = [rmse1], [], [tr1], [pr1]

    for i in range(1, P):
        Xc = pad_w(Y[:, :i])
        # farthest-point (k-center) inducing selection: strided subsampling
        # of a bounded signal picks near-duplicate rows -> K_uu nearly
        # singular, whitened-Gram columns collinear (the r5 f64 cliff).
        Zc = pad_w(jnp.asarray(farthest_points(Y_np[:, :i], M, seed=i), f32))
        y_i = Y[:, i]
        jitter_max[0] = 0.0
        t0 = time.time()
        p_i, nlls = train_cond(p0, Xc, Zc, y_i, STEPS)
        tr = time.time() - t0
        Xc_star = pad_w(jnp.stack(pred_means, axis=1))
        t0 = time.time()
        mu_i, var_i = predict_cond(p_i, Xc, Zc, y_i, Xc_star)
        pr = time.time() - t0
        mu_np = np.asarray(mu_i)
        rmse = float(np.sqrt(np.mean((mu_np - lat_star[:, i]) ** 2)))
        cov = float(
            np.mean(
                np.abs(mu_np - lat_star[:, i])
                < 2 * np.sqrt(np.asarray(var_i) + true_sn**2)
            )
        )
        pred_means.append(mu_i)
        pred_vars.append(var_i)
        rmses.append(rmse)
        covs.append(cov)
        train_s.append(tr)
        pred_s.append(pr)
        print(
            f"[y{i+1:02d} scaled   ] train {tr:7.1f}s ({tr/STEPS*1e3:7.1f} ms/step)  "
            f"predict {pr:6.1f}s  nll/N {nlls[0]:.4f}->{nlls[-1]:.4f}  "
            f"rmse {rmse:.4f}  cov2s {cov:.3f}  jit {jitter_max[0]:.0e}",
            flush=True,
        )

    total = time.time() - total0
    steady_train = float(np.median(train_s[1:])) if P > 2 else train_s[-1]
    steady_pred = float(np.median(pred_s[1:])) if P > 2 else pred_s[-1]
    print(
        f"\nchain[{P} outputs x {N:,} steps]: total {total:8.1f}s  "
        f"(steady-state per conditional: train {steady_train:6.1f}s /"
        f"{STEPS} steps = {steady_train/STEPS*1e3:7.1f} ms/step, "
        f"predict {steady_pred:6.1f}s)",
        flush=True,
    )
    print(
        f"rmse per output: {['%.4f' % r for r in rmses]}\n"
        f"2-sigma coverage (scaled outputs): {['%.3f' % c for c in covs]}\n"
        f"mean rmse {np.mean(rmses):.4f} (obs noise {true_sn}); "
        f"filter work: {(P-1)*STEPS*(M+1)*N/np.sum(train_s[1:]):.2e} "
        f"col-steps/s sustained across conditional training",
        flush=True,
    )


if __name__ == "__main__":
    main()
