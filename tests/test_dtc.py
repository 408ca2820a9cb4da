"""DTC engine vs. dense oracles.

The reference's de-facto test (``examples/dtc_example.jl:8-64``) compares the
Kalman-whitened DTC against a dense-Cholesky implementation by printing the
difference; here it is an assertion (SURVEY.md §4 implication (d)).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gpar_at_scale_tpu.gp.dtc import (
    compute_q_u,
    dtc_objective,
    dtc_objective_iid,
    predict_scaled,
    predict_sparse_iid,
    titsias_elbo,
)
from gpar_at_scale_tpu.gp.exact import condition, log_marginal_likelihood
from gpar_at_scale_tpu.kernels import EQ, Matern52
from gpar_at_scale_tpu.ssm.markov import lgssm_of


def _setup(rng, n=40, m=8, d=2):
    t = np.sort(rng.uniform(0, 5, size=n))
    V = rng.normal(size=(n, d))
    Z = rng.normal(size=(m, d))
    y = rng.normal(size=n)
    return jnp.array(t), jnp.array(V), jnp.array(Z), jnp.array(y)


def dense_dtc_oracle(Kfu, Kuu, Sigma_y, y):
    """Dense reference DTC (the ``_compute_intermediates`` pattern,
    ``examples/dtc_example.jl:10-23``): whiten with chol(Sigma_y)."""
    n = len(y)
    Ly = np.linalg.cholesky(Sigma_y)
    alpha = np.linalg.solve(Ly, y)
    beta = np.linalg.solve(Ly, Kfu)
    Lu = np.linalg.cholesky(Kuu + 1e-10 * np.mean(np.diag(Kuu)) * np.eye(Kuu.shape[0]))
    A = np.linalg.solve(Lu, beta.T)
    Lam = A @ A.T + np.eye(A.shape[0])
    Llam = np.linalg.cholesky(Lam)
    w = np.linalg.solve(Llam, A @ alpha)
    logdet = np.linalg.slogdet(Sigma_y)[1] + np.linalg.slogdet(Lam)[1]
    quad = alpha @ alpha - w @ w
    return -0.5 * (n * np.log(2 * np.pi) + logdet + quad)


def test_dtc_matches_dense_oracle(rng):
    t, V, Z, y = _setup(rng)
    out_k = Matern52(lengthscale=1.1, variance=0.9)
    time_k = Matern52(lengthscale=0.8, variance=1.3)
    nv = 0.2**2
    lgssm = lgssm_of(time_k, t, nv)
    # uu_ridge=None isolates the pure bound; the default 'auto' adds the
    # reference-parity noise ridge to K_uu (checked separately below).
    got = dtc_objective(out_k, lgssm, V, Z, y, uu_ridge=None)

    Sigma_y = np.asarray(time_k(t[:, None])) + nv * np.eye(len(t))
    want = dense_dtc_oracle(
        np.asarray(out_k(V, Z)), np.asarray(out_k(Z, Z)), Sigma_y, np.asarray(y)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # Default uu_ridge='auto' == mean(lgssm.R): oracle with K_uu + nv I.
    got_auto = dtc_objective(out_k, lgssm, V, Z, y)
    want_auto = dense_dtc_oracle(
        np.asarray(out_k(V, Z)),
        np.asarray(out_k(Z, Z)) + nv * np.eye(Z.shape[0]),
        Sigma_y,
        np.asarray(y),
    )
    np.testing.assert_allclose(got_auto, want_auto, rtol=1e-6)


def test_dtc_equals_exact_when_inducing_are_inputs(rng):
    """As Z -> V the DTC bound recovers the exact NLML of the full additive
    model f ~ GP(k_out + k_time) + noise (``compare_optimum_params`` check,
    ``examples/dtc_example.jl:67-163``, made exact)."""
    t, V, _, y = _setup(rng, n=30)
    out_k = Matern52(lengthscale=1.0, variance=0.7)
    time_k = Matern52(lengthscale=0.6, variance=1.1)
    nv = 0.15
    lgssm = lgssm_of(time_k, t, nv)
    got = dtc_objective(out_k, lgssm, V, V, y, uu_ridge=None)

    # exact: y ~ N(0, K_out(V) + K_time(t) + nv I)
    K = np.asarray(out_k(V, V)) + np.asarray(time_k(t[:, None])) + nv * np.eye(30)
    L = np.linalg.cholesky(K)
    a = np.linalg.solve(L, np.asarray(y))
    want = -0.5 * (30 * np.log(2 * np.pi) + 2 * np.sum(np.log(np.diag(L))) + a @ a)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dtc_is_lower_bound_and_increases_with_m(rng):
    t, V, _, y = _setup(rng, n=35)
    out_k = Matern52(lengthscale=1.0, variance=0.7)
    time_k = Matern52(lengthscale=0.6, variance=1.1)
    nv = 0.15
    lgssm = lgssm_of(time_k, t, nv)
    vals = [
        float(dtc_objective(out_k, lgssm, V, V[:m], y, uu_ridge=None))
        for m in (3, 10, 35)
    ]
    K = np.asarray(out_k(V, V)) + np.asarray(time_k(t[:, None])) + nv * np.eye(35)
    L = np.linalg.cholesky(K)
    a = np.linalg.solve(L, np.asarray(y))
    exact = -0.5 * (35 * np.log(2 * np.pi) + 2 * np.sum(np.log(np.diag(L))) + a @ a)
    assert vals[0] <= vals[2] + 1e-6
    np.testing.assert_allclose(vals[2], exact, rtol=1e-5)


def test_qu_posterior_matches_dense(rng):
    """q(u) mean/cov against the dense whitened-DTC posterior formula."""
    t, V, Z, y = _setup(rng, n=30, m=6)
    out_k = Matern52(lengthscale=1.2, variance=1.0)
    time_k = Matern52(lengthscale=0.7, variance=0.9)
    nv = 0.1
    lgssm = lgssm_of(time_k, t, nv)
    qu = compute_q_u(out_k, lgssm, V, Z, y, uu_ridge=None)

    Sigma_y = np.asarray(time_k(t[:, None])) + nv * np.eye(30)
    Kfu = np.asarray(out_k(V, Z))
    Kuu = np.asarray(out_k(Z, Z)) + 1e-10 * np.eye(6)
    Lu = np.linalg.cholesky(Kuu)
    Ly = np.linalg.cholesky(Sigma_y)
    B = np.linalg.solve(Lu, np.linalg.solve(Ly, Kfu).T)  # (M,N)
    D = B @ B.T + np.eye(6)
    m_eps = np.linalg.solve(D, B @ np.linalg.solve(Ly, np.asarray(y)))
    np.testing.assert_allclose(qu.m_eps, m_eps, rtol=1e-5, atol=1e-8)
    LD = np.asarray(qu.L_D)
    np.testing.assert_allclose(LD @ LD.T, D, rtol=1e-5, atol=1e-8)


def test_scaled_prediction_analytic_vs_mc(rng, key):
    t, V, Z, y = _setup(rng, n=40, m=8)
    t_star = jnp.array(np.sort(rng.uniform(0, 5, size=12)))
    V_star = jnp.array(rng.normal(size=(12, 2)))
    out_k = Matern52(lengthscale=1.0, variance=0.8)
    time_k = Matern52(lengthscale=0.9, variance=1.0)
    nv = 0.1
    lgssm = lgssm_of(time_k, t, nv)
    qu = compute_q_u(out_k, lgssm, V, Z, y)

    pa = predict_scaled(out_k, time_k, qu, V, t, y, t_star, V_star, nv)
    pm = predict_scaled(
        out_k, time_k, qu, V, t, y, t_star, V_star, nv, key=key, num_samples=4000
    )
    np.testing.assert_allclose(pa.mean, pm.mean, atol=0.05)
    np.testing.assert_allclose(pa.var, pm.var, rtol=0.2, atol=0.02)


def test_scaled_prediction_exact_limit(rng):
    """With Z = V (no sparsity) the scaled predictive mean should match the
    exact additive-GP posterior mean at the test points."""
    n, ns = 30, 10
    t = np.sort(rng.uniform(0, 5, size=n))
    ts = np.sort(rng.uniform(0, 5, size=ns))
    V = rng.normal(size=(n, 1))
    Vs = rng.normal(size=(ns, 1))
    y = np.asarray(
        np.sin(t) + 0.3 * V[:, 0] + 0.05 * rng.normal(size=n)
    )
    out_k = Matern52(lengthscale=1.5, variance=0.6)
    time_k = Matern52(lengthscale=1.0, variance=1.0)
    nv = 0.05
    lgssm = lgssm_of(time_k, jnp.array(t), nv)
    qu = compute_q_u(
        out_k, lgssm, jnp.array(V), jnp.array(V), jnp.array(y), uu_ridge=None
    )
    pred = predict_scaled(
        out_k, time_k, qu, jnp.array(V), jnp.array(t), jnp.array(y), jnp.array(ts), jnp.array(Vs), nv
    )

    # Exact additive model: K = K_out(V) + K_time(t); cross needs both parts.
    Ktr = np.asarray(out_k(jnp.array(V))) + np.asarray(time_k(jnp.array(t)[:, None])) + nv * np.eye(n)
    Kcross = np.asarray(out_k(jnp.array(Vs), jnp.array(V))) + np.asarray(
        time_k(jnp.array(ts)[:, None], jnp.array(t)[:, None])
    )
    mu_exact = Kcross @ np.linalg.solve(Ktr, y)
    np.testing.assert_allclose(pred.mean, mu_exact, atol=5e-3)


def test_iid_dtc_matches_dense(rng):
    t, V, Z, y = _setup(rng, n=30, m=7)
    k = EQ(lengthscale=1.0, variance=1.0)
    nv = 0.2
    got = dtc_objective_iid(k, V, Z, y, nv)
    Kfu = np.asarray(k(V, Z))
    Kuu = np.asarray(k(Z, Z)) + 1e-10 * np.eye(7)
    Qff = Kfu @ np.linalg.solve(Kuu, Kfu.T)
    C = Qff + nv * np.eye(30)
    L = np.linalg.cholesky(C)
    a = np.linalg.solve(L, np.asarray(y))
    want = -0.5 * (30 * np.log(2 * np.pi) + 2 * np.sum(np.log(np.diag(L))) + a @ a)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_titsias_elbo_below_exact_lml(rng):
    t, V, Z, y = _setup(rng, n=30, m=7)
    k = EQ(lengthscale=1.0, variance=1.0)
    nv = 0.2
    elbo = titsias_elbo(k, V, Z, y, nv)
    exact = log_marginal_likelihood(k, V, y, nv)
    assert float(elbo) <= float(exact) + 1e-8
    # with Z = V the bound is tight
    elbo_full = titsias_elbo(k, V, V, y, nv)
    np.testing.assert_allclose(elbo_full, exact, rtol=1e-6)


def test_sparse_iid_prediction_full_limit(rng):
    t, V, _, y = _setup(rng, n=25)
    Vs = jnp.array(rng.normal(size=(8, 2)))
    k = EQ(lengthscale=1.2, variance=0.9)
    nv = 0.1
    mu, var = predict_sparse_iid(k, V, V, y, nv, Vs)
    post = condition(k, V, y, nv)
    mu_e, var_e = post.predict_f(Vs)
    np.testing.assert_allclose(mu, mu_e, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(var, var_e, rtol=1e-3, atol=1e-6)


# ---------------------------------------------------------------------------
# Size-dispatched dense whitening / dense smoothing backends
# ---------------------------------------------------------------------------


def test_dense_whitening_matches_filter(rng):
    """The dense chol(Sigma_y) backend and the Kalman whitening agree on the
    bound and on q(u) (VERDICT r2 item 1 done-criterion, 1e-5)."""
    t, V, Z, y = _setup(rng, n=60, m=9)
    out_k = Matern52(lengthscale=1.1, variance=0.9)
    time_k = Matern52(lengthscale=0.8, variance=1.3)
    nv = 0.2**2
    lgssm = lgssm_of(time_k, t, nv)

    f_filter = dtc_objective(out_k, lgssm, V, Z, y)
    f_dense = dtc_objective(
        out_k, lgssm, V, Z, y, filter_fn="dense", time_kernel=time_k, t=t
    )
    f_auto = dtc_objective(
        out_k, lgssm, V, Z, y, time_kernel=time_k, t=t
    )  # auto: N=60 <= DENSE_N_MAX -> dense
    np.testing.assert_allclose(float(f_dense), float(f_filter), rtol=1e-9)
    np.testing.assert_allclose(float(f_auto), float(f_dense), rtol=1e-12)

    qu_f = compute_q_u(out_k, lgssm, V, Z, y)
    qu_d = compute_q_u(
        out_k, lgssm, V, Z, y, filter_fn="dense", time_kernel=time_k, t=t
    )
    np.testing.assert_allclose(
        np.asarray(qu_d.m_eps), np.asarray(qu_f.m_eps), rtol=1e-6, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(qu_d.L_D), np.asarray(qu_f.L_D), rtol=1e-6, atol=1e-10
    )


def test_dense_whitening_gradients_match_filter(rng):
    t, V, Z, y = _setup(rng, n=50, m=7)
    nv_time = 0.15

    def nlml(v, impl):
        time_k = Matern52(lengthscale=0.8, variance=v)
        out_k = Matern52(lengthscale=1.1, variance=0.9)
        lgssm = lgssm_of(time_k, t, nv_time)
        kw = dict(time_kernel=time_k, t=t) if impl == "dense" else {}
        return -dtc_objective(
            out_k, lgssm, V, Z, y, filter_fn=None if impl != "dense" else "dense", **kw
        )

    v0 = jnp.float64(1.3)
    vd, gd = jax.value_and_grad(lambda v: nlml(v, "dense"))(v0)
    vf, gf = jax.value_and_grad(lambda v: nlml(v, "filter"))(v0)
    np.testing.assert_allclose(float(vd), float(vf), rtol=1e-9)
    np.testing.assert_allclose(float(gd), float(gf), rtol=1e-7)


def test_blocked_whitening_matches_filter(rng):
    """filter_fn="blocked" (batched closed-form disturbance-smoother VJP on
    the blocked two-pass engine — the million-step DTC production path,
    VERDICT r3 item 1) == the sequential Kalman whitening: bound, q(u), and
    the FULL 5-hyperparameter gradient of the bound."""
    from gpar_at_scale_tpu.utils.params import unpack_gpar

    t, V, Z, y = _setup(rng, n=70, m=9)

    def build(params):
        tl, ts, ol, osig, ns = unpack_gpar(params)
        time_k = Matern52(lengthscale=tl, variance=ts**2)
        out_k = Matern52(lengthscale=ol, variance=osig**2)
        return time_k, out_k, ns**2

    p0 = jnp.asarray([0.1, -0.2, 0.3, 0.05, -1.4], jnp.float64)

    def nlml(params, engine):
        time_k, out_k, nv = build(params)
        lgssm = lgssm_of(time_k, t, nv)
        return -dtc_objective(out_k, lgssm, V, Z, y, filter_fn=engine)

    v_b, g_b = jax.value_and_grad(lambda p: nlml(p, "blocked"))(p0)
    v_f, g_f = jax.value_and_grad(lambda p: nlml(p, None))(p0)
    np.testing.assert_allclose(float(v_b), float(v_f), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_f), rtol=1e-6, atol=1e-9)

    time_k, out_k, nv = build(p0)
    lgssm = lgssm_of(time_k, t, nv)
    qu_b = compute_q_u(out_k, lgssm, V, Z, y, filter_fn="blocked")
    qu_f = compute_q_u(out_k, lgssm, V, Z, y)
    np.testing.assert_allclose(
        np.asarray(qu_b.m_eps), np.asarray(qu_f.m_eps), rtol=1e-6, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(qu_b.L_D), np.asarray(qu_f.L_D), rtol=1e-6, atol=1e-10
    )


def test_predict_scaled_dense_smoother_matches_sequential(rng):
    from gpar_at_scale_tpu.ssm.kalman import rts_smooth

    t, V, Z, y = _setup(rng, n=40, m=8)
    t_star = jnp.array(np.sort(rng.uniform(0, 5, size=12)))
    V_star = jnp.array(rng.normal(size=(12, 2)))
    out_k = Matern52(lengthscale=1.0, variance=0.8)
    time_k = Matern52(lengthscale=0.9, variance=1.0)
    nv = 0.1
    lgssm = lgssm_of(time_k, t, nv)
    qu = compute_q_u(out_k, lgssm, V, Z, y)

    p_seq = predict_scaled(
        out_k, time_k, qu, V, t, y, t_star, V_star, nv, smooth_fn=rts_smooth
    )
    p_dense = predict_scaled(
        out_k, time_k, qu, V, t, y, t_star, V_star, nv, smooth_fn="dense"
    )
    p_auto = predict_scaled(out_k, time_k, qu, V, t, y, t_star, V_star, nv)
    np.testing.assert_allclose(
        np.asarray(p_dense.mean), np.asarray(p_seq.mean), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(p_dense.var), np.asarray(p_seq.var), rtol=1e-5, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(p_auto.mean), np.asarray(p_dense.mean))
