"""DTC validation: Kalman-whitened DTC vs. dense-Cholesky reference, and
exact-vs-scaled optimum comparison.

Mirrors ``examples/dtc_example.jl`` (reference C12), but the printed
differences are also asserted (the reference relied on eyeballing).
"""

import sys

sys.path.insert(0, ".")
from examples._common import setup_jax

jax = setup_jax(cpu="--cpu" in sys.argv)

import jax.numpy as jnp
import numpy as np

from gpar_at_scale_tpu.data.toy import generate_small_dataset
from gpar_at_scale_tpu.gp.dtc import dtc_objective
from gpar_at_scale_tpu.kernels import Matern52
from gpar_at_scale_tpu.models.gpar import GPARConfig, fit_conditional
from gpar_at_scale_tpu.ssm.markov import lgssm_of
from gpar_at_scale_tpu.utils.params import pack_gpar


def compare_dtc_with_dense(num_pseudo=10):
    """(a) of the reference example: numerical agreement of the two DTC
    computations (``compare_dtc_with_Stheno_dtc``, dtc_example.jl:8-64)."""
    ds = generate_small_dataset(seed=0)
    t = jnp.array(ds.x)
    V = jnp.array(ds.y_obs[:, :1])
    y = jnp.array(ds.y_obs[:, 1])
    Z = V[jnp.linspace(0, len(ds.x) - 1, num_pseudo).astype(int)]

    out_k = Matern52(lengthscale=1.0, variance=0.8)
    time_k = Matern52(lengthscale=0.5, variance=1.2)
    nv = 0.1**2
    lgssm = lgssm_of(time_k, t, nv)
    kalman_dtc = float(dtc_objective(out_k, lgssm, V, Z, y))

    # dense reference (chol of the full temporal covariance)
    n = len(ds.x)
    Sigma = np.asarray(time_k(t[:, None])) + nv * np.eye(n)
    Ly = np.linalg.cholesky(Sigma)
    alpha = np.linalg.solve(Ly, np.asarray(y))
    beta = np.linalg.solve(Ly, np.asarray(out_k(V, Z)))
    Kuu = np.asarray(out_k(Z, Z))
    Lu = np.linalg.cholesky(Kuu + 1e-10 * np.eye(num_pseudo))
    A = np.linalg.solve(Lu, beta.T)
    Lam = A @ A.T + np.eye(num_pseudo)
    w = np.linalg.solve(np.linalg.cholesky(Lam), A @ alpha)
    dense_dtc = -0.5 * (
        n * np.log(2 * np.pi)
        + np.linalg.slogdet(Sigma)[1]
        + np.linalg.slogdet(Lam)[1]
        + alpha @ alpha
        - w @ w
    )
    diff = abs(kalman_dtc - dense_dtc)
    print(f"DTC (Kalman-whitened): {kalman_dtc:.6f}")
    print(f"DTC (dense Cholesky):  {dense_dtc:.6f}")
    print(f"difference:            {diff:.2e}")
    assert diff < 1e-5 * abs(dense_dtc), "DTC implementations disagree"


def compare_optimum_params():
    """(b): exact vs scaled optima from identical inits with pseudo-points ==
    inputs (``compare_optimum_params``, dtc_example.jl:67-163)."""
    ds = generate_small_dataset(seed=0)
    key = jax.random.PRNGKey(0)
    init = pack_gpar(0.5, 1.0, 1.0, 1.0, 0.1)
    cfg_e = GPARConfig(backend="exact", max_opt_steps=200)
    cfg_s = GPARConfig(backend="scaled", num_pseudo_points=len(ds.x), max_opt_steps=200)
    fe = fit_conditional(key, ds.x, ds.y_obs[:, :1], ds.y_obs[:, 1], cfg_e, init_params=init)
    fs = fit_conditional(key, ds.x, ds.y_obs[:, :1], ds.y_obs[:, 1], cfg_s, init_params=init)
    names = ("time_l", "time_sigma", "out_l", "out_sigma", "noise_sigma")
    print(f"{'param':>12} | {'exact':>8} | {'scaled':>8}")
    for n_, e, s in zip(names, fe.hyperparams(), fs.hyperparams()):
        print(f"{n_:>12} | {e:8.3f} | {s:8.3f}")


if __name__ == "__main__":
    compare_dtc_with_dense()
    print()
    compare_optimum_params()
