"""Mixed-column (factored-cotangent) backward == the direct batched backward.

``ssm/blocked_grad.py`` mixed-chunk section: ctsym = -F F^T (host f64) and
linearity of the filter/suffix-scan in observation columns let the whitened-
Gram backward run over K-column chunks of U @ F with nothing full-width
resident — the memory fix for DTC training at M >= 128 on one chip
(measured OOM at M=128 without it).  Exactness asserted here against
``whiten_bwd`` on a genuine bound-derived cotangent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.kernels import Matern52
from gpar_at_scale_tpu.ssm.blocked_grad import (
    cotangent_factor,
    whiten_bwd,
    whiten_bwd_ld_part,
    whiten_bwd_mixed_chunk,
    whiten_fwd_aux,
)
from gpar_at_scale_tpu.ssm.markov import lgssm_of

_LOG_2PI = 1.8378770664093453


def _case(rng, n=60, m=12):
    t = jnp.asarray(np.sort(rng.uniform(0, 6, size=n)))
    X = jnp.asarray(rng.normal(size=(n, 2)))
    y = jnp.asarray(np.sin(np.asarray(t)) + 0.3 * rng.normal(size=n))
    Z = X[np.linspace(0, n - 1, m).astype(int)]
    out_k = Matern52(lengthscale=0.9, variance=1.2)
    time_k = Matern52(lengthscale=0.7, variance=1.0)
    lgssm = lgssm_of(time_k, t, 0.09, jnp.float64)
    Kfu = out_k(X, Z)
    U = jnp.concatenate([y[:, None], Kfu], axis=1)
    Kuu = out_k(Z, Z) + 0.09 * jnp.eye(m, dtype=jnp.float64)
    return lgssm, U, Kuu, n


def _bound_cotangents(G, logdet, Kuu, n):
    """ct_G/ct_ld from jax.grad of the P-form bound (the exact cotangent
    shape the DTC training path produces)."""

    def bound(G, logdet, Kuu):
        aa, g, Gb = G[0, 0], G[1:, 0], G[1:, 1:]
        L_uu = jnp.linalg.cholesky(Kuu)
        L_P = jnp.linalg.cholesky(Gb + Kuu)
        wp = jax.scipy.linalg.solve_triangular(L_P, g, lower=True)
        ld = lambda L: 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        return -0.5 * (
            n * _LOG_2PI + logdet + ld(L_P) - ld(L_uu) + aa - jnp.sum(wp**2)
        )

    _, (ct_G, ct_ld, _) = jax.value_and_grad(bound, argnums=(0, 1, 2))(
        G, logdet, Kuu
    )
    return ct_G, ct_ld


@pytest.mark.parametrize("chunk", [4, 5, 13])
def test_mixed_chunks_match_direct_backward(rng, chunk):
    lgssm, U, Kuu, n = _case(rng)
    A = lgssm.A
    R = jnp.broadcast_to(lgssm.R, (n,)).astype(A.dtype)
    H = lgssm.H.astype(A.dtype)
    G, logdet, aux = whiten_fwd_aux(A, lgssm.Q, R, H, U, num_blocks=8)
    ct_G, ct_ld = _bound_cotangents(G, logdet, Kuu, n)

    ref_A, ref_Q, ref_R, ref_U = whiten_bwd(
        A, lgssm.Q, R, H, aux, ct_G, ct_ld, num_blocks=8
    )

    F = jnp.asarray(cotangent_factor(ct_G), A.dtype)
    B = F.shape[0]
    ct_A = ct_Q = ct_U = ct_R = None
    for j in range(0, B, chunk):
        Fk = F[:, j : j + chunk]
        a_p, q_p, r_p, u_p = whiten_bwd_mixed_chunk(
            A, lgssm.Q, R, H, U, Fk, num_blocks=8
        )
        ct_A = a_p if ct_A is None else ct_A + a_p
        ct_Q = q_p if ct_Q is None else ct_Q + q_p
        ct_R = r_p if ct_R is None else ct_R + r_p
        ct_U = u_p if ct_U is None else ct_U + u_p
    a_ld, q_ld, r_ld = whiten_bwd_ld_part(A, lgssm.Q, R, H, ct_ld, num_blocks=8)
    ct_A = ct_A + a_ld
    ct_Q = ct_Q + q_ld
    ct_R = ct_R + r_ld

    np.testing.assert_allclose(np.asarray(ct_A), np.asarray(ref_A), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ct_Q), np.asarray(ref_Q), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ct_R), np.asarray(ref_R), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ct_U), np.asarray(ref_U), rtol=1e-7, atol=1e-9)


def test_cotangent_factor_reconstructs_symmetrized_ct(rng):
    lgssm, U, Kuu, n = _case(rng, n=40, m=8)
    A = lgssm.A
    R = jnp.broadcast_to(lgssm.R, (n,)).astype(A.dtype)
    H = lgssm.H.astype(A.dtype)
    G, logdet, _ = whiten_fwd_aux(A, lgssm.Q, R, H, U, num_blocks=8)
    ct_G, _ = _bound_cotangents(G, logdet, Kuu, n)
    F = cotangent_factor(ct_G)
    ctsym = 0.5 * (np.asarray(ct_G) + np.asarray(ct_G).T)
    np.testing.assert_allclose(-(F @ F.T), ctsym, rtol=1e-9, atol=1e-11)
