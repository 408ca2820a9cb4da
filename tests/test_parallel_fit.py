"""Concurrent fitting of the chain's conditionals (VERDICT r1 item 5).

Training of conditional i depends only on observed data — only prediction is
sequential (``GPAR_examples/toy_example.jl:118-135``) — so all P-1
conditionals fit concurrently via vmap over a zero-padded feature stack.
These tests assert the parallel path reproduces the sequential loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.models.gpar import GPARConfig, fit_gpar


def _data(rng, n=40, p=4):
    t = np.sort(rng.uniform(0, 5, size=n))
    Y = np.zeros((n, p))
    Y[:, 0] = np.sin(t)
    for i in range(1, p):
        Y[:, i] = np.cos(t + i) + 0.4 * Y[:, i - 1] + 0.05 * rng.normal(size=n)
    return jnp.asarray(t), jnp.asarray(Y)


_INITS = [
    np.array([0.1, -0.1, 0.2, 0.0, -1.0]),
    np.array([0.0, 0.1, -0.2, 0.1, -1.2]),
    np.array([-0.1, 0.0, 0.1, -0.1, -0.9]),
    np.array([0.2, -0.2, 0.0, 0.2, -1.1]),
]


@pytest.mark.parametrize("backend", ["scaled", "exact"])
def test_parallel_fit_matches_sequential(rng, key, backend):
    t, Y = _data(rng)
    cfg = GPARConfig(
        backend=backend,
        num_pseudo_points=12,
        optimizer="adam",  # fixed-trajectory: comparable across paddings
        max_opt_steps=40,
    )
    inits = [np.array([0.0, 0.0, -1.0])] + _INITS[: Y.shape[1] - 1]

    seq = fit_gpar(key, t, Y, cfg, init_params=inits)
    par = fit_gpar(key, t, Y, cfg, init_params=inits, parallel=True)

    for c_s, c_p in zip(seq.conditionals, par.conditionals):
        np.testing.assert_allclose(
            np.asarray(c_p.params), np.asarray(c_s.params), rtol=1e-8, atol=1e-8
        )
        if backend == "scaled":
            np.testing.assert_allclose(
                np.asarray(c_p.qu.m_eps), np.asarray(c_s.qu.m_eps),
                rtol=1e-6, atol=1e-9,
            )

    # End-to-end: identical chained predictions.
    t_star = jnp.asarray(np.sort(rng.uniform(0, 5, size=15)))
    mu_s, var_s = seq.predict(t_star)
    mu_p, var_p = par.predict(t_star)
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_s), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_p), np.asarray(var_s), rtol=1e-5, atol=1e-8)


def test_parallel_fit_mesh_sharded(rng, key):
    """Conditional axis sharded over a device mesh: same fits."""
    from jax.sharding import Mesh

    t, Y = _data(rng, n=30, p=5)  # P-1 = 4 conditionals over 4 devices
    cfg = GPARConfig(
        backend="scaled", num_pseudo_points=10, optimizer="adam", max_opt_steps=25
    )
    inits = [np.array([0.0, 0.0, -1.0])] + _INITS

    mesh = Mesh(np.array(jax.devices()[:4]), ("chain",))
    par = fit_gpar(key, t, Y, cfg, init_params=inits, parallel=True, mesh=mesh)
    seq = fit_gpar(key, t, Y, cfg, init_params=inits)
    for c_s, c_p in zip(seq.conditionals, par.conditionals):
        np.testing.assert_allclose(
            np.asarray(c_p.params), np.asarray(c_s.params), rtol=1e-8, atol=1e-8
        )
