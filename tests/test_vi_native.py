"""Sparse VI fitting + native CSV loader."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.data.native_io import _read_csv_python, native_available, read_csv
from gpar_at_scale_tpu.inference.vi import fit_sparse_vi, predict_sparse_vi
from gpar_at_scale_tpu.kernels import EQ, Matern52


def test_sparse_vi_recovers_function(key, rng):
    x = np.sort(rng.uniform(0, 6, 120))[:, None]
    y = np.sin(2 * x[:, 0]) + 0.1 * rng.normal(size=120)
    res = fit_sparse_vi(
        key,
        Matern52,
        jnp.array(x),
        jnp.array(y),
        num_inducing=15,
        init_log_params=jnp.zeros(3),
        max_steps=200,
    )
    assert float(res.elbo) > -1e6
    _, _, sn = np.exp(np.asarray(res.log_params)) + 1e-3
    assert 0.05 < sn < 0.2, sn
    xs = np.linspace(0.2, 5.8, 40)[:, None]
    mu, var = predict_sparse_vi(res, Matern52, jnp.array(x), jnp.array(y), jnp.array(xs))
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - np.sin(2 * xs[:, 0])) ** 2)))
    assert rmse < 0.12, rmse
    assert np.all(np.asarray(var) >= 0)


def test_vi_elbo_improves_with_learned_inducing(key, rng):
    """Learning Z should not do worse than frozen strided Z."""
    x = np.sort(rng.uniform(0, 6, 100))[:, None]
    y = np.sin(3 * x[:, 0]) + 0.1 * rng.normal(size=100)
    frozen = fit_sparse_vi(
        key, EQ, jnp.array(x), jnp.array(y), 8, learn_inducing=False,
        init_log_params=jnp.zeros(3), max_steps=200,
    )
    learned = fit_sparse_vi(
        key, EQ, jnp.array(x), jnp.array(y), 8, learn_inducing=True,
        init_log_params=jnp.zeros(3), max_steps=200,
    )
    assert float(learned.elbo) >= float(frozen.elbo) - 1.0


def test_csv_loader_roundtrip(tmp_path, rng):
    data = rng.normal(size=(500, 4))
    path = str(tmp_path / "t.csv")
    with open(path, "w") as f:
        f.write("a,b,c,d\n")
        np.savetxt(f, data, delimiter=",", fmt="%.12g")
    d, names = read_csv(path)
    assert names == ["a", "b", "c", "d"]
    np.testing.assert_allclose(d, data, rtol=1e-10)
    d2, names2 = _read_csv_python(path)
    np.testing.assert_allclose(d2, data, rtol=1e-10)


def test_csv_loader_handles_bad_cells(tmp_path):
    path = str(tmp_path / "bad.csv")
    with open(path, "w") as f:
        f.write("x,y\n1.5,2.5\n,3.5\nfoo,4.5\n")
    d, names = read_csv(path)
    assert d.shape == (3, 2)
    assert np.isnan(d[1, 0]) and np.isnan(d[2, 0])
    np.testing.assert_allclose(d[:, 1], [2.5, 3.5, 4.5])
