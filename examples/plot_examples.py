"""Exact-GP and temporal-GP regression demos.

Mirrors ``examples/plot_examples.jl`` (reference C10): the optimized exact
path on the small dataset and the O(N) temporal (LGSSM) path on the big one.
"""

import sys
import time

sys.path.insert(0, ".")
from examples._common import get_plt, out_path, setup_jax, smse

jax = setup_jax(cpu="--cpu" in sys.argv)

import jax.numpy as jnp
import numpy as np

from gpar_at_scale_tpu.data.toy import generate_big_dataset, generate_small_dataset
from gpar_at_scale_tpu.models.gpar import GPARConfig, fit_first_output
from gpar_at_scale_tpu.utils.params import pack_gp


def exact_example():
    ds = generate_small_dataset(seed=0)
    cfg = GPARConfig(first_output_backend="exact", max_opt_steps=150)
    fit = fit_first_output(
        jax.random.PRNGKey(0), ds.x, ds.y_obs[:, 0], cfg, init_params=pack_gp(0.3, 1.0, 0.1)
    )
    grid = ds.x_true[::3]
    mu, var = fit.predict(jnp.array(grid))
    l, sf, sn = fit.hyperparams()
    print(f"[exact] l={l:.3f} sigma_f={sf:.3f} sigma_n={sn:.3f} "
          f"SMSE={smse(np.asarray(mu), ds.y_true[::3, 0]):.4f}")
    return ds, grid, np.asarray(mu), np.asarray(var)


def temporal_example():
    ds = generate_big_dataset(seed=0)
    cfg = GPARConfig(first_output_backend="temporal", max_opt_steps=150, optimizer="adam")
    t0 = time.time()
    fit = fit_first_output(
        jax.random.PRNGKey(0), ds.x, ds.y_obs[:, 0], cfg, init_params=pack_gp(1.0, 0.5, 1.0)
    )
    grid = ds.x_true[::100]
    mu, var = fit.predict(jnp.array(grid))
    el = time.time() - t0
    in_range = grid <= ds.x.max()  # x_true extends 50 units past the data
    print(f"[temporal] N={len(ds.x)} fit+predict {el:.1f}s "
          f"SMSE(in-range)={smse(np.asarray(mu)[in_range], ds.y_true[::100, 0][in_range]):.4f}")
    return ds, grid, np.asarray(mu), np.asarray(var)


def main():
    e = exact_example()
    t = temporal_example()
    plt = get_plt()
    if plt:
        fig, axes = plt.subplots(2, 1, figsize=(10, 6))
        for ax, (ds, grid, mu, var), tag in zip(axes, (e, t), ("exact small", "temporal big")):
            ax.plot(ds.x_true, ds.y_true[:, 0], "k-", lw=0.8, label="true")
            ax.plot(ds.x, ds.y_obs[:, 0], ".", color="gray", ms=2, alpha=0.5)
            sd = np.sqrt(var)
            ax.plot(grid, mu, "C3-", label=f"{tag} posterior")
            ax.fill_between(grid, mu - 2 * sd, mu + 2 * sd, color="C3", alpha=0.15)
            ax.legend(fontsize=8)
        fig.savefig(out_path("plot_examples.png"), dpi=110, bbox_inches="tight")
        print("saved", out_path("plot_examples.png"))


if __name__ == "__main__":
    main()
