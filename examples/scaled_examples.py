"""Scaled-GPAR pipelines on the small and big synthetic datasets.

Mirrors ``examples/GPAR_scaled_examples.jl`` (reference C11): y1 via the O(N)
temporal path, y2/y3 via the DTC + temporal-noise scaled path; the big run
uses 10k training points with gap regions and 50 pseudo-points.
"""

import sys
import time

sys.path.insert(0, ".")
from examples._common import get_plt, out_path, setup_jax, smse

jax = setup_jax(cpu="--cpu" in sys.argv)

import jax.numpy as jnp
import numpy as np

from gpar_at_scale_tpu.data.toy import generate_big_dataset, generate_small_dataset
from gpar_at_scale_tpu.models.gpar import GPARConfig, fit_gpar
from gpar_at_scale_tpu.utils.params import pack_gp, pack_gpar


def run(ds, num_pseudo, max_steps, tag, grid_stride):
    key = jax.random.PRNGKey(0)
    cfg = GPARConfig(
        backend="scaled",
        first_output_backend="temporal",
        num_pseudo_points=num_pseudo,
        max_opt_steps=max_steps,
        optimizer="adam",
    )
    inits = [pack_gp(0.3, 1.0, 0.1)] + [pack_gpar(0.5, 1.0, 1.0, 1.0, 0.1)] * 2
    t0 = time.time()
    model = fit_gpar(key, ds.x, ds.y_obs, cfg, init_params=inits)
    fit_s = time.time() - t0

    grid = ds.x_true[::grid_stride]
    truth = ds.y_true[::grid_stride]
    in_range = grid <= ds.x.max()
    t0 = time.time()
    means, variances = model.predict(jnp.array(grid))
    means = np.asarray(means)
    pred_s = time.time() - t0

    print(f"[{tag}] N={len(ds.x)} M={num_pseudo}  fit {fit_s:.1f}s  predict {pred_s:.1f}s")
    for i in range(3):
        print(f"  y{i+1} SMSE (in-range): {smse(means[in_range, i], truth[in_range, i]):.4f}")

    plt = get_plt()
    if plt:
        fig, axes = plt.subplots(3, 1, figsize=(10, 8), sharex=True)
        for i, ax in enumerate(axes):
            ax.plot(grid, truth[:, i], "k-", lw=0.8, label="true")
            ax.plot(ds.x, ds.y_obs[:, i], ".", color="gray", ms=1, alpha=0.4, label="obs")
            ax.plot(grid, means[:, i], "C3-", lw=1, label="scaled GPAR")
            sd = np.sqrt(np.asarray(variances)[:, i])
            ax.fill_between(grid, means[:, i] - 2 * sd, means[:, i] + 2 * sd, color="C3", alpha=0.15)
            ax.set_ylabel(f"y{i+1}")
        axes[0].legend(ncol=3, fontsize=8)
        fig.savefig(out_path(f"scaled_{tag}.png"), dpi=110, bbox_inches="tight")
        print("saved", out_path(f"scaled_{tag}.png"))


def main():
    small = generate_small_dataset(seed=0)
    run(small, num_pseudo=10, max_steps=150, tag="small", grid_stride=3)
    if "--big" in sys.argv:
        big = generate_big_dataset(seed=0)
        run(big, num_pseudo=50, max_steps=150, tag="big", grid_stride=100)


if __name__ == "__main__":
    main()
