"""Independent GPs vs. GPAR on the small synthetic chained dataset.

Mirrors ``GPAR_examples/toy_example.jl`` (reference C9): fit per-output
independent GPs and the chained GPAR, predict on a dense grid, and compare
against the known true functions.  Unlike the reference (fixed kernels, no
optimization), hyperparameters here are optimized by L-BFGS.
"""

import sys

sys.path.insert(0, ".")
from examples._common import get_plt, out_path, setup_jax, smse

jax = setup_jax(cpu="--cpu" in sys.argv)

import jax.numpy as jnp
import numpy as np

from gpar_at_scale_tpu.data.toy import generate_small_dataset
from gpar_at_scale_tpu.models.gpar import GPARConfig, fit_first_output, fit_gpar
from gpar_at_scale_tpu.utils.params import pack_gp, pack_gpar


def main():
    ds = generate_small_dataset(seed=0)
    key = jax.random.PRNGKey(0)
    grid = ds.x_true[:: len(ds.x_true) // 300]
    truth = ds.y_true[:: len(ds.x_true) // 300]

    # --- independent GPs (one per output, time input only) ---------------
    cfg = GPARConfig(first_output_backend="exact", max_opt_steps=150)
    igp_preds = []
    for i in range(3):
        fit = fit_first_output(
            jax.random.fold_in(key, i), ds.x, ds.y_obs[:, i], cfg, init_params=pack_gp(0.3, 1.0, 0.1)
        )
        mu, var = fit.predict(jnp.array(grid))
        igp_preds.append((np.asarray(mu), np.asarray(var)))

    # --- GPAR chain ------------------------------------------------------
    gcfg = GPARConfig(backend="exact", first_output_backend="exact", max_opt_steps=150)
    inits = [pack_gp(0.3, 1.0, 0.1)] + [pack_gpar(0.5, 1.0, 1.0, 1.0, 0.1)] * 2
    model = fit_gpar(key, ds.x, ds.y_obs, gcfg, init_params=inits)
    means, variances = model.predict(jnp.array(grid))
    means = np.asarray(means)

    print("output |   IGP SMSE | GPAR SMSE")
    for i in range(3):
        print(
            f"   y{i+1}  | {smse(igp_preds[i][0], truth[:, i]):10.4f} |"
            f" {smse(means[:, i], truth[:, i]):9.4f}"
        )

    plt = get_plt()
    if plt:
        fig, axes = plt.subplots(3, 1, figsize=(9, 9), sharex=True)
        for i, ax in enumerate(axes):
            ax.plot(grid, truth[:, i], "k-", lw=1, label="true")
            ax.plot(ds.x, ds.y_obs[:, i], "k.", ms=4, label="obs")
            ax.plot(grid, igp_preds[i][0], "C0--", label="IGP")
            ax.plot(grid, means[:, i], "C3-", label="GPAR")
            ax.set_ylabel(f"y{i+1}")
            if i == 0:
                ax.legend(ncol=4, fontsize=8)
        fig.savefig(out_path("toy_example.png"), dpi=110, bbox_inches="tight")
        print("saved", out_path("toy_example.png"))


if __name__ == "__main__":
    main()
