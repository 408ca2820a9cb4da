"""EEG multi-output prediction: IGP vs exact GPAR vs scaled GPAR.

Mirrors ``examples/eeg.jl`` (reference C13): channels F3, F4, F5, F6 are
observed over all 256 points; FZ, F1, F2 are observed for t = 1..156 and
predicted for t = 157..256, chained FZ -> F1 -> F2 with the observed
channels (and previously predicted ones) as conditioning inputs.  Pseudo-
points are the training inputs themselves (``examples/eeg.jl:217-220``).

Uses the real CSV if a path is given, else the synthetic EEG generator.
"""

import sys

sys.path.insert(0, ".")
from examples._common import get_plt, out_path, setup_jax, smse

jax = setup_jax(cpu="--cpu" in sys.argv)

import jax.numpy as jnp
import numpy as np

from gpar_at_scale_tpu.data.eeg import TRAIN_POINTS, load_eeg
from gpar_at_scale_tpu.models.gpar import (
    GPARConfig,
    fit_conditional,
    fit_first_output,
)
from gpar_at_scale_tpu.utils.params import pack_gp, pack_gpar

PREDICTED = ("FZ", "F1", "F2")  # chain order (examples/eeg.jl:212-236)
OBSERVED = ("F3", "F4", "F5", "F6")


def run(backend: str, ds, key):
    """Fit the chain with the given backend; returns dict channel -> (mu, var)."""
    n_tr = TRAIN_POINTS
    t_tr, t_te = ds.t[:n_tr], ds.t[n_tr:]
    obs_idx = [ds.channels.index(c) for c in OBSERVED]
    preds = {}
    prev_cols_tr = [ds.Y[:n_tr, i] for i in obs_idx]
    prev_cols_te = [ds.Y[n_tr:, i] for i in obs_idx]
    cfg = GPARConfig(
        backend=backend,
        num_pseudo_points=n_tr,  # pseudo-points == training inputs
        max_opt_steps=150,
    )
    for ci, ch in enumerate(PREDICTED):
        yi = ds.channels.index(ch)
        X_tr = np.stack(prev_cols_tr, axis=1)
        X_te = np.stack(prev_cols_te, axis=1)
        fit = fit_conditional(
            jax.random.fold_in(key, ci),
            t_tr,
            X_tr,
            ds.Y[:n_tr, yi],
            cfg,
            init_params=pack_gpar(0.1, 1.0, 1.0, 1.0, 0.3),
        )
        mu, var = fit.predict(jnp.array(t_te), jnp.array(X_te))
        preds[ch] = (np.asarray(mu), np.asarray(var))
        prev_cols_tr.append(ds.Y[:n_tr, yi])  # train on true values
        prev_cols_te.append(np.asarray(mu))  # chain predictions forward
    return preds


def run_igp(ds, key):
    n_tr = TRAIN_POINTS
    preds = {}
    cfg = GPARConfig(first_output_backend="temporal", max_opt_steps=150)
    for ci, ch in enumerate(PREDICTED):
        yi = ds.channels.index(ch)
        fit = fit_first_output(
            jax.random.fold_in(key, 100 + ci),
            ds.t[:n_tr],
            ds.Y[:n_tr, yi],
            cfg,
            init_params=pack_gp(0.05, 1.0, 0.3),
        )
        mu, var = fit.predict(jnp.array(ds.t[n_tr:]))
        preds[ch] = (np.asarray(mu), np.asarray(var))
    return preds


def main(csv_path=None):
    ds = load_eeg(csv_path, seed=0)
    key = jax.random.PRNGKey(0)
    igp = run_igp(ds, key)
    exact = run("exact", ds, key)
    scaled = run("scaled", ds, key)

    n_tr = TRAIN_POINTS
    print("channel |  IGP SMSE | GPAR SMSE | scaled SMSE")
    for ch in PREDICTED:
        truth = ds.Y[n_tr:, ds.channels.index(ch)]
        print(
            f"  {ch:>4}  | {smse(igp[ch][0], truth):9.4f} |"
            f" {smse(exact[ch][0], truth):9.4f} | {smse(scaled[ch][0], truth):11.4f}"
        )

    plt = get_plt()
    if plt:
        fig, axes = plt.subplots(3, 1, figsize=(10, 8), sharex=True)
        t_te = ds.t[n_tr:]
        for ax, ch in zip(axes, PREDICTED):
            truth = ds.Y[:, ds.channels.index(ch)]
            ax.plot(ds.t, truth, "k-", lw=0.8, label="true")
            mu, var = exact[ch]
            ax.plot(t_te, mu, "C3-", label="GPAR exact")
            ax.fill_between(t_te, mu - 2 * np.sqrt(var), mu + 2 * np.sqrt(var), color="C3", alpha=0.2)
            ax.plot(t_te, scaled[ch][0], "C0--", label="GPAR scaled")
            ax.axvline(ds.t[n_tr], color="gray", ls=":")
            ax.set_ylabel(ch)
        axes[0].legend(ncol=3, fontsize=8)
        fig.savefig(out_path("eeg.png"), dpi=110, bbox_inches="tight")
        print("saved", out_path("eeg.png"))


if __name__ == "__main__":
    path = next((a for a in sys.argv[1:] if not a.startswith("--")), None)
    main(path)
