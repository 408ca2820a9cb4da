"""ESS/s for hyperparameter NUTS on the EEG GPAR-DTC posterior — the
BASELINE.json headline metric.

Usage: python benchmarks/ess.py [--cpu] [--chains=8]
"""

import sys
import time

sys.path.insert(0, ".")
from examples._common import setup_jax, sync

jax = setup_jax(cpu="--cpu" in sys.argv, x64=False)

import jax.numpy as jnp
import numpy as np

from gpar_at_scale_tpu.data.eeg import TRAIN_POINTS, load_eeg
from gpar_at_scale_tpu.inference.hmc import effective_sample_size
from gpar_at_scale_tpu.inference.nuts import nuts
from gpar_at_scale_tpu.models.bayes import make_conditional_logpost


def main():
    chains = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--chains=")), 8)
    full = "--full" in sys.argv
    ds = load_eeg(None, seed=0)
    n_tr = TRAIN_POINTS
    obs = [ds.channels.index(c) for c in ("F3", "F4", "F5", "F6")]
    X = np.stack([ds.Y[:n_tr, i] for i in obs], axis=1)
    y = ds.Y[:n_tr, ds.channels.index("FZ")]
    # full: pseudo-points == training inputs (the reference's EEG choice);
    # default: strided 32 so the benchmark also completes on 2 CPU cores.
    Z = X if full else X[:: max(1, n_tr // 32)]
    logpost = make_conditional_logpost(
        ds.t[:n_tr], X, y, likelihood="dtc", Z=Z, dtype=jnp.float32
    )

    num_samples, num_warmup = (500, 300) if full else (300, 200)
    keys = jax.random.split(jax.random.PRNGKey(0), chains)
    x0s = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (chains, 5))
    run = jax.jit(
        jax.vmap(
            lambda k, x: nuts(
                k, logpost, x, num_samples=num_samples, num_warmup=num_warmup, max_depth=7
            )
        )
    )
    # _common.sync: block_until_ready is not a reliable barrier through the
    # axon TPU tunnel (returns before remote execution completes).
    res = run(keys, x0s)
    sync(res)  # compile
    t0 = time.perf_counter()
    res = run(keys, x0s)
    sync(res)
    el = time.perf_counter() - t0

    pooled = np.asarray(res.samples)  # (C, S, 5)
    ess_per_chain = np.stack([np.asarray(effective_sample_size(jnp.asarray(c))) for c in pooled])
    total_ess = ess_per_chain.sum(axis=0)  # (5,)
    print(f"device: {jax.devices()[0]}  chains: {chains}  wall: {el:.2f}s")
    print(f"divergences: {int(np.sum(np.asarray(res.num_divergent)))}")
    print(f"mean accept: {float(np.mean(np.asarray(res.accept_prob))):.3f}")
    print(f"ESS (per param): {np.round(total_ess, 1)}")
    print(f"ESS/s (min over params): {total_ess.min()/el:,.1f}")
    print(f"samples/s: {chains*num_samples/el:,.1f}")


if __name__ == "__main__":
    main()
