"""ESS/s for hyperparameter NUTS on the EEG GPAR-DTC posterior — the
BASELINE.json headline metric.

r3: samples through the bounded tanh reparameterization
(``models.bayes.bounded_reparam``) so f32 Cholesky cliffs at prior tails are
unreachable (r2 measured 24.5% divergent transitions without it), and runs
in bounded-size device executions (``nuts_chunked``) so large chain counts
complete instead of tripping this environment's ~1-3 min single-execution
cap (r2: --chains=32 crashed the TPU worker).

Usage: python benchmarks/ess.py [--cpu] [--chains=8] [--full] [--segment=50]
       [--samples=K] [--warmup=W]

r5: ``--samples``/``--warmup`` override the per-chain lengths — the r4
32-chain row (300 kept/chain) had NOT mixed (split-R-hat 1.081); the r5 row
runs 32 x 1000 kept so many short chains become many LONG chains.
"""

import sys
import time

sys.path.insert(0, ".")
from examples._common import setup_jax, sync

jax = setup_jax(cpu="--cpu" in sys.argv, x64=False)

import jax.numpy as jnp
import numpy as np

from gpar_at_scale_tpu.data.eeg import TRAIN_POINTS, load_eeg
from gpar_at_scale_tpu.inference.diagnostics import ess as multichain_ess, split_rhat
from gpar_at_scale_tpu.inference.hmc import effective_sample_size
from gpar_at_scale_tpu.inference.nuts import nuts_chunked
from gpar_at_scale_tpu.models.bayes import bounded_reparam, make_conditional_logpost


def main():
    chains = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--chains=")), 8)
    segment = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--segment=")), 50)
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
    logpost_u, constrain = bounded_reparam(logpost, bound=3.0)

    num_samples, num_warmup = (500, 300) if full else (300, 200)
    num_samples = next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--samples=")),
        num_samples,
    )
    num_warmup = next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--warmup=")),
        num_warmup,
    )
    x0s = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (chains, 5))

    def run():
        return nuts_chunked(
            jax.random.PRNGKey(0), logpost_u, x0s,
            num_samples=num_samples, num_warmup=num_warmup,
            segment_size=segment, max_depth=7,
        )

    # nuts_chunked syncs between segments internally (host-value fetches —
    # block_until_ready is not a reliable barrier through the axon tunnel).
    res = run()
    sync(res)  # compile pass
    t0 = time.perf_counter()
    res = run()
    sync(res)
    el = time.perf_counter() - t0

    pooled = np.asarray(jax.vmap(jax.vmap(constrain))(res.samples))  # (C, S, 5)
    # Headline estimator: the rigorous multi-chain Vehtari-et-al. ESS
    # (between-chain variance deflates disagreeing chains) with split-R-hat
    # alongside (r3 verdict weak #3 / advisor finding: the per-chain Geyer
    # sum has no between-chain term and is optimistic).
    mc_ess = np.atleast_1d(multichain_ess(pooled))  # (5,)
    rhat = np.atleast_1d(split_rhat(pooled))  # (5,)
    # Legacy per-chain Geyer sum, kept for comparability with the r2/r3 rows.
    ess_per_chain = np.stack([np.asarray(effective_sample_size(jnp.asarray(c))) for c in pooled])
    geyer_sum = ess_per_chain.sum(axis=0)  # (5,)
    n_div = int(np.sum(np.asarray(res.num_divergent)))
    n_tot = chains * num_samples
    print(f"device: {jax.devices()[0]}  chains: {chains}  wall: {el:.2f}s")
    print(f"divergences: {n_div} / {n_tot} ({100.0*n_div/n_tot:.2f}%)")
    print(f"mean accept: {float(np.mean(np.asarray(res.accept_prob))):.3f}")
    print(f"split-R-hat (per param): {np.round(rhat, 4)}")
    print(f"multi-chain ESS (per param): {np.round(mc_ess, 1)}")
    print(f"multi-chain ESS/s (min over params): {mc_ess.min()/el:,.1f}")
    print(f"[legacy per-chain Geyer sum ESS: {np.round(geyer_sum, 1)}; "
          f"min/s {geyer_sum.min()/el:,.1f}]")
    print(f"samples/s: {chains*num_samples/el:,.1f}")


if __name__ == "__main__":
    main()
