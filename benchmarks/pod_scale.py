"""Pod-scale GPAR harness — BASELINE.md config 5 (16 outputs, 10M points,
1024 NUTS chains over a multi-host mesh), runnable scaled-down anywhere.

Two phases exercise the two parallel axes the pod config combines:

  A. chain-parallel hyperparameter NUTS: per conditional GP of a P-output
     GPAR chain, C chains shard over the mesh "chain" axis (the reference has
     a single Nelder-Mead trajectory here, SURVEY.md §2c).
  B. sequence-parallel whitening: one batched decorrelate pass over an
     N-point series through the explicit time-block-sharded filter
     (parallel/seqshard.py) on the mesh "data" axis — the 10M-point axis.

On this sandbox the mesh is 8 virtual CPU devices (--cpu) or the single real
chip; defaults are scaled down accordingly.  On a v5p slice, pass
--outputs=16 --n=10000000 --chains=1024.

Usage:
  python benchmarks/pod_scale.py [--cpu] [--outputs=P] [--n=N]
                                 [--chains=C] [--samples=S]
Prints one JSON line per phase.
"""

import json
import sys
import time

sys.path.insert(0, ".")
from examples._common import setup_jax

jax = setup_jax(cpu="--cpu" in sys.argv, x64=False)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gpar_at_scale_tpu.inference.nuts import nuts
from gpar_at_scale_tpu.kernels import Matern52
from gpar_at_scale_tpu.models.bayes import make_conditional_logpost
from gpar_at_scale_tpu.parallel.mesh import make_mesh
from gpar_at_scale_tpu.parallel.seqshard import make_sharded_decorrelate
from gpar_at_scale_tpu.ssm.markov import lgssm_of


def _arg(name, default, cast=int):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return cast(a.split("=", 1)[1])
    return default


def chain_phase(mesh, outputs, chains, n_train, m_induce, num_samples, num_warmup):
    """Phase A: P conditionals x C sharded NUTS chains each."""
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0.0, 4.0, size=n_train))
    Y = np.cumsum(rng.normal(size=(n_train, outputs)), axis=1) * 0.3 + np.sin(
        2.0 * t
    )[:, None]

    sh = NamedSharding(mesh, P("chain"))
    total_samples = 0
    t0 = time.perf_counter()
    per_out = []
    for i in range(1, outputs):  # conditionals (output 0 is the temporal GP)
        X_prev = Y[:, :i]
        Z = X_prev[:: max(1, n_train // m_induce)][:m_induce]
        logpost = make_conditional_logpost(
            t, X_prev, Y[:, i], likelihood="dtc", Z=Z, dtype=jnp.float32
        )
        keys = jax.device_put(
            jax.random.split(jax.random.PRNGKey(i), chains), sh
        )
        x0s = jax.device_put(
            0.3 * jax.random.normal(jax.random.PRNGKey(100 + i), (chains, 5), jnp.float32),
            sh,
        )
        run = jax.jit(
            jax.vmap(
                lambda k, x: nuts(
                    k,
                    logpost,
                    x,
                    num_samples=num_samples,
                    num_warmup=num_warmup,
                    max_depth=6,
                ).samples
            )
        )
        out = jax.block_until_ready(run(keys, x0s))
        per_out.append(float(jnp.mean(out)))
        total_samples += chains * num_samples
    elapsed = time.perf_counter() - t0
    return total_samples / elapsed, elapsed


def sequence_phase(mesh, n_long, batch_cols):
    """Phase B: batched whitening of an n_long-step series, time-sharded."""
    dtype = jnp.float32
    rng = np.random.default_rng(1)
    t = jnp.asarray(np.cumsum(rng.uniform(0.5, 1.5, size=n_long)) / n_long, dtype)
    Y = jnp.asarray(rng.normal(size=(n_long, batch_cols)), dtype)
    k = Matern52(lengthscale=jnp.asarray(0.5, dtype), variance=jnp.asarray(1.0, dtype))
    lgssm = lgssm_of(k, t, 0.1, dtype)

    data_sh = NamedSharding(mesh, P("data"))
    Y = jax.device_put(Y, NamedSharding(mesh, P("data", None)))
    lgssm = type(lgssm)(
        A=jax.device_put(lgssm.A, NamedSharding(mesh, P("data", None, None))),
        Q=jax.device_put(lgssm.Q, NamedSharding(mesh, P("data", None, None))),
        H=jax.device_put(lgssm.H, NamedSharding(mesh, P())),
        R=jax.device_put(lgssm.R, data_sh),
    )
    dec = make_sharded_decorrelate(mesh, "data")
    run = jax.jit(lambda lg, y: dec(lg, y)[1])
    jax.block_until_ready(run(lgssm, Y))  # compile
    t0 = time.perf_counter()
    alpha = jax.block_until_ready(run(lgssm, Y))
    elapsed = time.perf_counter() - t0
    assert bool(jnp.all(jnp.isfinite(alpha[-1])))
    return n_long * batch_cols / elapsed, elapsed


def main():
    on_cpu = "--cpu" in sys.argv
    ndev = len(jax.devices())
    # Mesh: chain axis for phase A; a separate data-axis mesh for phase B
    # (a pod run would use one 2-D mesh; phases here exercise each axis).
    chain_mesh = make_mesh(("chain",), (ndev,))
    data_mesh = make_mesh(("data",), (ndev,))

    outputs = _arg("outputs", 4 if on_cpu else 16)
    chains = _arg("chains", 2 * ndev if on_cpu else 64)
    n_train = _arg("n-train", 96)
    n_long = _arg("n", 100_000 if on_cpu else 1_000_000)
    samples = _arg("samples", 50 if on_cpu else 200)
    warmup = _arg("warmup", 50 if on_cpu else 150)

    sps, el_a = chain_phase(chain_mesh, outputs, chains, n_train, 32, samples, warmup)
    print(
        json.dumps(
            {
                "metric": "pod_chain_nuts_samples_per_s",
                "value": round(sps, 1),
                "unit": "samples/s",
                "outputs": outputs,
                "chains": chains,
                "devices": ndev,
                "elapsed_s": round(el_a, 2),
            }
        )
    )

    pps, el_b = sequence_phase(data_mesh, n_long, batch_cols=8)
    print(
        json.dumps(
            {
                "metric": "pod_seq_whiten_points_per_s",
                "value": round(pps, 1),
                "unit": "points/s",
                "n": n_long,
                "devices": ndev,
                "elapsed_s": round(el_b, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
