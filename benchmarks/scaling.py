"""Chain-parallel scaling efficiency harness.

North-star: >= 80% linear samples/s scaling (BASELINE.md).  Shards vmapped
NUTS chains over the mesh "chain" axis and measures samples/s at 1, 2, 4, ...
devices.  On real hardware devices are chips/hosts; under
``--xla_force_host_platform_device_count=8`` it validates the mechanism
(virtual CPU devices share cores, so measured efficiency there is not a
hardware claim).

Usage: python benchmarks/scaling.py [--cpu] [--chains-per-device=8]
"""

import sys
import time

sys.path.insert(0, ".")
from examples._common import setup_jax

jax = setup_jax(cpu="--cpu" in sys.argv, x64=False)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gpar_at_scale_tpu.data.toy import generate_small_dataset
from gpar_at_scale_tpu.inference.nuts import nuts
from gpar_at_scale_tpu.models.bayes import make_conditional_logpost
from gpar_at_scale_tpu.parallel.mesh import make_mesh


def run_at(num_devices: int, chains_per_device: int, logpost, num_samples=200, num_warmup=150):
    devices = jax.devices()[:num_devices]
    mesh = make_mesh(("chain",), (num_devices,), devices=devices)
    chains = chains_per_device * num_devices
    keys = jax.random.split(jax.random.PRNGKey(0), chains)
    x0s = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (chains, 5))
    sh = NamedSharding(mesh, P("chain"))
    keys, x0s = jax.device_put(keys, sh), jax.device_put(x0s, sh)

    run = jax.jit(
        jax.vmap(
            lambda k, x: nuts(
                k, logpost, x, num_samples=num_samples, num_warmup=num_warmup, max_depth=6
            ).samples
        )
    )
    out = jax.block_until_ready(run(keys, x0s))  # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(keys, x0s))
    el = time.perf_counter() - t0
    total = chains * num_samples
    return total / el, el


def main():
    cpd = 8
    for a in sys.argv[1:]:
        if a.startswith("--chains-per-device="):
            cpd = int(a.split("=")[1])
    ds = generate_small_dataset(seed=0)
    V = ds.y_obs[:, :1]
    logpost = make_conditional_logpost(
        ds.x, V, ds.y_obs[:, 1], likelihood="dtc", Z=V[::3], dtype=jnp.float32
    )

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    base = None
    print(f"devices available: {n_dev}; chains/device: {cpd}")
    for d in sizes:
        sps, el = run_at(d, cpd, logpost)
        if base is None:
            base = sps
        eff = sps / (base * d) * 100
        print(f"{d:3d} devices: {sps:10.1f} samples/s  ({el:.2f}s)  efficiency {eff:5.1f}%")


if __name__ == "__main__":
    main()
