"""Chain-parallel scaling efficiency harness.

North-star: >= 80% linear samples/s scaling (BASELINE.md).  Shards vmapped
NUTS chains over the mesh "chain" axis and measures samples/s at 1, 2, 4, ...
devices.  On real hardware devices are chips/hosts; under
``--xla_force_host_platform_device_count=8`` it validates the mechanism
(virtual CPU devices share cores, so measured efficiency there is not a
hardware claim).

``--weak``: fixed-work-per-device sequence scaling (VERDICT r2 item 5).  The
time-block-sharded whitening pass (``parallel/seqshard.py``) runs at
N = n_per_device x D for D = 1, 2, 4, ...; on real hardware wall-clock stays
~flat because per-device compute is constant and the communication is one
all_gather of D block-total elements + one ppermute boundary hop + one psum
per call — O(D d^2) bytes, INDEPENDENT of N.  The harness prints the exact
per-call communication volume next to the per-device FLOPs so the >= 80%
scaling target is argued from measured mechanism costs (on the 2-core CPU
sandbox the wall-clock column measures core oversubscription, not the
mechanism).

Usage: python benchmarks/scaling.py [--cpu] [--chains-per-device=8]
       [--weak] [--n-per-device=65536]
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


def weak_scaling(n_per_device: int):
    """Fixed work per device: N grows with the device count; communication
    per call does not grow with N (it is one all_gather of D block totals +
    one ppermute + one psum).  Prints measured wall-clock AND the analytic
    per-call communication volume vs per-device FLOPs."""
    import numpy as np

    from gpar_at_scale_tpu.kernels import Matern52
    from gpar_at_scale_tpu.parallel.seqshard import make_sharded_decorrelate
    from gpar_at_scale_tpu.ssm.markov import lgssm_of

    k = Matern52(lengthscale=1.0, variance=1.0)
    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16) if d <= n_dev]
    print(f"weak scaling: n_per_device={n_per_device}, devices {sizes}")
    base = None
    for D in sizes:
        N = n_per_device * D
        rng = np.random.default_rng(0)
        t = jnp.asarray(np.cumsum(rng.uniform(0.5, 1.5, N)) / 1000.0, jnp.float32)
        y = jnp.asarray(
            np.sin(np.asarray(t) * 3) + 0.3 * rng.normal(size=N), jnp.float32
        )
        lg = lgssm_of(k, t, 0.09, jnp.float32)
        mesh = make_mesh(("data",), (D,), devices=jax.devices()[:D])
        dec = make_sharded_decorrelate(mesh, "data")
        run = jax.jit(lambda yy: dec(lg, yy)[0])
        float(np.asarray(run(y)))  # compile (host fetch = tunnel-safe barrier)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            float(np.asarray(run(y)))
        el = (time.perf_counter() - t0) / reps

        # Communication per call per device (f32 = 4 bytes):
        #   all_gather of D filtering-element block totals, each
        #   (A dxd, b dxC, C dxd, eta dxC, J dxd) = 3d^2 + 2dC floats;
        #   ppermute of the boundary (m dxC, P dxd); psum of the C lml terms.
        d = int(lg.dim)
        C = 1
        ag = D * (3 * d * d + 2 * d * C) * 4
        pp = (d * C + d * d) * 4
        ps = C * 4
        comm = ag + pp + ps
        # Per-device FLOPs: the local associative scan performs ~2(N/D)
        # element combines (up+down sweep) of ~20 d^3 flops each, plus the
        # O(N/D d^2) element build / phase-3 fold.
        flops = 2 * (N // D) * 20 * d**3 + (N // D) * 10 * d * d
        if base is None:
            base = el
        print(
            f"{D:3d} dev  N={N:>9,}  wall {el*1e3:8.2f} ms  (x{el/base:4.2f} vs 1 dev)"
            f"  comm/call/dev {comm:6d} B  flops/dev ~{flops/1e6:7.1f} MF"
            f"  comm/flops {comm/flops:.2e} B/F"
        )
    print(
        "communication is O(D d^2) per call independent of N -> at fixed work "
        "per device the comm:compute ratio FALLS with N; >= 80% scaling needs "
        f"only that one {comm} B all_gather+ppermute ride ICI faster than "
        "the per-device scan (microseconds on real hardware)."
    )


def main():
    if "--weak" in sys.argv:
        npd = next(
            (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--n-per-device=")),
            65536,
        )
        weak_scaling(npd)
        return
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
