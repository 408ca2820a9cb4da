"""Shared example utilities: headless plotting + env scrubbing + metrics."""

import os
import sys


def setup_jax(cpu: bool = False, x64: bool = True):
    """Examples default to whatever platform the session provides; pass
    cpu=True to force the (scrubbed) CPU path.

    If a TPU-tunnel PJRT plugin was already registered at interpreter start
    (sitecustomize), in-process env scrubbing is too late — re-exec once with
    a clean environment.
    """
    if cpu:
        if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("_GPAR_TPU_REEXEC"):
            env = dict(os.environ)
            for v in (
                "PALLAS_AXON_POOL_IPS",
                "PALLAS_AXON_REMOTE_COMPILE",
                "AXON_LOOPBACK_RELAY",
                "AXON_POOL_SVC_OVERRIDE",
                "PALLAS_AXON_TPU_GEN",
            ):
                env.pop(v, None)
            env["_GPAR_TPU_REEXEC"] = "1"
            env["JAX_PLATFORMS"] = "cpu"
            # FORCE the CPU cache dir (not setdefault): a pre-set shared
            # cache would leak remote-compiled executables built for a
            # different host's CPU features into local runs (SIGILL risk —
            # r3 advisor finding on scaling_weak).
            env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
            flags = env.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
        for v in (
            "PALLAS_AXON_POOL_IPS",
            "PALLAS_AXON_REMOTE_COMPILE",
            "AXON_LOOPBACK_RELAY",
            "PALLAS_AXON_TPU_GEN",
        ):
            os.environ.pop(v, None)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # Force-override: never let a TPU-env cache serve CPU runs (see
        # CLAUDE.md "Compile-cache hygiene").
        os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
    else:
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
    import jax

    if x64:
        jax.config.update("jax_enable_x64", True)
    # See tests/conftest.py: XLA AOT sub-cache feature stamps are unreliable
    # across processes in this sandbox.
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    return jax


def get_plt():
    """matplotlib with Agg backend, or None if unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def out_path(name: str) -> str:
    d = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


def smse(pred, truth):
    """Standardized mean squared error (normalized by truth variance)."""
    import numpy as np

    pred = np.asarray(pred)
    truth = np.asarray(truth)
    return float(np.mean((pred - truth) ** 2) / np.var(truth))


def sync(*trees):
    """True completion barrier for timing.

    ``jax.block_until_ready`` is NOT a reliable barrier through the axon TPU
    tunnel in this sandbox — it has been observed returning before the remote
    execution finishes, making timings wildly optimistic.  Fetching a single
    element of each leaf to the host forces real completion (the slice op
    must wait for its producer).  Costs one extra dispatch RTT (~30 ms via
    the tunnel) — negligible against the multi-second workloads timed with
    it, and stated in BENCHMARKS.md methodology.
    """
    import jax

    tot = 0.0
    for tr in trees:
        for leaf in jax.tree.leaves(tr):
            tot += float(leaf.ravel()[0]) * 0.0
    return tot


def chol_psd(Amat, max_rel=0.1):
    """Host-f64 Cholesky with escalating diagonal jitter.

    An on-chip f32 whitened Gram carries absolute error ~ sqrt(N)*eps_f32 of
    its O(N) diagonal, and near-duplicate inducing columns push
    cond(Gb + Kuu) past 1e9 — so the M x M matrix handed to the host can be
    numerically indefinite even though the exact matrix is PSD.  Symmetrize
    and retry with jitter 1e-12, 1e-11, ... of the diagonal scale; the
    accepted perturbation is the same order as (or far below) the f32
    Gram's own error, so the bound/gradients are unchanged to working
    precision.  Returns (L, rel_jitter).
    """
    import numpy as np

    Amat = np.asarray(Amat, np.float64)
    Amat = 0.5 * (Amat + Amat.T)
    scale = max(float(np.max(np.diag(Amat))), 1e-300)
    eps = 0.0
    while True:
        try:
            M_j = Amat + eps * np.eye(Amat.shape[0]) if eps else Amat
            return np.linalg.cholesky(M_j), eps / scale
        except np.linalg.LinAlgError:
            eps = 1e-12 * scale if eps == 0.0 else eps * 10.0
            if eps > max_rel * scale:
                raise


def farthest_points(V, M, seed=0, max_sub=65536):
    """Greedy max-min (k-center) inducing-point selection on the host.

    Strided subsampling of a bounded signal picks near-duplicate rows,
    which makes K_uu nearly singular and the whitened Gram's columns
    collinear (the r5 chain f64-cliff); well-separated points fix the
    conditioning at the source AND cover the conditioning space better.
    O(M * max_sub * d) on a fixed-seed subsample.
    """
    import numpy as np

    V = np.asarray(V, np.float64)
    rs = np.random.default_rng(seed)
    if len(V) > max_sub:
        V = V[rs.choice(len(V), size=max_sub, replace=False)]
    sel = np.empty((M, V.shape[1]))
    sel[0] = V[0]
    d2 = np.sum((V - sel[0]) ** 2, axis=1)
    for j in range(1, M):
        sel[j] = V[int(np.argmax(d2))]
        d2 = np.minimum(d2, np.sum((V - sel[j]) ** 2, axis=1))
    return sel
