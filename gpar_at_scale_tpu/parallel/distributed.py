"""Multi-host runtime initialization + collectives conventions.

TPU-native equivalent of a distributed backend (the reference has none —
SURVEY.md §5.8): ``jax.distributed.initialize`` boots the multi-host runtime
(one process per host of a pod slice); all cross-device communication then
happens through XLA collectives inserted by pjit/shard_map over the global
mesh — psum for Gram/log-evidence reductions, all_gather for pseudo-point
posteriors, ppermute inside the associative scan's block-boundary exchange.
ICI carries intra-slice traffic, DCN across slices; both are chosen by the
compiler from the mesh axis layout (devices within a host/slice should be
contiguous on the trailing mesh axes).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host runtime when running under a launcher.

    On TPU pods the arguments are auto-detected from the metadata server;
    on CPU/GPU clusters pass them (or set JAX_COORDINATOR_ADDRESS etc.).
    Returns True if a multi-process runtime is active.  Safe to call in
    single-process runs (no-op).
    """
    # NB: do not touch jax.process_count()/jax.devices() before deciding —
    # they initialize the XLA backend, after which distributed.initialize
    # raises.  Prior initialization is visible on the distributed global
    # state without a backend round-trip.
    from jax._src.distributed import global_state

    if global_state.client is not None:
        return jax.process_count() > 1
    want_multi = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not want_multi:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def global_mesh(
    axis_names: Sequence[str] = ("chain", "data"),
    axis_sizes: Optional[Sequence[int]] = None,
):
    """Mesh over ALL processes' devices (jax.devices() is global after
    ``initialize_distributed``).  Host-local device blocks land on the
    trailing axis so the data axis rides ICI within a host/slice and the
    chain axis crosses DCN — matching the communication volumes (chain axis
    is embarrassingly parallel, data axis carries the scan boundaries and
    Gram psums)."""
    from gpar_at_scale_tpu.parallel.mesh import make_mesh

    return make_mesh(axis_names, axis_sizes, devices=jax.devices())
