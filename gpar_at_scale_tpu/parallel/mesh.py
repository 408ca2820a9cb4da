"""Device-mesh + sharding helpers.

The reference has no hardware parallelism whatsoever (SURVEY.md §2c); this
module is the north-star scaling layer: a named ``jax.sharding.Mesh`` with
axes for (chains/particles, data-or-time blocks), ``NamedSharding``
placements, and sharded training/inference steps where XLA inserts the
psum/all-gather collectives over ICI/DCN.

Conventions:
  axis "chain" — embarrassingly parallel axis: MCMC chains, SMC particles,
                 multi-start optimizations, GPAR outputs.
  axis "data"  — N-axis sharding of observations / inducing blocks /
                 time blocks of the associative-scan filter.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_names: Sequence[str] = ("chain", "data"),
    axis_sizes: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    With ``axis_sizes=None`` all devices go to the first axis.  On a real
    multi-host slice the same call shards over ICI/DCN; in tests the devices
    are the 8 virtual CPU devices.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"axis sizes {axis_sizes} do not multiply to {n} devices")
    dev_array = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(dev_array, tuple(axis_names))


def shard_along(mesh: Mesh, axis_name: Optional[str], ndim: int, dim: int = 0) -> NamedSharding:
    """NamedSharding placing array dimension ``dim`` on mesh axis
    ``axis_name`` (None = fully replicated)."""
    spec = [None] * ndim
    if axis_name is not None:
        spec[dim] = axis_name
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh, ndim: int = 0) -> NamedSharding:
    return NamedSharding(mesh, P())
