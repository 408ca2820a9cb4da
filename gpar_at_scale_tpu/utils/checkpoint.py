"""Checkpoint / resume.

The reference persists nothing — optimized hyperparameters live only in
memory and every run restarts from random init (SURVEY.md §5.4).  Here any
pytree (hyperparameters, optimizer state, sampler state including step-size
adaptation, SMC particle clouds) checkpoints atomically via orbax when
available, with a numpy/JSON fallback, keyed by step for resume.

Multi-host: only process 0 writes (orbax handles coordination itself when
initialized under ``jax.distributed``).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np


def _is_host_zero() -> bool:
    return jax.process_index() == 0


def save_checkpoint(directory: str, step: int, tree: Any, overwrite: bool = True) -> str:
    """Save a pytree at ``directory/step_<step>``; returns the path."""
    path = os.path.join(directory, f"step_{step:010d}")
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        if os.path.exists(path) and overwrite:
            shutil.rmtree(path)
        ckptr.save(os.path.abspath(path), tree)
        ckptr.wait_until_finished()
        return path
    except Exception:
        pass  # fall through to the numpy fallback

    if _is_host_zero():
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        np.savez(os.path.join(tmp, "leaves.npz"), *[np.asarray(l) for l in leaves])
        with open(os.path.join(tmp, "treedef.json"), "w") as f:
            json.dump({"treedef": str(treedef), "num_leaves": len(leaves)}, f)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
    return path


def restore_checkpoint(directory: str, step: Optional[int] = None, like: Any = None) -> Any:
    """Restore the checkpoint at ``step`` (default: latest).  ``like`` is an
    example pytree giving the structure (required for the fallback format and
    recommended for orbax)."""
    step = latest_step(directory) if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    path = os.path.join(directory, f"step_{step:010d}")

    npz = os.path.join(path, "leaves.npz")
    if os.path.exists(npz):
        if like is None:
            raise ValueError("fallback checkpoint format requires ``like``")
        data = np.load(npz)
        leaves = [data[k] for k in data.files]
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), target=like)
    return ckptr.restore(os.path.abspath(path))


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(name[len("step_") :])
        for name in os.listdir(directory)
        if name.startswith("step_") and not name.endswith(".tmp")
    ]
    return max(steps) if steps else None
