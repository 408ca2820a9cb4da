"""Failure recovery: checkpointed training loops with automatic resume.

SURVEY.md §5.3 build mapping — the reference has no failure handling at all
(every run restarts from random init); here any step-driven loop can
checkpoint every k steps and resume from the latest checkpoint after
preemption/crash, which is the standard TPU-pod recovery model (the runtime
itself is restarted by the scheduler; state recovery is the framework's job).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Tuple

import jax

from gpar_at_scale_tpu.utils.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from gpar_at_scale_tpu.utils.observability import MetricsLogger


def run_with_checkpointing(
    step_fn: Callable[[Any, int], Any],
    init_state: Any,
    num_steps: int,
    checkpoint_dir: Optional[str] = None,
    *,
    checkpoint_every: int = 100,
    logger: Optional[MetricsLogger] = None,
) -> Tuple[Any, int]:
    """Run ``state = step_fn(state, step)`` for ``num_steps``, checkpointing
    every ``checkpoint_every`` steps and resuming from the latest checkpoint
    if one exists.  Returns (final_state, steps_actually_run_this_process).

    ``step_fn`` should be jit-compiled by the caller; the loop itself stays
    in Python so checkpoints reflect completed device work (saving forces a
    host sync of the state).
    """
    start = 0
    state = init_state
    if checkpoint_dir:
        last = latest_step(checkpoint_dir)
        if last is not None:
            state = restore_checkpoint(checkpoint_dir, step=last, like=init_state)
            start = last
            if logger:
                logger.record("resume", step=last)

    ran = 0
    for step in range(start, num_steps):
        state = step_fn(state, step)
        ran += 1
        if checkpoint_dir and (step + 1) % checkpoint_every == 0:
            jax.block_until_ready(state)
            save_checkpoint(checkpoint_dir, step + 1, state)
            if logger:
                logger.record("checkpoint", step=step + 1)
    if checkpoint_dir and num_steps > start:
        jax.block_until_ready(state)
        save_checkpoint(checkpoint_dir, num_steps, state)
    return state, ran
