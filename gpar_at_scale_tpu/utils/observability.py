"""Observability: structured logging, stage timers, throughput counters,
and jax.profiler integration.

The reference's observability is ``debug::Bool`` kwargs gating ``println``
(SURVEY.md §5.5) and no profiling at all (§5.1 — BenchmarkTools declared but
never invoked).  This module provides the structured equivalents: per-
iteration metric records (NLML, acceptance, step size), wall-clock stage
timers with device synchronization, samples/s / ESS/s / obs/s counters, and
profiler trace capture — all gated to host 0 under multi-host runs.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax


def host_zero() -> bool:
    return jax.process_index() == 0


@dataclass
class MetricsLogger:
    """Append-only JSONL metric stream (stderr or file), host-0 only.

    Usage: ``log.record("fit", step=i, nlml=float(loss), step_size=eps)``.
    """

    path: Optional[str] = None
    echo: bool = False
    _fh: Any = field(default=None, repr=False)
    _records: List[Dict] = field(default_factory=list, repr=False)

    def record(self, event: str, **fields):
        if not host_zero():
            return
        rec = {"event": event, "time": time.time(), **fields}
        self._records.append(rec)
        line = json.dumps(rec)
        if self.path:
            if self._fh is None:
                self._fh = open(self.path, "a")
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.echo:
            print(line, file=sys.stderr)

    @property
    def records(self) -> List[Dict]:
        return self._records

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


@contextlib.contextmanager
def stage_timer(name: str, logger: Optional[MetricsLogger] = None, sync: Any = None):
    """Wall-clock a stage; ``sync`` is an array (or pytree) to
    block_until_ready on before stopping the clock so device work is counted."""
    t0 = time.perf_counter()
    holder = {}
    try:
        yield holder
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        elif "sync" in holder:
            jax.block_until_ready(holder["sync"])
        dt = time.perf_counter() - t0
        holder["seconds"] = dt
        if logger is not None:
            logger.record("stage", name=name, seconds=dt)
        elif host_zero():
            print(f"[{name}] {dt:.3f}s", file=sys.stderr)


def throughput(count: int, seconds: float, unit: str = "items") -> Dict[str, float]:
    return {f"{unit}_per_s": count / seconds if seconds > 0 else float("inf"), "seconds": seconds}


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (TensorBoard format) when a dir is given;
    no-op otherwise."""
    if not log_dir or not host_zero():
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
