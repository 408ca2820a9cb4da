"""Aux subsystems: config tree, checkpoint/resume, observability,
determinism (SURVEY.md §5 build mappings)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_at_scale_tpu.config import Config, kernel_family
from gpar_at_scale_tpu.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from gpar_at_scale_tpu.utils.observability import MetricsLogger, stage_timer, throughput


def test_config_roundtrip_and_overrides():
    cfg = Config()
    rest = cfg.apply_overrides(
        ["--sampler.num_chains=16", "--model.backend=exact", "--optimizer.learning_rate=0.1", "pos"]
    )
    assert rest == ["pos"]
    assert cfg.sampler.num_chains == 16
    assert cfg.model.backend == "exact"
    assert cfg.optimizer.learning_rate == 0.1
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2.sampler.num_chains == 16
    assert kernel_family(cfg.kernel.time_family).__name__ == "Matern52"
    with pytest.raises(ValueError):
        kernel_family("NotAKernel")


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "params": jnp.arange(5.0),
        "opt": {"mu": jnp.ones((2, 3)), "step": jnp.asarray(7)},
    }
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 3, tree)
    save_checkpoint(d, 10, jax.tree_util.tree_map(lambda a: a + 1, tree))
    assert latest_step(d) == 10
    like = jax.tree_util.tree_map(lambda a: np.zeros_like(a), tree)
    restored = restore_checkpoint(d, like=like)
    np.testing.assert_allclose(restored["params"], np.arange(5.0) + 1)
    np.testing.assert_allclose(restored["opt"]["step"], 8)
    restored3 = restore_checkpoint(d, step=3, like=like)
    np.testing.assert_allclose(restored3["params"], np.arange(5.0))


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = MetricsLogger(path=path)
    log.record("fit", step=1, nlml=12.5)
    log.record("fit", step=2, nlml=11.0)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert [l["step"] for l in lines] == [1, 2]
    assert lines[1]["nlml"] == 11.0


def test_stage_timer_counts_device_work():
    log = MetricsLogger()
    with stage_timer("matmul", logger=log) as h:
        x = jnp.ones((200, 200))
        h["sync"] = x @ x
    assert log.records[0]["name"] == "matmul"
    assert log.records[0]["seconds"] > 0
    tp = throughput(1000, 2.0, "obs")
    assert tp["obs_per_s"] == 500


def test_fixed_keys_are_bitwise_deterministic():
    """SURVEY §5.2 build mapping: same PRNG keys + same mesh => identical
    results."""
    from gpar_at_scale_tpu.inference.nuts import nuts

    def lp(x):
        return -0.5 * jnp.sum(x * x)

    r1 = nuts(jax.random.PRNGKey(5), lp, jnp.ones(2), num_samples=50, num_warmup=50, max_depth=4)
    r2 = nuts(jax.random.PRNGKey(5), lp, jnp.ones(2), num_samples=50, num_warmup=50, max_depth=4)
    np.testing.assert_array_equal(np.asarray(r1.samples), np.asarray(r2.samples))


def test_run_with_checkpointing_resumes(tmp_path):
    from gpar_at_scale_tpu.utils.resilience import run_with_checkpointing

    d = str(tmp_path / "ck")

    def step_fn(state, step):
        return {"x": state["x"] + 1.0}

    init = {"x": jnp.asarray(0.0)}
    # first run: interrupted after 7 steps (checkpoint every 3 -> last at 6)
    state, ran = run_with_checkpointing(step_fn, init, 7, d, checkpoint_every=3)
    assert float(state["x"]) == 7.0
    # "crash" and resume to 12: should restart from step 7 (final ckpt)
    state2, ran2 = run_with_checkpointing(step_fn, init, 12, d, checkpoint_every=3)
    assert float(state2["x"]) == 12.0
    assert ran2 == 5  # only the remaining steps were executed
