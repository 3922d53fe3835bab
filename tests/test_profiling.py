"""Profiling utilities: trace context writes a profile dir, StepTimer logs
JSONL and synchronizes through device values."""
import json
import os

import jax.numpy as jnp

from qnx.utils.metrics import MetricsLogger
from qnx.utils.profiling import StepTimer, annotate, trace


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        with annotate("unit-test-span"):
            y = jnp.ones((8, 8)) @ jnp.ones((8, 8))
            y.block_until_ready()
    # jax.profiler.trace writes plugins/profile/<ts>/*
    found = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert found, "no profile artifacts written"


def test_step_timer_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    logger = MetricsLogger(path)
    timer = StepTimer(logger, name="train_step")
    for i in range(3):
        timer.start()
        y = jnp.ones((4,)) * i
        timer.stop(sync=y, batch=i)
    logger.close()
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) == 3
    assert all(r["event"] == "train_step" and r["seconds"] >= 0 for r in rows)
    s = timer.summary()
    assert s["steps"] == 3 and s["p99_s"] >= s["p50_s"]


def test_step_context_manager():
    timer = StepTimer()
    with timer.step(tag="x"):
        jnp.zeros((2,))
    assert timer.summary()["steps"] == 1
