"""Observability subsystem smoke tests."""

import json
import time

import jax.numpy as jnp

from lycoris_tpu.observability import MetricLogger, StepTimer, log_compile_time


def test_step_timer():
    t = StepTimer(sync_every=2)
    x = jnp.ones(())
    for _ in range(8):
        time.sleep(0.01)
        t.step(x)
    assert t.steps_per_sec is not None
    assert 1 < t.steps_per_sec < 1000


def test_metric_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = MetricLogger(p, stdout_every=100)
    for i in range(5):
        m.log(i, loss=float(i) * 0.5, lr=1e-4)
    m.close()
    lines = [json.loads(l) for l in open(p)]
    assert len(lines) == 5
    assert lines[3]["loss"] == 1.5
    assert all("time" in l for l in lines)


def test_log_compile_time():
    import jax

    f = jax.jit(lambda x: x * 2)
    out, dt = log_compile_time(f, jnp.ones((4,)), label="double")
    assert dt >= 0 and float(out[0]) == 2.0
