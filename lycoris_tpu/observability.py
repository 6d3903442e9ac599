"""Tracing / profiling / metrics — a new TPU-native subsystem.

The reference has no tracing or profiling (SURVEY §5: the only timing data is
hand-collected in docs/Guidelines.md). Production TPU training needs:

- :class:`StepTimer`: wall-clock step timing with EMA + steps/sec, designed
  around async dispatch (blocks on the loss only when sampling).
- :func:`trace`: a context manager around ``jax.profiler`` writing TensorBoard
  traces (xplane) for a window of steps.
- :class:`MetricLogger`: tiny JSONL metrics sink (loss / lr / norms / step
  time) that host trainers or the bundled trainer can tail.
- :func:`log_compile_time`: measures the first-step compile.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import jax

from .logging import logger


class StepTimer:
    """EMA step timing that respects async dispatch."""

    def __init__(self, ema: float = 0.9, sync_every: int = 10):
        self.ema = ema
        self.sync_every = sync_every
        self._t = None
        self._avg = None
        self._steps = 0

    def step(self, result=None):
        """Call once per train step, passing any device array to block on
        every ``sync_every`` steps."""
        self._steps += 1
        if self._steps % self.sync_every:
            return self._avg
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        if self._t is not None:
            dt = (now - self._t) / self.sync_every
            self._avg = dt if self._avg is None else self.ema * self._avg + (1 - self.ema) * dt
        self._t = now
        return self._avg

    @property
    def steps_per_sec(self):
        return None if not self._avg else 1.0 / self._avg


@contextlib.contextmanager
def trace(logdir: str, with_host: bool = False):
    """Profile a window of steps into TensorBoard xplane traces."""
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {logdir}")


class MetricLogger:
    """Append-only JSONL metrics file + warn-once stdout mirror."""

    def __init__(self, path: str | None = None, stdout_every: int = 50):
        self.path = path
        self.stdout_every = stdout_every
        self._n = 0
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time(), **{k: _to_py(v) for k, v in metrics.items()}}
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        self._n += 1
        if self._n % self.stdout_every == 0:
            logger.info(" ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}" for k, v in rec.items()))

    def close(self):
        if self._f:
            self._f.close()


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


def log_compile_time(fn, *args, label: str = "step", **kwargs):
    """Run fn once, report (result, compile+first-run seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    logger.info(f"{label}: first call (compile + run) took {dt:.1f}s")
    return out, dt
