"""Tracing / profiling / structured metrics.

The reference has no observability beyond progress dots and per-epoch
stdout lines (SURVEY §5). TPU-native equivalents provided here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace;
* :class:`MetricsLogger` — append-only JSONL metrics stream
  (one object per event) for epochs/steps;
* :class:`StepTimer` — wall-clock steps/sec with warmup discard, the
  framework's north-star throughput metric;
* :func:`debug_nans` — context manager enabling JAX NaN checking (the
  functional-purity replacement for race detectors/sanitizers).
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Raise on the first NaN produced by any jitted computation."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class MetricsLogger:
    """Append-only JSONL event stream (one JSON object per line)."""

    def __init__(self, path: str | None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            # truncate: one file per run
            open(path, "w").close()

    def log(self, **event) -> None:
        if not self.path:
            return
        event.setdefault("time", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(event) + "\n")


class StepTimer:
    """Steps/sec over a sliding window, discarding warmup (compile)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._count = 0
        # warmup=0 has no warmup tick to start the clock on, so the
        # window starts at construction (the only reference point that
        # can time the FIRST step)
        self._t0 = time.perf_counter() if warmup == 0 else None
        self._timed_steps = 0

    def tick(self) -> None:
        # a tick marks the END of a step; the clock starts when the
        # warmup-th tick lands, and every later tick is a timed step
        self._count += 1
        if self._count == self.warmup:
            self._t0 = time.perf_counter()
        elif self._count > self.warmup:
            self._timed_steps += 1

    @property
    def steps_per_sec(self) -> float | None:
        if self._t0 is None or self._timed_steps == 0:
            return None
        return self._timed_steps / (time.perf_counter() - self._t0)
