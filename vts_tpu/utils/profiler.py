"""Tracing / profiling hooks.

Replaces the reference's manual ``timing=`` wall-clock prints +
``torch.cuda.synchronize()`` brackets (reference train.py:37-66,
sinskitG_model.py:609-700) with:

  * ``StepTimer`` — per-phase timing with explicit device sync
    (``block_until_ready``), EMA smoothing like the vendored
    training_stats collector;
  * ``trace(logdir)`` — a context manager around ``jax.profiler`` producing
    TensorBoard-loadable traces of the fused step.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.means: Dict[str, float] = {}
        self._start: Dict[str, float] = {}

    def start(self, name: str) -> None:
        self._start[name] = time.perf_counter()

    def stop(self, name: str, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._start.pop(name)
        prev = self.means.get(name)
        self.means[name] = dt if prev is None else self.ema * prev + (1 - self.ema) * dt
        return dt

    @contextlib.contextmanager
    def section(self, name: str, sync_on=None):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name, sync_on)

    def report(self) -> str:
        return " ".join(f"{k}:{v * 1000:.1f}ms" for k, v in sorted(self.means.items()))


@contextlib.contextmanager
def trace(logdir: str = "/tmp/vts_trace"):
    """Capture a jax.profiler trace of the enclosed steps."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
