"""Tracing / profiling (SURVEY §5.1 — the reference only has wall timers;
we wire jax.profiler traces plus step timing).

Usage:
  with trace_if("/tmp/trace", enabled=opt.profile): ...
  timer = StepTimer(); timer.tic(); ...; dt = timer.toc()
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace_if(logdir: Optional[str], enabled: bool = True):
    """jax.profiler trace context, no-op when disabled."""
    if not enabled or not logdir:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """Named trace span for the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timer with EMA, mirroring the reference's
    data_time/batch_time metrics (models/netinterface.py:291-302)."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg = None
        self._t0 = None

    def tic(self):
        self._t0 = time.time()

    def toc(self) -> float:
        dt = time.time() - self._t0
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        return dt
