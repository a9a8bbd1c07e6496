"""Tracing / profiling hooks (a subsystem absent from the reference,
SURVEY.md §5.1 — added as a first-class capability here).

  * ``trace(logdir)`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable XPlane trace (works on TPU and CPU backends);
  * ``StepTimer`` — lightweight wall-clock accumulator with EMA step time
    and simple throughput accounting (graphs/s, edges/s);
  * ``annotate(name)`` — ``jax.profiler.TraceAnnotation`` wrapper so host
    phases show up inside device traces.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class StepTimer:
    ema_decay: float = 0.9

    n_steps: int = 0
    total_s: float = 0.0
    ema_s: float | None = None
    total_items: float = 0.0
    _t0: float | None = field(default=None, repr=False)

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.n_steps += 1
        self.total_s += dt
        self.ema_s = dt if self.ema_s is None else self.ema_decay * self.ema_s + (1 - self.ema_decay) * dt
        return False

    def add_items(self, n: float):
        self.total_items += n

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.n_steps, 1)

    @property
    def items_per_s(self) -> float:
        return self.total_items / max(self.total_s, 1e-12)

    def summary(self) -> dict:
        return {
            "steps": self.n_steps,
            "mean_step_s": self.mean_s,
            "ema_step_s": self.ema_s,
            "items_per_s": self.items_per_s,
        }
