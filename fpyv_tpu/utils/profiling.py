"""Profiling: micro-bench timing, throughput meters, XLA profiler traces.

The reference's only profiling tool is a timeit decorator printing
mean ± std over n runs (tests/speed_test.py:4-14). That survives here as
:func:`timeit` (returning, not just printing), joined by a steps/s
throughput meter and a thin ``jax.profiler`` trace context for real device
profiles (SURVEY.md §5 tracing requirement).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple

import numpy as np


def timeit(func: Callable, n: int = 100, block: bool = True):
    """mean ± std seconds over n calls (tests/speed_test.py:4-14, returning
    the stats). ``block=True`` calls jax.block_until_ready on the result so
    async dispatch doesn't fake the numbers."""

    def wrapper(*args, **kwargs):
        import jax

        times = np.zeros(n)
        out = None
        for i in range(n):
            start = time.perf_counter()
            out = func(*args, **kwargs)
            if block:
                jax.block_until_ready(out)
            times[i] = time.perf_counter() - start
        print(f"Average time: {times.mean()} ± {times.std()}")
        return out, (times.mean(), times.std())

    return wrapper


@dataclass
class Throughput:
    """Running env-steps/s meter."""

    unit: str = "env-steps"
    _t0: float = field(default_factory=time.perf_counter)
    _count: float = 0.0

    def add(self, n: float) -> None:
        self._count += n

    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._count / dt if dt > 0 else 0.0

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._count = 0.0

    def report(self) -> str:
        return f"{self.rate():,.0f} {self.unit}/s"


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when log_dir is None."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_steps_per_second(step_fn: Callable, state, n_steps: int,
                             batch: int, warmup: bool = True) -> Tuple[float, object]:
    """Compile + time a scan'd step function; returns (steps/s, final state)."""
    import jax

    if warmup:
        state2 = step_fn(state)
        jax.block_until_ready(state2)
        state = state2
    t0 = time.perf_counter()
    state = step_fn(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return n_steps * batch / dt, state
