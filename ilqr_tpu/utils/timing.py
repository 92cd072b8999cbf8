"""Timing/benchmark discipline: JIT warm-up then wall-clock measurement.

Formalizes the reference's measurement protocol — explicit warm-up of every
jitted pass on representative arrays with `block_until_ready` before timing
(`/root/reference/python/run_iLQR_open_loop.py:74-108`), plus MPC per-step
averaging (`run_iLQR_MPC.py:145-148`) — and adds `jax.profiler` trace capture
(SURVEY.md §5 "Tracing / profiling").
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple

import jax


def warmup(fn: Callable, *args, **kwargs) -> Any:
    """Trigger compilation and wait for it (the reference's warm-up block)."""
    out = fn(*args, **kwargs)
    return jax.block_until_ready(out)


def timed(fn: Callable, *args, reps: int = 10, warmup_reps: int = 2, **kwargs
          ) -> Tuple[float, Any]:
    """Average wall-clock seconds per call after warm-up. Returns (sec, out)."""
    out = None
    for _ in range(warmup_reps):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def compile_time(fn: Callable, *args, **kwargs) -> float:
    """Seconds spent tracing+compiling (first call minus steady-state call)."""
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args, **kwargs))
    first = time.perf_counter() - t0
    steady, _ = timed(fn, *args, reps=3, warmup_reps=1, **kwargs)
    return max(first - steady, 0.0)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
