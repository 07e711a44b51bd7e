"""Device profiling helpers.

TPU-native upgrade of the reference's per-iteration ``@elapsed`` timing
(``src/problem/solver_methods.jl:40-41``): host-side wall timers around
blocked device computations, plus a ``jax.profiler`` trace context for
kernel-level inspection in TensorBoard/XProf.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_blocked(fn: Callable, *args, reps: int = 10, warmup: int = 1,
                 **kwargs) -> float:
    """Median wall seconds of ``fn(*args)`` with ``block_until_ready``."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def phase_profile(phases: Dict[str, Callable], reps: int = 10) -> Dict[str, float]:
    """Time a dict of thunks; returns {name: median_seconds}."""
    return {name: time_blocked(fn, reps=reps) for name, fn in phases.items()}
