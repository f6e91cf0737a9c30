"""Profiling / timing utilities.

TPU-native counterpart of the reference's tic/toc wall-clocking around each
solve (``main.m:120,131``) and its mean/median/max report (``main.m:206-208``):
device-accurate timing via ``block_until_ready`` deltas, percentile summaries,
and an optional ``jax.profiler`` trace context for per-kernel inspection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np
import jax


def time_fn(fn: Callable, *args, warmup: int = 1, reps: int = 10):
    """Steady-state wall time of a compiled callable (seconds/rep)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def latency_stats(fn: Callable, *args, reps: int = 50):
    """Per-call latency distribution (mean/median/p99/max), mirroring the
    reference's CPU-time metrics block."""
    fn(*args)  # warm
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        samples.append(time.perf_counter() - t0)
    s = np.asarray(samples)
    return {
        "mean": float(s.mean()),
        "median": float(np.median(s)),
        "p99": float(np.percentile(s, 99)),
        "max": float(s.max()),
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """``jax.profiler`` trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
