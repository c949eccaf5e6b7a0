"""Profiling / observability helpers (SURVEY §5: the reference has nothing
beyond wall-clock prints around test suites, runtests.jl:10-18)."""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX profiler trace around a block — view in TensorBoard/Perfetto.

    Usage::
        with profiling.trace("/tmp/mpc-trace"):
            controller, sol = step(controller, x0)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(
    fn: Callable[[], Any],
    *,
    warmup: int = 2,
    reps: int = 20,
) -> Dict[str, float]:
    """Latency statistics for a jitted thunk (blocks on the result).

    Returns p50/p90/p99/mean in milliseconds — the latency surface
    BASELINE.md asks for (p50/p99 vs the real-time sample-time budget).
    """
    for _ in range(warmup):
        jax.block_until_ready(fn())
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        lat.append((time.perf_counter() - t0) * 1e3)
    a = np.asarray(lat)
    return {
        "p50_ms": float(np.percentile(a, 50)),
        "p90_ms": float(np.percentile(a, 90)),
        "p99_ms": float(np.percentile(a, 99)),
        "mean_ms": float(a.mean()),
        "reps": float(reps),
    }


def solve_rate(batch: int, stats: Dict[str, float]) -> float:
    """Solves/s implied by a batched-solve latency measurement."""
    return batch / (stats["mean_ms"] / 1e3)
