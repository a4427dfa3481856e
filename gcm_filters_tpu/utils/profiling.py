"""Benchmark/profiling helpers (the reference has none; BASELINE.md asks for
grid-point-steps/s and roofline accounting)."""
from __future__ import annotations

import time
from typing import Callable, Tuple

import jax


def benchmark_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10) -> Tuple[float, object]:
    """Wall-time a jitted function, returning (seconds_per_call, last_result).

    Blocks on device completion; first calls are warmup (compile + cache).
    """
    result = None
    for _ in range(warmup):
        result = fn(*args)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args)
    jax.block_until_ready(result)
    dt = (time.perf_counter() - t0) / iters
    return dt, result
