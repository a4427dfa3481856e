"""Benchmark/profiling helpers (the reference has none; BASELINE.md asks for
grid-point-steps/s and roofline accounting)."""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gcm_filters_tpu_trace"):
    """Capture a jax.profiler trace of the enclosed block.

    View with TensorBoard (`tensorboard --logdir <dir>`) or Perfetto. The
    reference's only profiling story is %time cells in a notebook
    (reference docs/gpu.ipynb); this hooks the real XLA/TPU profiler.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def roofline(
    seconds_per_call: float,
    bytes_moved: int,
    hbm_gbps: float = 819.0,  # TPU v5e; pass the target chip's bandwidth
) -> float:
    """Fraction of the HBM bandwidth roofline achieved by a memory-bound op."""
    return (bytes_moved / seconds_per_call) / (hbm_gbps * 1e9)


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
