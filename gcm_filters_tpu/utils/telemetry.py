"""Fallback telemetry: make silent performance degradation visible.

The fused Pallas kernels are planned against a VMEM cost *model*; when a
planned kernel fails to compile on the actual chip, the dispatchers pin that
shape to the ~10x slower XLA path. That is the correct behavior (results stay
exact), but a user should never lose an order of magnitude silently — so
every permanent pin emits a :class:`PerformanceWarning` once and bumps a
process-wide counter that benchmarks and tests can read
(:func:`fallback_counts`; bench.py reports it alongside throughput).
"""
from __future__ import annotations

import collections
import threading
import warnings

__all__ = [
    "PerformanceWarning",
    "record_fallback",
    "fallback_counts",
    "reset_fallback_counts",
]


class PerformanceWarning(UserWarning):
    """The computation stays correct but runs on a slower path."""


_lock = threading.Lock()
_counters: collections.Counter = collections.Counter()


def record_fallback(kind: str, detail: str) -> None:
    """Count a fallback event and warn the user about it.

    ``kind`` is a stable counter key (e.g. ``pallas_compile_fallback``);
    ``detail`` names the shape/dtype/path so the warning is actionable.
    """
    with _lock:
        _counters[kind] += 1
    warnings.warn(
        f"{kind}: {detail}. Results are unaffected, but this configuration "
        f"now runs on a slower execution path. "
        f"(gcm_filters_tpu.utils.telemetry.fallback_counts() tracks these.)",
        PerformanceWarning,
        stacklevel=3,
    )


def fallback_counts() -> dict:
    """A snapshot of all fallback counters (empty dict = no fallbacks)."""
    with _lock:
        return dict(_counters)


def reset_fallback_counts() -> None:
    with _lock:
        _counters.clear()
