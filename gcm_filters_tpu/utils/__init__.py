"""Small shared utilities."""

from .profiling import benchmark_fn

__all__ = ["benchmark_fn"]
