"""Fused Pallas TPU kernels for the Chebyshev filter hot loop.

Kernel families:
  - cheb_pass.py: temporally blocked scalar pass (S steps per HBM sweep);
    the workhorse. Also provides the runtime-coefficient variant used as the
    per-shard local compute of the shard_map engine.
  - vec_pass.py: coupled vector passes — B-grid (diffusion/mixing pair)
    and C-grid (tap-expanded 9-point, see ops/ctaps.py).

``make_pallas_scalar_apply`` / ``make_pallas_vector_apply`` return None when
the grid/shape combination is not supported by a fused kernel; callers fall
back to the XLA path.
"""
from __future__ import annotations


def make_pallas_scalar_apply(stencil, spec, exact_nan=False):
    try:
        from .dispatch import make_pallas_scalar_apply as _impl
    except ImportError:
        return None
    return _impl(stencil, spec, exact_nan=exact_nan)


def make_pallas_vector_apply(operator, spec):
    try:
        from .dispatch import make_pallas_vector_apply as _impl
    except ImportError:
        return None
    return _impl(operator, spec)
