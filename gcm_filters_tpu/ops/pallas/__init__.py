"""Fused Pallas TPU kernels for the Chebyshev filter hot loop.

Two regimes (see cheb_step.py / resident.py):
  - resident: the whole field (and recurrence state) fits in VMEM — run every
    Chebyshev step inside a single pallas_call (1 HBM read + 1 write total).
  - streaming: per-step fused kernel pipelined over row blocks.

``make_pallas_scalar_apply`` returns None when the grid/shape combination is
not yet supported by a fused kernel; callers fall back to the XLA path.
"""
from __future__ import annotations


def make_pallas_scalar_apply(stencil, spec):
    try:
        from .dispatch import make_pallas_scalar_apply as _impl
    except ImportError:
        return None
    return _impl(stencil, spec)
