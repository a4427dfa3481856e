"""Per-config roofline model for the fused Pallas pass kernels.

Replaces the old ``eff_bw_gbps`` pseudo-metric (filter bytes / time, which
exceeded the chip's physical bandwidth once temporal blocking cut real
traffic) with an explicit two-ceiling model per benchmarked config:

  - **HBM bytes actually moved** per apply, from the pass plan: blocked
    field views stream 3x per field per pass (one BlockSpec view each for
    own/prev/next rows), outputs 1x each, and every extended-layout
    coefficient array streams (win/br)*(wx/nx) field-equivalents per pass
    (trapezoid row redundancy times the lane-alignment extension).
  - **VPU ops** per apply: an explicit per-cell-per-step op count (neighbor
    materializations, coefficient FMAs, recurrence updates, mask/NaN
    scrubs), inflated by the same (win/br)*(wx/nx) trapezoid redundancy.

Speed-of-light constants (TPU v5e, one chip):

  - HBM: 819 GB/s (public spec).
  - VPU f32: ~3.85e12 ops/s, derived as 8 sublanes x 128 lanes x 4 ALUs
    x ~0.94 GHz (the scaling-book VPU model). This is an ISSUE-RATE
    ceiling: it counts an FMA, an add, a select, and a lane-shuffle as one
    op each, so real kernels with shuffle-heavy bodies peak below it.

The model yields, per row: ``hbm_mb`` (bytes moved), ``pct_hbm`` (achieved
vs 819 GB/s), ``vpu_gops``, ``pct_vpu`` (achieved vs 3.85e12), ``gps_sol``
(the throughput the VPU ceiling alone would allow for this config), and
``bound`` (which ceiling is closer). The recorded evidence for "the scalar
pass is VPU-bound" is the pair (pct_hbm ~ 30-40%, pct_vpu ~ 55-65%) at the
headline config — the HBM ceiling is twice as far away as the VPU one.
"""
from __future__ import annotations

import dataclasses

import numpy as np

HBM_SOL_GBPS = 819.0  # TPU v5e public spec
VPU_SOL_OPS = 8 * 128 * 4 * 0.94e9  # sublanes x lanes x ALUs x clock ~ 3.85e12


def _scalar_plan_inputs(filt):
    """Mirror dispatch.make_pallas_scalar_apply's planning inputs."""
    from gcm_filters_tpu.ops.pallas.cheb_pass import _coef_arrays
    from gcm_filters_tpu.ops.stencil import hspace_drop_pre

    stencil = filt.operator
    drop_pre = hspace_drop_pre(stencil) and not getattr(filt, "exact_nan", False)
    hot = (dataclasses.replace(stencil, pre=None, zap_nans=False)
           if drop_pre else stencil)
    n_coef = (len(_coef_arrays(hot)) + int(hot.area is not None)
              + int(hot.pre is not None))
    return hot, n_coef, hot.post is not None, drop_pre


def scalar_model(filt, ny, nx, dt, itemsize=4):
    """Roofline dict for one scalar Pallas config, or None on the XLA path."""
    from gcm_filters_tpu.ops.pallas.cheb_pass import (
        _ext_geometry,
        plan_passes,
    )

    hot, n_coef, has_post, drop_pre = _scalar_plan_inputs(filt)
    wx_budget = _ext_geometry(nx, 16)[0]
    plan = plan_passes(ny, wx_budget, filt.n_steps, n_coef, has_post, itemsize)
    if plan is None:
        return None
    br, halo = plan.br, plan.halo
    wx, _ = _ext_geometry(nx, halo)
    red = (br + 2 * halo) / br * (wx / nx)  # trapezoid x lane-ext redundancy
    fb = ny * nx * itemsize  # one field stream, bytes
    n_ext = n_coef + int(has_post)

    # Field view streams per field per pass: 3 full blocks (own/prev/next),
    # or 1 + 2*halo/br once the strip-shaped neighbor views engage
    # (round 5, cheb_pass._STRIPS: halo divides br and is sublane-aligned).
    from gcm_filters_tpu.ops.pallas.cheb_pass import _STRIPS, _sublane_tile

    strips = (_STRIPS and br % halo == 0
              and halo % _sublane_tile(itemsize) == 0)
    s = (1 + 2 * halo / br) if strips else 3

    # HBM bytes per apply (see module docstring for the stream accounting).
    n_pass = len(plan.steps)
    if n_pass == 1:
        hbm = fb * (s + 1) + n_ext * fb * red
    else:
        hbm = (fb * (s + 3) + n_ext * fb * red)          # first pass
        hbm += (n_pass - 2) * (fb * (2 * s + 1 + 3) + n_ext * fb * red)
        last_extra = 1 if (drop_pre and hot.area is not None) else 0
        hbm += fb * (2 * s + 1 + last_extra + 1) + n_ext * fb * red  # last

    # VPU ops per cell per step: 4 neighbor materializations (2 sublane
    # concats + 2 lane rolls), 5 coefficient FMAs, post multiply, optional
    # pre/zap scrub, 2 recurrence ops, 1 accumulate FMA.
    ops_cell = 4 + 5 + int(has_post) + int(hot.pre is not None or hot.zap_nans) + 3
    ops = filt.n_steps * red * ny * nx * ops_cell

    return _finish(hbm, ops, ny * nx * filt.n_steps, dt)


def vector_model(filt, ny, nx, dt, itemsize=4):
    """Roofline dict for one coupled vector Pallas config."""
    from gcm_filters_tpu.ops.pallas.cheb_pass import _ext_geometry
    from gcm_filters_tpu.ops.pallas.vec_pass import (
        plan_ctap_passes,
        plan_vec_passes,
    )
    from gcm_filters_tpu.ops.stencil import CGridVectorOperator

    is_ctap = isinstance(filt.operator, CGridVectorOperator)
    planner = plan_ctap_passes if is_ctap else plan_vec_passes
    plan = planner(ny, nx, filt.n_steps, itemsize)
    if plan is None:
        return None
    br, halo = plan.br, plan.halo
    wx, _ = _ext_geometry(nx, halo)
    red = (br + 2 * halo) / br * (wx / nx)
    fb = 2 * ny * nx * itemsize  # the stacked (u, v) pair, bytes
    n_ext = 18 if is_ctap else 10

    n_pass = len(plan.steps)
    coef_bytes = n_ext * (ny * nx * itemsize) * red
    if n_pass == 1:
        hbm = fb * (3 + 1) + coef_bytes
    else:
        hbm = fb * (3 + 3) + coef_bytes
        hbm += (n_pass - 2) * (fb * (7 + 3) + coef_bytes)
        hbm += fb * (7 + 1) + coef_bytes

    # Ops per PAIR-cell per step: 4 neighbor shifts of the 2-plane window
    # (8), NaN scrub of 2 planes (2), recurrence+accumulate on 2 planes (6),
    # plus the contraction: C-grid = 18 tap FMAs + 2 diagonal sublane
    # shifts (round 5: sublane shifts of the lane-rolled planes, ~11%
    # faster on chip than the old diagonal lane-rolls but the same count
    # in this issue-rate model); B-grid = diffusion 5x2 + mixing 5x2 FMAs
    # + the u<->v stack swap (~2).
    ops_pair = (8 + 2 + 6) + (18 + 2 if is_ctap else 10 + 10 + 2)
    ops = filt.n_steps * red * ny * nx * ops_pair

    return _finish(hbm, ops, 2 * ny * nx * filt.n_steps, dt)


def _finish(hbm_bytes, vpu_ops, work_gps, dt):
    t_hbm = hbm_bytes / (HBM_SOL_GBPS * 1e9)
    t_vpu = vpu_ops / VPU_SOL_OPS
    return {
        "hbm_mb": round(hbm_bytes / 2**20, 1),
        "pct_hbm": round(100 * t_hbm / dt, 1),
        "vpu_gops": round(vpu_ops / 1e9, 2),
        "pct_vpu": round(100 * t_vpu / dt, 1),
        "gps_sol": round(work_gps / max(t_hbm, t_vpu) / 1e9, 1),
        "bound": "vpu" if t_vpu >= t_hbm else "hbm",
    }
