"""Planner pins for the benchmarked production configs.

benchmarks/results.json's on-chip records are tied to SPECIFIC compiled
kernel configurations (block height, halo, pass split) chosen by the pure-
Python planners. A planner edit that silently shifts these — a changed
default, a new alignment rule, a budget tweak — would invalidate every
recorded number without failing any correctness test. These pins encode
the measured-good configs at the headline 2400x3600 f32 workload; if a
planner change trips them, either fix the regression or re-benchmark on
chip and update both results.json and this file.
"""
import numpy as np

from gcm_filters_tpu.ops.pallas.cheb_pass import (
    PassPlan,
    _ext_geometry,
    plan_passes,
)
from gcm_filters_tpu.ops.pallas.vec_pass import (
    plan_ctap_passes,
    plan_vec_passes,
)


def test_production_plan_pins():
    # lane-aligned compute width of the 3600-col domain: round 4's offset-0
    # tail-wrap layout shrinks it from 3840 to roundup(3600 + 2*16) = 3712
    # (3.4% less VPU work; on-chip A/Bs in _ext_geometry's docstring)
    wx = _ext_geometry(3600, 16)[0]
    assert wx == 3712

    # headline scalar (tripolar land+area, h-space: area ext + post stream):
    # single whole-recurrence pass at the round-5 measured br=160 sweet
    # spot (133.6 G at the production width vs 104 at the old br=48;
    # benchmarks/sweep_br.json — br=240 is past the cliff at 91 G)
    # halo 16 (not 12): _strip_halo grows the halo to a divisor of br so
    # the neighbor views stream as (halo, nx) strips — field traffic
    # 3 -> 1.2 streams at +4% trapezoid redundancy (round 5)
    assert plan_passes(2400, wx, 11, 1, True, 4) == PassPlan(
        br=160, halo=16, steps=(11,))
    # 5-coefficient grids (IRREGULAR/MOM5/POP): packed coefficient streams
    # (round 5) removed the heavy-coefficient pipelining cliff, so these
    # now plan at the common br=160 sweet spot too (on-chip sweep
    # benchmarks/sweep_pack_heavy.json: 104.2 G at br=160 vs 89.7 at the
    # old br=48 cap, monotone-improving, kernel executed, no fallbacks)
    assert plan_passes(2400, wx, 11, 7, True, 4) == PassPlan(
        br=160, halo=16, steps=(11,))
    # Taper (n_steps=39): balanced 3-way split at the same br=160 ceiling
    # as single-pass (round 5: the old br=200 plan was the documented
    # Mosaic compile failure at wx=3712 f32, burning the replan retry on
    # every run; 160 compiles directly and matches the measured sweet spot)
    assert plan_passes(2400, wx, 39, 1, True, 4) == PassPlan(
        br=160, halo=16, steps=(13, 13, 13))
    # coupled vector kernels: measured sweet spots br=32 (C) / br=40 (B)
    assert plan_ctap_passes(2400, 3600, 11, 4) == PassPlan(
        br=32, halo=12, steps=(11,))
    assert plan_vec_passes(2400, 3600, 11, 4) == PassPlan(
        br=40, halo=12, steps=(11,))


def test_dispatch_derives_the_pinned_headline_plan():
    """End-to-end: the dispatcher's own planning inputs for the headline
    Filter yield the pinned single-pass br=48 artifact."""
    import jax.numpy as jnp

    from gcm_filters_tpu import Filter, GridType
    from gcm_filters_tpu.ops.pallas.cheb_pass import _coef_arrays
    from gcm_filters_tpu.ops.stencil import hspace_drop_pre

    ny, nx = 2400, 3600
    rng = np.random.default_rng(42)
    wet = np.ones((ny, nx)); wet[0, :] = 0
    filt = Filter(
        filter_scale=10.0, dx_min=1.0,
        grid_type=GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
        grid_vars={"area": 0.9 + 0.2 * rng.random((ny, nx)),
                   "wet_mask": wet},
        dtype=jnp.float32,
    )
    st = filt.operator
    assert hspace_drop_pre(st)
    import dataclasses

    hot = dataclasses.replace(st, pre=None, zap_nans=False)
    n_coef = (len(_coef_arrays(hot)) + int(hot.area is not None)
              + int(hot.pre is not None))
    plan = plan_passes(ny, _ext_geometry(nx, 16)[0], filt.n_steps, n_coef,
                       hot.post is not None, 4)
    assert plan == PassPlan(br=160, halo=16, steps=(11,))
