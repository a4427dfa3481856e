"""On-chip A/B: packed vs separate extended streams, SCALAR pass kernels.

Scalar counterpart of benchmarks/sweep_vecpack.py (cheb_pass._PACK_COEF):
the coefficient-heavy scalar grids (IRREGULAR/MOM5/POP: 5 coefficient
arrays + area) stream 6-7 extended windows per block; packing stacks them
into one (nb, n_ext, win, wx) array — one fully HBM-contiguous copy per
block. The headline tripolar grid streams only 2 (area + wet post), so
the expected effect there is small.

Arms are INTERLEAVED; every row records the actual plan, the shape-cache
state, and the telemetry counters.

Run: python benchmarks/sweep_pack.py [--quick] [--chain N] [--reps N]
Writes benchmarks/sweep_pack.json.
"""
import argparse
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gcm_filters_tpu as gf
import gcm_filters_tpu.ops.pallas.cheb_pass as cp
import gcm_filters_tpu.ops.pallas.dispatch as dp
from gcm_filters_tpu.utils import telemetry
from bench_suite import chain_time, grid_vars_for


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--chain", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--heavy-br", action="store_true",
                    help="sweep block heights for the 5-coefficient grid "
                         "under packed streams (re-tests the round-2 "
                         "heavy-coefficient br cap)")
    args = ap.parse_args()

    ny = 1200 if args.quick else 2400
    nx = 1800 if args.quick else 3600
    n_chain = args.chain or (5 if args.quick else 200)
    rng = np.random.default_rng(42)
    G = gf.GridType

    print(f"# device={jax.devices()[0].device_kind} {ny}x{nx} f32", flush=True)

    planned = {}
    real_plan_passes = cp.plan_passes

    def spy(*a, **kw):
        plan = real_plan_passes(*a, **kw)
        planned["plan"] = plan
        return plan

    dp.plan_passes = spy

    x = jnp.asarray(rng.random((ny, nx)).astype(np.float32))
    out = []
    if args.heavy_br:
        # br sweep for IRREGULAR (7 ext streams) with packing ON: does one
        # contiguous coefficient copy per block relieve the pipelining
        # degradation behind the 64-row heavy cap?
        grid = G.IRREGULAR_WITH_LAND
        gv = grid_vars_for(grid, ny, nx, rng)
        try:
            for tgt in ([48, 96] if args.quick else [48, 80, 96, 120, 160]):
                cp._BR_CAP_HEAVY = max(64, tgt)
                cp._BR_TARGET_SCALAR = tgt
                planned.clear()
                telemetry.reset_fallback_counts()
                filt = gf.Filter(filter_scale=10.0, dx_min=1.0,
                                 grid_type=grid, grid_vars=gv,
                                 dtype=jnp.float32, use_pallas=True)
                fn = filt._scalar_fn()
                dt = min(chain_time(fn, x, n_chain)
                         for _ in range(args.reps))
                plan = planned.get("plan")
                entry = fn.shape_cache.get((ny, nx, "float32"))
                row = dict(
                    grid=grid.name, arm="packed", br_target=tgt,
                    plan_br=getattr(plan, "br", None),
                    plan_halo=getattr(plan, "halo", None),
                    plan_steps=list(getattr(plan, "steps", ()) or ()),
                    n_steps=filt.n_steps, ms=round(dt * 1e3, 3),
                    gps=round(ny * nx * filt.n_steps / dt / 1e9, 2),
                    kernel_executed=entry not in (None, "xla"),
                    fallbacks=dict(telemetry.fallback_counts()),
                )
                out.append(row)
                print(json.dumps(row), flush=True)
        finally:
            dp.plan_passes = real_plan_passes
            cp._BR_CAP_HEAVY = 64
            cp._BR_TARGET_SCALAR = 160
            cp._PACK_COEF = True
        with open(os.path.join(os.path.dirname(__file__),
                               "sweep_pack_heavy.json"), "w") as f:
            json.dump(out, f, indent=1)
        return

    grids = [G.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
             G.IRREGULAR_WITH_LAND, G.TRIPOLAR_POP_WITH_LAND]
    try:
        for grid in grids:
            gv = grid_vars_for(grid, ny, nx, rng)
            arms = {}
            for arm in ("packed", "separate"):
                cp._PACK_COEF = arm == "packed"
                planned.clear()
                telemetry.reset_fallback_counts()
                filt = gf.Filter(filter_scale=10.0, dx_min=1.0,
                                 grid_type=grid, grid_vars=gv,
                                 dtype=jnp.float32, use_pallas=True)
                fn = filt._scalar_fn()
                chain_time(fn, x, 1)  # compile under this arm
                arms[arm] = dict(
                    fn=fn, filt=filt, plan=planned.get("plan"),
                    fallbacks=dict(telemetry.fallback_counts()), times=[])
            for _ in range(args.reps):
                for arm in ("packed", "separate"):
                    a = arms[arm]
                    a["times"].append(chain_time(a["fn"], x, n_chain))
            for arm in ("packed", "separate"):
                a = arms[arm]
                filt, plan = a["filt"], a["plan"]
                dt = min(a["times"])
                entry = a["fn"].shape_cache.get((ny, nx, "float32"))
                row = dict(
                    grid=grid.name, arm=arm,
                    plan_br=getattr(plan, "br", None),
                    plan_halo=getattr(plan, "halo", None),
                    plan_steps=list(getattr(plan, "steps", ()) or ()),
                    n_steps=filt.n_steps,
                    ms=round(dt * 1e3, 3),
                    ms_all=[round(t * 1e3, 3) for t in a["times"]],
                    gps=round(ny * nx * filt.n_steps / dt / 1e9, 2),
                    kernel_executed=entry not in (None, "xla"),
                    fallbacks=a["fallbacks"],
                )
                out.append(row)
                print(json.dumps(row), flush=True)
    finally:
        dp.plan_passes = real_plan_passes
        cp._PACK_COEF = True

    with open(os.path.join(os.path.dirname(__file__), "sweep_pack.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
