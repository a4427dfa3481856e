"""On-chip block-height (br) sweep for the scalar pass kernel.

The planner pins the scalar block height near _BR_TARGET_SCALAR=48 on the
strength of a round-2 measurement ("br=48 ~= br=96 within noise") that
predates the current offset-0 tail-wrap lane geometry and the XLA-side
lane extension. The trapezoid redundancy at br=48 with the headline's
halo=12 window is (48+24)/48 = 1.5x VPU work; br=240 would cut that to
1.1x. If the kernel is VPU-bound (the repo's roofline says it is), block
height is the single remaining single-chip lever on the headline — this
sweep re-derives the sweet spot under the current geometry on the real
chip, at BOTH the production width 3600 (lane-extended to wx=3712) and
the aligned 3584, so alignment and blocking effects separate cleanly.

Each row records the ACTUAL plan the dispatcher built (br/halo/steps, via
a planner wrapper) plus the telemetry fallback counters, so a replanned
or XLA-pinned row can never masquerade as a kernel timing (the
sweep_dma.py round-3 lesson).

Run: python benchmarks/sweep_br.py [--quick] [--chain N]
Writes benchmarks/sweep_br.json.
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
    args = ap.parse_args()

    ny = 1200 if args.quick else 2400
    widths = [1800, 1792] if args.quick else [3600, 3584]
    n_chain = args.chain or (5 if args.quick else 200)
    rng = np.random.default_rng(42)
    G = gf.GridType
    grid = G.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED

    print(f"# device={jax.devices()[0].device_kind} ny={ny} f32", flush=True)

    # record the plan the dispatcher actually builds for each row
    planned = {}
    real_plan_passes = cp.plan_passes

    def spy(*a, **kw):
        plan = real_plan_passes(*a, **kw)
        planned["plan"] = plan
        return plan

    dp.plan_passes = spy

    # br candidates must divide ny and be 8-multiples under the planner cap
    targets = [32, 48, 96] if args.quick else [32, 48, 80, 96, 120, 160, 240]
    out = []
    try:
        for nx in widths:
            x = jnp.asarray(rng.random((ny, nx)).astype(np.float32))
            gv = grid_vars_for(grid, ny, nx, rng)
            for tgt in targets:
                cp._BR_TARGET_SCALAR = tgt
                planned.clear()
                telemetry.reset_fallback_counts()
                filt = gf.Filter(filter_scale=10.0, dx_min=1.0,
                                 grid_type=grid, grid_vars=gv,
                                 dtype=jnp.float32, use_pallas=True)
                fn = filt._scalar_fn()
                dt = chain_time(fn, x, n_chain)
                plan = planned.get("plan")
                entry = fn.shape_cache.get((ny, nx, "float32"))
                row = dict(
                    nx=nx, br_target=tgt,
                    plan_br=getattr(plan, "br", None),
                    plan_halo=getattr(plan, "halo", None),
                    plan_steps=list(getattr(plan, "steps", ()) or ()),
                    n_steps=filt.n_steps,
                    ms=round(dt * 1e3, 3),
                    gps=round(ny * nx * filt.n_steps / dt / 1e9, 2),
                    kernel_executed=entry not in (None, "xla"),
                    fallbacks=telemetry.fallback_counts(),
                )
                out.append(row)
                print(json.dumps(row), flush=True)
    finally:
        dp.plan_passes = real_plan_passes
        cp._BR_TARGET_SCALAR = 48

    with open(os.path.join(os.path.dirname(__file__), "sweep_br.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
