"""On-chip A/B: strip-shaped neighbor views vs full-block views.

The round-5 strips mechanism (cheb_pass._strip_halo + the strip BlockSpecs
in _build_pass_call) streams the two neighbor reads of each field as
(halo, nx) strips instead of full (br, nx) blocks whenever the halo divides
the block height — cutting field traffic from 3 to 1 + 2*halo/br streams
per field per pass, at the price of growing the halo to the nearest
qualifying divisor (12 -> 16 at br=160: +4% trapezoid redundancy).

Arms are INTERLEAVED (strips, full, strips, full, ...) so session drift
cancels; each row records the actual plan, the shape-cache state, and the
telemetry counters so a fallback can never masquerade as a kernel timing.
The "full" arm disables strips by patching _strip_halo to identity, which
restores the exact pre-strips plan (halo=12 at br=160).

Configs: the Gaussian headline (n_steps=11, single pass) and the taper
(n_steps=39, 3-pass — the HBM-bound config where non-first passes stream
3 fields and strips cut the most traffic), at the production width 3600
(lane-extended wx=3712) and the aligned 3584.

Run: python benchmarks/sweep_strips.py [--quick] [--chain N] [--reps N]
Writes benchmarks/sweep_strips.json.
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
    args = ap.parse_args()

    ny = 1200 if args.quick else 2400
    widths = [1800, 1792] if args.quick else [3600, 3584]
    n_chain = args.chain or (5 if args.quick else 200)
    rng = np.random.default_rng(42)
    G = gf.GridType
    grid = G.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED

    print(f"# device={jax.devices()[0].device_kind} ny={ny} f32", flush=True)

    planned = {}
    real_plan_passes = cp.plan_passes
    real_strip_halo = cp._strip_halo

    def spy(*a, **kw):
        plan = real_plan_passes(*a, **kw)
        planned["plan"] = plan
        return plan

    dp.plan_passes = spy

    shapes = [
        ("gaussian11", dict(filter_scale=10.0)),
        ("taper39", dict(filter_scale=10.0,
                         filter_shape=gf.FilterShape.TAPER)),
    ]
    out = []
    try:
        for nx in widths:
            x = jnp.asarray(rng.random((ny, nx)).astype(np.float32))
            gv = grid_vars_for(grid, ny, nx, rng)
            for sname, skw in shapes:
                # build both arms once, then interleave timed chains
                arms = {}
                for arm in ("strips", "full"):
                    # the kernel gate (br % halo == 0) can fire even under
                    # the pre-strips plan (taper: halo=16 either way), so
                    # the full arm must disable BOTH the planner's halo
                    # growth and the kernel-side strip views
                    cp._STRIPS = arm == "strips"
                    cp._strip_halo = (
                        real_strip_halo if arm == "strips"
                        else lambda br, halo, itemsize: halo)
                    planned.clear()
                    telemetry.reset_fallback_counts()
                    filt = gf.Filter(
                        filter_scale=10.0, dx_min=1.0, grid_type=grid,
                        grid_vars=gv, dtype=jnp.float32, use_pallas=True,
                        **{k: v for k, v in skw.items()
                           if k != "filter_scale"})
                    fn = filt._scalar_fn()
                    chain_time(fn, x, 1)  # compile under this arm's plan
                    arms[arm] = dict(
                        fn=fn, filt=filt, plan=planned.get("plan"),
                        fallbacks=dict(telemetry.fallback_counts()),
                        times=[])
                for _ in range(args.reps):
                    for arm in ("strips", "full"):
                        a = arms[arm]
                        a["times"].append(chain_time(a["fn"], x, n_chain))
                for arm in ("strips", "full"):
                    a = arms[arm]
                    filt, plan = a["filt"], a["plan"]
                    dt = min(a["times"])
                    entry = a["fn"].shape_cache.get((ny, nx, "float32"))
                    row = dict(
                        nx=nx, shape=sname, arm=arm,
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
        cp._strip_halo = real_strip_halo
        cp._STRIPS = True

    with open(os.path.join(os.path.dirname(__file__), "sweep_strips.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
