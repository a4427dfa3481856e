"""On-chip measurement of the experimental bf16 kernel streams.

VERDICT r2 item #9: bf16 was summarily promoted to f32 on the claim of "no
VPU throughput win" without data. The counter-hypothesis: the multi-pass
taper and the 5-coefficient grids are stream-dominated by the repo's own
cost model, where halving HBM traffic is a potential ~2x. This sweep
measures exactly that — the same configs at f32 vs native-bf16 streams
(dispatch._NARROW_BF16 opt-in) — and also records the accuracy cost
(max relative deviation from the f32 result), so the default can be decided
from numbers rather than assertion.

Run: python benchmarks/sweep_bf16.py [--quick]
Appends results to benchmarks/sweep_bf16.json.
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
import gcm_filters_tpu.ops.pallas.dispatch as dp
from bench_suite import chain_time, grid_vars_for


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--chain", type=int, default=None)
    # bf16 windows need 16-row sublane tiles; at the unaligned production
    # width the kernels may not compile at all (pinned to XLA, marked by
    # bf16_routed_to_xla) — the lane-aligned 3584 row answers whether bf16
    # streams help where the kernels exist
    ap.add_argument("--nx", type=int, default=None)
    args = ap.parse_args()

    dp._NARROW_BF16 = True  # opt-in: bf16 requests run the fused kernels
    ny, nx = (1200, 1800) if args.quick else (2400, 3600)
    if args.nx:
        nx = args.nx
    n_chain = args.chain or (5 if args.quick else 200)
    rng = np.random.default_rng(42)
    data = rng.random((ny, nx)).astype(np.float32)
    G = gf.GridType

    print(f"# device={jax.devices()[0].device_kind} domain={ny}x{nx}",
          flush=True)

    cfgs = [
        ("taper", G.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
         dict(filter_shape=gf.FilterShape.TAPER)),
        ("irregular", G.IRREGULAR_WITH_LAND, {}),
        ("headline", G.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED, {}),
    ]
    vec_cfgs = [G.VECTOR_C_GRID, G.VECTOR_B_GRID]
    out = []
    for name, grid, kw in cfgs:
        gv = grid_vars_for(grid, ny, nx, rng)
        filt = gf.Filter(filter_scale=10.0, dx_min=1.0, grid_type=grid,
                         grid_vars=gv, dtype=jnp.float32, use_pallas=True,
                         **kw)
        fn = filt._scalar_fn()
        x32 = jnp.asarray(data)
        x16 = jnp.asarray(data, dtype=jnp.bfloat16)
        row = dict(config=name, ny=ny, nx=nx, n_steps=filt.n_steps)
        # accuracy first (also warms both compiled artifacts)
        y32 = np.asarray(fn(x32), dtype=np.float64)
        y16 = np.asarray(fn(x16), dtype=np.float64)
        fin = np.isfinite(y32)
        scale = float(np.max(np.abs(y32[fin]))) or 1.0
        row["bf16_rel_err"] = round(
            float(np.max(np.abs(y16[fin] - y32[fin]))) / scale, 5)
        # "xla" = compile-failure pin OR plan-ineligible rerouting — either
        # way ms_bf16 would time the XLA engine, not the bf16 kernels
        row["bf16_routed_to_xla"] = (
            fn.shape_cache.get((ny, nx, "bfloat16")) == "xla")
        for dt_name, x in (("f32", x32), ("bf16", x16)):
            dt = chain_time(fn, x, n_chain)
            row[f"ms_{dt_name}"] = round(dt * 1e3, 3)
            row[f"gps_{dt_name}"] = round(ny * nx * filt.n_steps / dt / 1e9, 2)
        row["speedup"] = round(row["ms_f32"] / row["ms_bf16"], 3)
        out.append(row)
        print(json.dumps(row), flush=True)

    # coupled vector kernels: the C-grid's 18 coefficient streams make it
    # the most stream-bound config in the repo — the prime bf16 candidate
    from bench_suite import chain_time_vec

    for grid in vec_cfgs:
        gv = grid_vars_for(grid, ny, nx, rng)
        filt = gf.Filter(filter_scale=10.0, dx_min=1.0, grid_type=grid,
                         grid_vars=gv, dtype=jnp.float32, use_pallas=True)
        fn = filt._vector_fn()
        u32 = jnp.asarray(data)
        v32 = jnp.asarray(rng.random((ny, nx)).astype(np.float32))
        u16, v16 = (jnp.asarray(a, jnp.bfloat16) for a in (u32, v32))
        row = dict(config=grid.name, ny=ny, nx=nx, n_steps=filt.n_steps)
        yu32, yv32 = (np.asarray(a, dtype=np.float64) for a in fn(u32, v32))
        yu16, yv16 = (np.asarray(a, dtype=np.float64) for a in fn(u16, v16))
        scale = max(float(np.max(np.abs(yu32))),
                    float(np.max(np.abs(yv32)))) or 1.0
        row["bf16_rel_err"] = round(
            max(float(np.max(np.abs(yu16 - yu32))),
                float(np.max(np.abs(yv16 - yv32)))) / scale, 5)
        # the vector dispatcher returns None (no build) for plan-ineligible
        # shapes and pins "xla" on compile failure — both mean the bf16
        # timing below would measure the XLA engine
        row["bf16_routed_to_xla"] = (
            fn.shape_cache.get((ny, nx, "bfloat16")) in (None, "xla"))
        for dt_name, (a, b) in (("f32", (u32, v32)), ("bf16", (u16, v16))):
            dt = chain_time_vec(fn, a, b, n_chain)
            row[f"ms_{dt_name}"] = round(dt * 1e3, 3)
            row[f"gps_{dt_name}"] = round(
                2 * ny * nx * filt.n_steps / dt / 1e9, 2)
        row["speedup"] = round(row["ms_f32"] / row["ms_bf16"], 3)
        out.append(row)
        print(json.dumps(row), flush=True)

    # merge by (config, domain): widths are swept in separate runs
    path = os.path.join(os.path.dirname(__file__), "sweep_bf16.json")
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        fresh = {(r["config"], r.get("ny"), r.get("nx")) for r in out}
        out = [r for r in prior
               if (r["config"], r.get("ny"), r.get("nx")) not in fresh] + out
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
