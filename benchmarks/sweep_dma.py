"""On-chip A/B sweep of the manual-DMA window path (_DMA_WINDOWS).

The flag-gated manual-DMA window path streams each field once from an
ANY(HBM) ref into double-buffered VMEM scratch (instead of three blocked
BlockSpec views per field) and prefetches block i+1 before block i's
compute. It also forces 8-row-aligned plan halos (taller trapezoids).
Whether that nets out faster is an empirical question per kernel family —
this sweep answers it on the real chip for the configs that matter:

  1. headline scalar (tripolar land+area, fac 10, n_steps 11)
  2. taper (n_steps ~39, multi-pass)
  3. IRREGULAR_WITH_LAND (5-coefficient stream-heavy scalar)
  4. VECTOR_C_GRID (18 tap streams)
  5. VECTOR_B_GRID (10 coefficient streams)

Run: python benchmarks/sweep_dma.py [--quick]
Appends one JSON line per (config, flag) pair; decide the default from the
deltas (run-to-run chip noise is ~±10%, so only >15% deltas are real).
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
from bench_suite import chain_time, chain_time_vec, grid_vars_for


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--chain", type=int, default=None)
    args = ap.parse_args()

    ny, nx = (1200, 1800) if args.quick else (2400, 3600)
    n_chain = args.chain or (5 if args.quick else 200)
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.random((ny, nx)).astype(np.float32))
    u = jnp.asarray(rng.random((ny, nx)).astype(np.float32))
    v = jnp.asarray(rng.random((ny, nx)).astype(np.float32))
    G = gf.GridType

    print(f"# device={jax.devices()[0].device_kind} domain={ny}x{nx} f32",
          flush=True)

    scalar_cfgs = [
        ("headline", G.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED, {}),
        ("taper", G.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
         dict(filter_shape=gf.FilterShape.TAPER)),
        ("irregular", G.IRREGULAR_WITH_LAND, {}),
    ]
    out = []
    for flag in (False, True):
        cp._DMA_WINDOWS = flag  # module-global: affects plans AND kernels
        for name, grid, kw in scalar_cfgs:
            gv = grid_vars_for(grid, ny, nx, rng)
            filt = gf.Filter(filter_scale=10.0, dx_min=1.0, grid_type=grid,
                             grid_vars=gv, dtype=jnp.float32,
                             use_pallas=True, **kw)
            dt = chain_time(filt._scalar_fn(), x, n_chain)
            row = dict(config=name, dma=flag, n_steps=filt.n_steps,
                       ms=round(dt * 1e3, 3),
                       gps=round(ny * nx * filt.n_steps / dt / 1e9, 2))
            out.append(row)
            print(json.dumps(row), flush=True)
        for grid in (G.VECTOR_C_GRID, G.VECTOR_B_GRID):
            gv = grid_vars_for(grid, ny, nx, rng)
            filt = gf.Filter(filter_scale=10.0, dx_min=1.0, grid_type=grid,
                             grid_vars=gv, dtype=jnp.float32, use_pallas=True)
            dt = chain_time_vec(filt._vector_fn(), u, v, n_chain)
            row = dict(config=grid.name, dma=flag, n_steps=filt.n_steps,
                       ms=round(dt * 1e3, 3),
                       gps=round(2 * ny * nx * filt.n_steps / dt / 1e9, 2))
            out.append(row)
            print(json.dumps(row), flush=True)

    with open(os.path.join(os.path.dirname(__file__), "sweep_dma.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
