"""Decompose the headline apply at the production width 2400x3600.

Measured facts (rounds 3-5): the same single-pass kernel sustains
~142 G gps at the lane-aligned width 3584 but only ~103-108 G at the
production 3600, i.e. the apply carries ~0.2 ms/apply of fixed cost on
top of the pure kernel — and the taper config (39 steps amortizing that
cost over 3.5x more steps) sustains ~137 G at the SAME width. This
probe separates the candidates on chip:

  a) full apply at 3600           (extend + kernel at wx=3712 + truncate)
  b) full apply at 3584           (pure aligned kernel, br=48)
  c) full apply at 3712           (pure aligned kernel at the extended
                                   width — isolates Mosaic width quirks
                                   from the extension cost)
  d) lane_extend_jnp chain        (the XLA-side extension alone,
                                   3600 -> 3712 -> slice back)

If (a) - (c) ~= (d): the extension concat is the whole fixed cost and
the attack is making it cheaper (or unnecessary). If (a) - (c) >> (d):
something else in the unaligned path (truncating store, layout copy)
eats the rest.

Run: python benchmarks/probe_headline.py [--chain N]
Writes benchmarks/probe_headline.json.
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
from gcm_filters_tpu.ops.pallas.cheb_pass import lane_extend_jnp
from bench_suite import chain_time, grid_vars_for


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=200)
    args = ap.parse_args()
    ny = 2400
    rng = np.random.default_rng(42)
    G = gf.GridType
    grid = G.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED
    out = []

    print(f"# device={jax.devices()[0].device_kind}", flush=True)

    for nx in (3600, 3584, 3712):
        x = jnp.asarray(rng.random((ny, nx)).astype(np.float32))
        gv = grid_vars_for(grid, ny, nx, rng)
        filt = gf.Filter(filter_scale=10.0, dx_min=1.0, grid_type=grid,
                         grid_vars=gv, dtype=jnp.float32, use_pallas=True)
        fn = filt._scalar_fn()
        dt = chain_time(fn, x, args.chain)
        row = dict(probe=f"apply_{nx}", ms=round(dt * 1e3, 3),
                   gps=round(ny * nx * filt.n_steps / dt / 1e9, 2))
        out.append(row)
        print(json.dumps(row), flush=True)

    # extension alone: extend 3600 -> 3712, slice back so the chain types
    # match; report half the round trip as the one-way extension cost
    x = jnp.asarray(rng.random((ny, 3600)).astype(np.float32))
    ext_round = jax.jit(lambda a: lane_extend_jnp(a, 3712, 12)[..., :3600])
    dt = chain_time(ext_round, x, args.chain)
    row = dict(probe="extend_plus_slice_3600_3712", ms=round(dt * 1e3, 3),
               ms_half=round(dt * 1e3 / 2, 3))
    out.append(row)
    print(json.dumps(row), flush=True)

    with open(os.path.join(os.path.dirname(__file__),
                           "probe_headline.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
