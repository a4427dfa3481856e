"""On-chip A/B: packed vs separate coefficient streams, coupled kernels.

The coupled vector kernels stream 18 (C-grid) / 10 (B-grid) extended
coefficient windows per block — the round-5 profile correction
(benchmarks/README.md) measured their copies NOT overlapping compute
(copies ~23 us + compute ~25 us vs 48 us per block), and the stream count
is the prime suspect. ``vec_pass._PACK_COEF`` stacks the layouts into one
(nb, n_ext, win, wx) array so each block's coefficients arrive as a single
fully HBM-contiguous copy: same bytes, same values, one stream.

Arms are INTERLEAVED (packed, separate, packed, ...) so session drift
cancels; each row records the shape-cache state and telemetry counters so
a fallback can never masquerade as a kernel timing. Also sweeps br targets
above the current sweet spots: if packing is what restores pipelining,
larger blocks (fewer redundant coefficient rows) may now win.

Run: python benchmarks/sweep_vecpack.py [--quick] [--chain N] [--reps N]
Writes benchmarks/sweep_vecpack.json.
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
import gcm_filters_tpu.ops.pallas.vec_pass as vp
from gcm_filters_tpu.utils import telemetry
from bench_suite import chain_time_vec, grid_vars_for


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--chain", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--nx", type=int, default=None)
    args = ap.parse_args()

    ny = 1200 if args.quick else 2400
    nx = args.nx or (1800 if args.quick else 3600)
    # cap: _adaptive_n targets 0.18 s of device work (C-grid ~1.8 ms/apply
    # -> ~100 chains; the cap must sit above that, see bench_suite)
    n_chain = args.chain or (5 if args.quick else 150)
    rng = np.random.default_rng(42)
    G = gf.GridType

    print(f"# device={jax.devices()[0].device_kind} {ny}x{nx} f32", flush=True)

    u = jnp.asarray(rng.random((ny, nx)).astype(np.float32))
    v = jnp.asarray(rng.random((ny, nx)).astype(np.float32))

    configs = [
        (G.VECTOR_C_GRID, "_BR_TARGET_CTAP", [32] if args.quick
         else [32, 48]),
        # br=64: single-pass fits the VMEM model for the lighter B-grid
        # only once packed streams cut the live-stream count (the round-4
        # _BR_MAX=48 cap predates packing)
        (G.VECTOR_B_GRID, "_BR_TARGET_VEC", [40] if args.quick
         else [40, 48, 64]),
    ]
    out = []
    real_br_max = vp._BR_MAX
    try:
        for grid, tgt_name, targets in configs:
            gv = grid_vars_for(grid, ny, nx, rng)
            for tgt in targets:
                setattr(vp, tgt_name, tgt)
                vp._BR_MAX = max(real_br_max, tgt)
                arms = {}
                for arm in ("packed", "separate"):
                    vp._PACK_COEF = arm == "packed"
                    telemetry.reset_fallback_counts()
                    filt = gf.Filter(filter_scale=10.0, dx_min=1.0,
                                     grid_type=grid, grid_vars=gv,
                                     dtype=jnp.float32, use_pallas=True)
                    fn = filt._vector_fn()
                    chain_time_vec(fn, u, v, 1)  # compile under this arm
                    arms[arm] = dict(
                        fn=fn, filt=filt,
                        fallbacks=dict(telemetry.fallback_counts()),
                        times=[])
                for _ in range(args.reps):
                    for arm in ("packed", "separate"):
                        a = arms[arm]
                        a["times"].append(
                            chain_time_vec(a["fn"], u, v, n_chain))
                for arm in ("packed", "separate"):
                    a = arms[arm]
                    filt = a["filt"]
                    dt = min(a["times"])
                    entry = a["fn"].shape_cache.get((ny, nx, "float32"))
                    row = dict(
                        grid=grid.name, br_target=tgt, arm=arm,
                        n_steps=filt.n_steps,
                        ms=round(dt * 1e3, 3),
                        ms_all=[round(t * 1e3, 3) for t in a["times"]],
                        gps=round(2 * ny * nx * filt.n_steps / dt / 1e9, 2),
                        kernel_executed=entry not in (None, "xla"),
                        fallbacks=a["fallbacks"],
                    )
                    out.append(row)
                    print(json.dumps(row), flush=True)
    finally:
        vp._PACK_COEF = True
        vp._BR_TARGET_CTAP = 32
        vp._BR_TARGET_VEC = 40
        vp._BR_MAX = real_br_max

    with open(os.path.join(os.path.dirname(__file__), "sweep_vecpack.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
