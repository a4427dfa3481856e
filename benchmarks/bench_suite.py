"""Benchmark suite: per-grid throughput, roofline accounting, scaling.

The reference publishes no benchmark suite (BASELINE.md); this harness
records what matters for the TPU build:

  1. headline workload (bench.py's): full-filter throughput + HBM roofline %
  2. per-grid-type single-chip throughput (all scalar grids, both paths)
  3. vector-filter throughput (C-grid and B-grid)
  4. sharded scaling efficiency when >1 device is available

Timing uses chained applications with a single scalar readback, measured as
the difference between a 1-chain and an N-chain (the tunneled axon backend
makes per-call dispatch and full-array transfers unusable for timing).

Run: python benchmarks/bench_suite.py [--quick]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gcm_filters_tpu as gf
import roofline

def _adaptive_n(est, cap):
    """Chain length targeting ~0.18 s of steady-state work — above the
    calibrated >=0.15 s floor (CLAUDE.md: shorter chains inflate through
    tunnel round-trip jitter; sub-ms kernels need long chains for the
    differencing to beat dispatch-latency noise)."""
    return min(cap, max(20, int(0.18 / max(est, 1e-5))))


def chain_time(fn, x, n, reps=4):
    def run(k):
        t0 = time.perf_counter()
        y = x
        for _ in range(k):
            y = fn(y)
        float(jnp.nanmean(y[1:]))
        return time.perf_counter() - t0

    run(1)  # compile/warm
    t1 = min(run(1) for _ in range(reps))
    n = _adaptive_n((run(11) - t1) / 10, n)
    tn = min(run(n + 1) for _ in range(reps))
    return (tn - t1) / n


def chain_time_vec(fn, u, v, n, reps=4):
    def run(k):
        t0 = time.perf_counter()
        a, b = u, v
        for _ in range(k):
            a, b = fn(a, b)
        float(jnp.nanmean(a) + jnp.nanmean(b))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(reps))
    n = _adaptive_n((run(11) - t1) / 10, n)
    tn = min(run(n + 1) for _ in range(reps))
    return (tn - t1) / n


def grid_vars_for(grid_type, ny, nx, rng):
    # built lazily per grid (a dict literal would materialize every grid's
    # ~70 MB f64 arrays at production size on each call)
    wet = np.ones((ny, nx))
    wet[0, :] = 0
    wet[: ny // 6, : nx // 5] = 0
    area = 0.9 + 0.2 * rng.random((ny, nx))
    m = 0.9 + 0.2 * rng.random((ny, nx))
    ones = np.ones((ny, nx))

    def folding():
        a = 0.9 + 0.2 * rng.random((ny, nx))
        a[-1, nx // 2 :] = a[-1, : nx // 2][::-1]
        return a

    G = gf.GridType
    builders = {
        G.REGULAR: lambda: {},
        G.REGULAR_AREA_WEIGHTED: lambda: dict(area=area),
        G.REGULAR_WITH_LAND: lambda: dict(wet_mask=wet),
        G.REGULAR_WITH_LAND_AREA_WEIGHTED:
            lambda: dict(area=area, wet_mask=wet),
        G.IRREGULAR_WITH_LAND: lambda: dict(
            wet_mask=wet, dxw=m, dyw=1 + 0.05 * m, dxs=1 + 0.1 * m, dys=m,
            area=m * m, kappa_w=ones, kappa_s=ones,
        ),
        G.MOM5U: lambda: dict(wet_mask=wet, dxt=m, dyt=m, dxu=m, dyu=m,
                              area_u=m * m),
        G.MOM5T: lambda: dict(wet_mask=wet, dxt=m, dyt=m, dxu=m, dyu=m,
                              area_t=m * m),
        G.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED:
            lambda: dict(area=area, wet_mask=wet),
        G.TRIPOLAR_POP_WITH_LAND: lambda: dict(
            wet_mask=wet, dxe=m, dye=1 + 0.1 * m, dxn=folding(),
            dyn=folding(), tarea=m * m,
        ),
        G.VECTOR_C_GRID: lambda: dict(
            wet_mask_t=ones, wet_mask_q=ones, dxT=m, dyT=m, dxCu=m, dyCu=m,
            dxCv=m, dyCv=m, dxBu=m, dyBu=m, area_u=m * m, area_v=m * m,
            kappa_iso=ones, kappa_aniso=ones,
        ),
        G.VECTOR_B_GRID: lambda: dict(
            DXU=m, DYU=m, HUS=m, HUW=m, HTE=m, HTN=m, UAREA=m * m,
            TAREA=m * m,
        ),
    }
    return builders[grid_type]()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller domain, fewer reps")
    args = ap.parse_args()

    dev = jax.devices()[0]
    ny, nx = (1200, 1800) if args.quick else (2400, 3600)
    n_chain = 5 if args.quick else 200
    rng = np.random.default_rng(42)
    data = rng.random((ny, nx)).astype(np.float32)
    x = jnp.asarray(data)
    results = []

    print(f"# device={dev.device_kind} domain={ny}x{nx} f32", flush=True)

    scalar_grids = [g for g in gf.GridType
                    if g not in (gf.GridType.VECTOR_C_GRID, gf.GridType.VECTOR_B_GRID)]
    for grid in scalar_grids:
        gv = grid_vars_for(grid, ny, nx, rng)
        for pallas in (True, False):
            filt = gf.Filter(
                filter_scale=10.0, dx_min=1.0, grid_type=grid, grid_vars=gv,
                dtype=jnp.float32, use_pallas=pallas,
            )
            dt = chain_time(filt._scalar_fn(), x, n_chain)
            gps = ny * nx * filt.n_steps / dt
            row = dict(grid=grid.name, path="pallas" if pallas else "xla",
                       n_steps=filt.n_steps, ms=round(dt * 1e3, 3),
                       gps=round(gps / 1e9, 2))
            if pallas:
                # per-config two-ceiling roofline model (HBM bytes moved and
                # VPU op count, vs v5e speed-of-light; see roofline.py)
                model = roofline.scalar_model(filt, ny, nx, dt)
                if model:
                    row.update(model)
            results.append(row)
            print(json.dumps(row), flush=True)

    # Taper shape: ~3x the steps, exercising the multi-pass trapezoid path.
    gv = grid_vars_for(gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
                       ny, nx, rng)
    for pallas in (True, False):
        filt = gf.Filter(
            filter_scale=10.0, dx_min=1.0, filter_shape=gf.FilterShape.TAPER,
            grid_type=gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
            grid_vars=gv, dtype=jnp.float32, use_pallas=pallas,
        )
        dt = chain_time(filt._scalar_fn(), x, n_chain)
        row = dict(grid="TRIPOLAR_REGULAR (taper)",
                   path="pallas" if pallas else "xla",
                   n_steps=filt.n_steps, ms=round(dt * 1e3, 3),
                   gps=round(ny * nx * filt.n_steps / dt / 1e9, 2))
        if pallas:
            model = roofline.scalar_model(filt, ny, nx, dt)
            if model:
                row.update(model)
        results.append(row)
        print(json.dumps(row), flush=True)

    u = jnp.asarray(rng.random((ny, nx)).astype(np.float32))
    v = jnp.asarray(rng.random((ny, nx)).astype(np.float32))
    for grid in (gf.GridType.VECTOR_C_GRID, gf.GridType.VECTOR_B_GRID):
        gv = grid_vars_for(grid, ny, nx, rng)
        paths = [True, False]
        for pallas in paths:
            filt = gf.Filter(filter_scale=10.0, dx_min=1.0, grid_type=grid,
                             grid_vars=gv, dtype=jnp.float32, use_pallas=pallas)
            dt = chain_time_vec(filt._vector_fn(), u, v, n_chain)
            row = dict(grid=grid.name, path="pallas" if pallas else "xla",
                       n_steps=filt.n_steps, ms=round(dt * 1e3, 3),
                       gps=round(2 * ny * nx * filt.n_steps / dt / 1e9, 2))
            if pallas:
                model = roofline.vector_model(filt, ny, nx, dt)
                if model:
                    row.update(model)
            results.append(row)
            print(json.dumps(row), flush=True)

    # Sharded overhead on THIS device: a 1x1 mesh runs the full shard_map
    # machinery (halo concats, coefficient extension, trapezoid local
    # compute) with no actual communication — the fixed cost of the
    # decomposition, measurable on a single chip.
    from jax.sharding import Mesh as _Mesh

    gv = grid_vars_for(gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
                       ny, nx, rng)
    kw = dict(filter_scale=10.0, dx_min=1.0,
              grid_type=gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
              grid_vars=gv, dtype=jnp.float32)
    mesh1 = _Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
    t_un = chain_time(gf.Filter(**kw)._scalar_fn(), x, n_chain)
    t_sh = chain_time(
        gf.Filter(**kw, mesh=mesh1, spatial_axes=("y", "x"))._scalar_fn(),
        x, n_chain)
    row = dict(grid="TRIPOLAR_REGULAR (sharded 1x1 overhead)",
               ms_unsharded=round(t_un * 1e3, 3),
               ms_sharded_1x1=round(t_sh * 1e3, 3),
               overhead=round(t_sh / t_un - 1, 3))
    results.append(row)
    print(json.dumps(row), flush=True)

    # Communication census (virtual 8-device CPU mesh, subprocess: needs a
    # CPU backend with forced device count): collective-permute counts and
    # payload volumes per apply — the measured side of the ICI scaling
    # model in benchmarks/README.md.
    import subprocess

    try:
        cen = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "comm_census.py")],
            capture_output=True, text=True, timeout=900, check=True)
        for line in cen.stdout.splitlines():
            if line.startswith("{"):
                row = json.loads(line)
                results.append(row)
                print(json.dumps(row), flush=True)
    except Exception as e:  # census is auxiliary; never sink the suite
        print(f"# comm census skipped: {e}", flush=True)

    n_dev = len(jax.devices())
    if n_dev > 1:
        from jax.sharding import Mesh

        xs = max([d for d in (8, 4, 2) if n_dev % d == 0], default=1)
        mesh = Mesh(np.array(jax.devices()).reshape(n_dev // xs, xs), ("y", "x"))
        gv = grid_vars_for(gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
                           ny, nx, rng)
        single = gf.Filter(filter_scale=10.0, dx_min=1.0,
                           grid_type=gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
                           grid_vars=gv, dtype=jnp.float32)
        sharded = gf.Filter(filter_scale=10.0, dx_min=1.0,
                            grid_type=gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
                            grid_vars=gv, dtype=jnp.float32,
                            mesh=mesh, spatial_axes=("y", "x"))
        t1 = chain_time(single._scalar_fn(), x, n_chain)
        tn = chain_time(sharded._scalar_fn(), x, n_chain)
        row = dict(grid="TRIPOLAR_REGULAR (sharded)", devices=n_dev,
                   scaling_efficiency=round(t1 / (tn * n_dev), 3))
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out, "w") as f:
        json.dump(dict(device=dev.device_kind, domain=[ny, nx],
                       results=results), f, indent=1)
    print(f"# wrote {out}", flush=True)


if __name__ == "__main__":
    main()
