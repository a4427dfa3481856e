"""Collective census: count and size the sharded engine's communication.

Compiles the sharded filter on a virtual 8-device CPU mesh (2x4) and counts
``collective-permute`` ops and their payload bytes in the optimized HLO —
the measured record of what the wide-halo round schedule actually emits per
apply (VERDICT round-1 item 9). Run standalone or via bench_suite.py:

    python benchmarks/comm_census.py            # prints one JSON line

The analytic model this verifies is in benchmarks/README.md.
"""
import json
import os
import re
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import gcm_filters_tpu as gf  # noqa: E402
from gcm_filters_tpu.engine import _cast_operator  # noqa: E402

# HLO line shape: `%ppermute.86 = f32[600,8]{1,0} collective-permute(...)`
_SHAPE_RE = re.compile(
    r"=\s*([a-z0-9]+)\[([0-9,]*)\][^=\n]*collective-permute\(")
_DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4, "u32": 4}


def census(grid_type, ny, nx, halo_steps=None, vector=False):
    from jax.sharding import Mesh

    rng = np.random.default_rng(0)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("y", "x"))

    wet = np.ones((ny, nx)); wet[0, :] = 0
    area = 0.9 + 0.2 * rng.random((ny, nx))
    m = 0.9 + 0.2 * rng.random((ny, nx))
    ones = np.ones((ny, nx))
    gv = {
        gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED:
            dict(area=area, wet_mask=wet),
        gf.GridType.VECTOR_B_GRID:
            dict(DXU=m, DYU=m, HUS=m, HUW=m, HTE=m, HTN=m,
                 UAREA=m * m, TAREA=m * m),
    }[grid_type]

    filt = gf.Filter(filter_scale=10.0, dx_min=1.0, grid_type=grid_type,
                     grid_vars=gv, dtype=jnp.float32, mesh=mesh,
                     spatial_axes=("y", "x"), halo_steps=halo_steps,
                     use_pallas=False)
    fn = (filt._vector_fn() if vector else filt._scalar_fn())
    op = _cast_operator(filt.operator, jnp.float32)
    if vector:
        from gcm_filters_tpu.ops.stencil import CGridVectorOperator

        if isinstance(filt.operator, CGridVectorOperator):
            from gcm_filters_tpu.ops.ctaps import cgrid_tap_arrays

            op = _cast_operator(cgrid_tap_arrays(filt.operator), jnp.float32)
        u = jnp.zeros((1, ny, nx), jnp.float32)
        fn(u[0], u[0])  # populate the compiled XLA-rounds path
        hlo = fn._fb[0].lower(op, u, u).compile().as_text()
    else:
        x = jnp.zeros((1, ny, nx), jnp.float32)
        fn(x[0])  # populate the compiled XLA-rounds path
        hlo = fn._fb[0].lower(op, x).compile().as_text()

    n_perm = hlo.count(" collective-permute(")
    total_bytes = 0
    for dt, dims in _SHAPE_RE.findall(hlo):
        if dims:
            n = int(np.prod([int(d) for d in dims.split(",")]))
        else:
            n = 1
        total_bytes += n * _DTYPE_BYTES.get(dt, 4)
    return dict(
        grid=grid_type.name, ny=ny, nx=nx, devices=8, mesh=[2, 4],
        n_steps=filt.n_steps,
        halo_steps=halo_steps,
        collective_permutes=n_perm,
        permute_payload_mib=round(total_bytes * 8 / 2**20, 3),  # all 8 devs
        payload_per_step_per_dev_kib=round(
            total_bytes / filt.n_steps / 2**10, 2),
    )


def census_prepared(ny, nx):
    """The steady-state apply of the PREPARED (cached-ext) Pallas path:
    coefficient exchanges live in the one-time prepare, so the apply should
    carry only the carry halo exchanges."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(0)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("y", "x"))
    wet = np.ones((ny, nx)); wet[0, :] = 0
    area = 0.9 + 0.2 * rng.random((ny, nx))
    filt = gf.Filter(filter_scale=10.0, dx_min=1.0,
                     grid_type=gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
                     grid_vars=dict(area=area, wet_mask=wet),
                     dtype=jnp.float32, mesh=mesh, spatial_axes=("y", "x"),
                     use_pallas=True)
    fn = filt._scalar_fn()
    x = jnp.zeros((ny, nx), jnp.float32)
    fn(x)  # warms ext cache + compiled apply
    st = _cast_operator(filt.operator, jnp.float32)
    exts = next(iter(fn._ext_cache.values()))
    hlo = fn._pl_jit["dist"].lower(st, x[None], *exts).compile().as_text()
    n_perm = hlo.count(" collective-permute(")
    total_bytes = 0
    for dt, dims in _SHAPE_RE.findall(hlo):
        n = int(np.prod([int(d) for d in dims.split(",")])) if dims else 1
        total_bytes += n * _DTYPE_BYTES.get(dt, 4)
    return dict(
        grid="TRIPOLAR_REGULAR (prepared-ext pallas apply)", ny=ny, nx=nx,
        devices=8, mesh=[2, 4], n_steps=filt.n_steps,
        collective_permutes=n_perm,
        permute_payload_mib=round(total_bytes * 8 / 2**20, 3),
    )


def main():
    rows = [
        census(gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED, 1200, 1800),
        census(gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED, 1200, 1800,
               halo_steps=1),
        census(gf.GridType.VECTOR_B_GRID, 1200, 1800, vector=True),
        census_prepared(1200, 1800),
    ]
    for r in rows:
        print(json.dumps(r), flush=True)
    out = os.path.join(os.path.dirname(__file__), "comm_census.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
