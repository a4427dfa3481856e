"""Sharded filtering over a device mesh — the capability the reference lacks.

Decomposes the spatial domain over all available devices with automatic halo
exchange (including the tripolar fold seam) and checks the sharded result
against single-device execution. Works on any backend; to try it without a
TPU slice, force 8 virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/example_sharded_filtering.py --cpu
"""
import sys

import numpy as np

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root run
import gcm_filters_tpu as gf


def main():
    devs = jax.devices()
    n = len(devs)
    xs = max(d for d in (8, 4, 2, 1) if n % d == 0)
    ys = n // xs
    mesh = Mesh(np.array(devs).reshape(ys, xs), ("y", "x"))
    print(f"mesh: {ys} x {xs} over {n} {devs[0].platform} device(s)")

    ny, nx = 240 * max(ys, 1), 360 * max(xs, 1)
    rng = np.random.default_rng(0)
    wet = np.ones((ny, nx))
    wet[0, :] = 0
    area = 0.9 + 0.2 * rng.random((ny, nx))
    data = rng.standard_normal((ny, nx))

    kwargs = dict(
        filter_scale=10.0,
        dx_min=1.0,
        grid_type=gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
        grid_vars={"area": area, "wet_mask": wet},
    )
    sharded = gf.Filter(**kwargs, mesh=mesh, spatial_axes=("y", "x"))
    single = gf.Filter(**kwargs)

    got = np.asarray(sharded.apply(data))
    want = np.asarray(single.apply(data))
    print("max |sharded - single|:", np.abs(got - want).max())

    # Compute/communication overlap: on a mesh sharded ONLY along y, a
    # single 2-D float32 apply routes through the in-kernel ring halo
    # exchange (make_async_remote_copy sends overlapping the interior
    # compute — zero XLA collectives in steady state) and matches the
    # unsharded Pallas kernel bitwise at the same coefficient layout
    # (tests/test_ring.py; the packed production reference here can sit
    # ~1 ulp off via XLA FMA contraction). Engages automatically when
    # eligible.
    if n >= 2:
        ymesh = Mesh(np.array(devs).reshape(n, 1), ("y", "x"))
        ny_r = 96 * n  # block heights must tile each shard's rows
        wet_r = np.ones((ny_r, nx)); wet_r[0, :] = 0
        rkw = dict(kwargs, grid_vars={
            "area": 0.9 + 0.2 * rng.random((ny_r, nx)), "wet_mask": wet_r})
        data_r = rng.standard_normal((ny_r, nx)).astype(np.float32)
        ring = gf.Filter(**rkw, mesh=ymesh, spatial_axes=("y", "x"),
                         use_pallas=True)
        base = gf.Filter(**rkw, use_pallas=True)
        got_ring = np.asarray(ring.apply(data_r))
        want_ring = np.asarray(base.apply(data_r))
        print("ring (y-only mesh) max |ring - unsharded pallas|:",
              np.abs(got_ring - want_ring).max())


if __name__ == "__main__":
    main()
