"""Unit tests for the halo-exchange primitives (parallel/halo.py).

The round engine uses exchange_2d/extend_x; the single-cell primitives
(shifted, fold_row, north_neighbor_sharded) are public building blocks for
custom per-step exchange patterns — pinned here so they cannot rot.
"""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from gcm_filters_tpu.parallel import halo


def _run_sharded(fn, arr, ydevs, xdevs):
    mesh = Mesh(np.array(jax.devices()[: ydevs * xdevs]).reshape(ydevs, xdevs),
                ("y", "x"))
    spec = P("y", "x")
    return np.asarray(
        shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                  check_vma=False)(arr)
    )


def test_shifted_equals_global_roll():
    rng = np.random.default_rng(0)
    arr = rng.random((32, 64))
    for shift, axis, name, size in [(1, -2, "y", 2), (-1, -2, "y", 2),
                                    (1, -1, "x", 4), (-1, -1, "x", 4)]:
        got = _run_sharded(
            lambda f: halo.shifted(f, shift, axis, name, size), arr, 2, 4
        )
        np.testing.assert_array_equal(got, np.roll(arr, shift, axis))


def test_fold_row_pairs_and_reverses():
    rng = np.random.default_rng(1)
    arr = rng.random((16, 64))

    def fn(f):
        fr = halo.fold_row(f, "x", 4)
        return jax.numpy.concatenate([f[:-1], fr], axis=-2)

    got = _run_sharded(fn, arr, 1, 4)
    # the returned fold row must be the global top row reversed in x
    np.testing.assert_array_equal(got[-1], arr[-1, ::-1])


def test_north_neighbor_sharded_matches_local():
    from gcm_filters_tpu.ops.stencil import north_neighbor
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    arr = rng.random((32, 64))
    for fold in (False, True):
        want = np.asarray(north_neighbor(jnp.asarray(arr), fold))
        got = _run_sharded(
            lambda f: halo.north_neighbor_sharded(
                f, fold, ("y", 2), ("x", 4)), arr, 2, 4,
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_exchange_2d_periodic_matches_global():
    rng = np.random.default_rng(3)
    arr = rng.random((32, 64))
    k = 3

    def fn(f):
        return halo.exchange_2d(f, k, ("y", 2), ("x", 4))[k:-k, k:-k]

    got = _run_sharded(fn, arr, 2, 4)
    np.testing.assert_array_equal(got, arr)
