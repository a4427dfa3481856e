"""Halo exchange primitives for shard_map'd stencils.

The reference gets periodicity for free from ``np.roll`` on a monolithic
array and therefore cannot decompose the spatial dims at all (its spatial
dims must fit one dask chunk, reference filter.py:482). Here the domain is
sharded over a 2-D (y, x) mesh and each radius-1 stencil neighbor access
becomes a one-row/one-column ``lax.ppermute`` over the TPU interconnect:

  - periodic wrap in x and y falls out of the ring permutation,
  - the tripolar north fold pairs top-row device (y=Y-1, x=i) with
    (y=Y-1, x=X-1-i) and reverses the exchanged row in x — exactly the
    reference's mirror-append (kernels.py:33-40) expressed as communication.

All helpers are uniform collectives (every device participates), as SPMD
requires; devices that don't need a result (e.g. the fold row below the top
mesh row) simply ignore it.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _ring_perm(n: int, send_to_next: bool):
    """Permutation pairs for a periodic ring send: d -> d+1 (or d-1)."""
    if send_to_next:
        return [(d, (d + 1) % n) for d in range(n)]
    return [(d, (d - 1) % n) for d in range(n)]


def shifted(
    f: Array,
    shift: int,
    axis: int,
    axis_name: Optional[str],
    axis_size: int,
) -> Array:
    """Global-`jnp.roll(f, shift, axis)` equivalent on a sharded block.

    shift=+1 brings each cell its west/south neighbor's value; shift=-1 its
    east/north neighbor's. Unsharded axes (axis_name None or size 1) reduce
    to a local roll.
    """
    assert shift in (+1, -1)
    if axis_name is None or axis_size == 1:
        return jnp.roll(f, shift, axis)

    if shift == +1:
        # need my west/south halo = neighbor (idx-1)'s last slice; they send "up"
        sl = [slice(None)] * f.ndim
        sl[axis] = slice(-1, None)
        halo = lax.ppermute(f[tuple(sl)], axis_name, _ring_perm(axis_size, True))
        body = [slice(None)] * f.ndim
        body[axis] = slice(None, -1)
        return jnp.concatenate([halo, f[tuple(body)]], axis=axis)
    else:
        sl = [slice(None)] * f.ndim
        sl[axis] = slice(None, 1)
        halo = lax.ppermute(f[tuple(sl)], axis_name, _ring_perm(axis_size, False))
        body = [slice(None)] * f.ndim
        body[axis] = slice(1, None)
        return jnp.concatenate([f[tuple(body)], halo], axis=axis)


def fold_row(
    g: Array,
    x_axis_name: Optional[str],
    x_axis_size: int,
) -> Array:
    """The tripolar fold partner of the local top row, reversed in x.

    Device (y_top, i) pairs with (y_top, X-1-i); with x unsharded the row is
    simply reversed locally. Returns shape (..., 1, nx_local).
    """
    top = g[..., -1:, :]
    if x_axis_name is None or x_axis_size == 1:
        return top[..., ::-1]
    perm = [(i, x_axis_size - 1 - i) for i in range(x_axis_size)]
    partner = lax.ppermute(top, x_axis_name, perm)
    return partner[..., ::-1]


def north_neighbor_sharded(
    g: Array,
    fold_north: bool,
    y_axis: Tuple[Optional[str], int],
    x_axis: Tuple[Optional[str], int],
) -> Array:
    """Sharded counterpart of ops.stencil.north_neighbor."""
    y_name, y_size = y_axis
    x_name, x_size = x_axis
    gn = shifted(g, -1, -2, y_name, y_size)
    if not fold_north:
        return gn
    fr = fold_row(g, x_name, x_size)
    if y_name is None or y_size == 1:
        return jnp.concatenate([g[..., 1:, :], fr], axis=-2)
    # only the top mesh row replaces its wrap halo with the fold row
    is_top = lax.axis_index(y_name) == y_size - 1
    top_fixed = jnp.concatenate([g[..., 1:, :], fr], axis=-2)
    return jnp.where(is_top, top_fixed, gn)
