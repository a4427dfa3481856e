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


def _take(f: Array, sl: slice, axis: int) -> Array:
    idx = [slice(None)] * f.ndim
    idx[axis] = sl
    return f[tuple(idx)]


def extend_x(f: Array, k: int, x_axis: Tuple[Optional[str], int]) -> Array:
    """Extend the last axis by k-cell periodic halos: (..., lx) -> (..., lx+2k).

    West halo = west neighbor's last k columns (one ppermute up the ring),
    east halo = east neighbor's first k columns. Unsharded x wraps locally.
    """
    x_name, x_size = x_axis
    lo, hi = _take(f, slice(-k, None), -1), _take(f, slice(None, k), -1)
    if x_name is not None and x_size > 1:
        lo = lax.ppermute(lo, x_name, _ring_perm(x_size, True))
        hi = lax.ppermute(hi, x_name, _ring_perm(x_size, False))
    return jnp.concatenate([lo, f, hi], axis=-1)


def exchange_2d(
    f: Array,
    k: int,
    y_axis: Tuple[Optional[str], int],
    x_axis: Tuple[Optional[str], int],
    fold_north: bool = False,
    fold_src: Optional[Array] = None,
) -> Array:
    """Extend (..., ly, lx) by k-cell halos on both spatial axes.

    Two-phase exchange: x first, then y over the x-extended strips so corner
    data rides along (a k-step trapezoid of a radius-1 stencil reaches the
    diagonal neighbors' corners). With ``fold_north``, the north halo of the
    top mesh row is the tripolar seam partner's strip, reversed in x and
    flipped in y (ext row ny-1+m = real row ny-m reversed — the k-row
    generalization of the reference's mirror-append, kernels.py:33-40).
    ``fold_src`` supplies a different source array for the fold chunk: the
    seam reflection swaps the n<->s and e<->w stencil coefficients, so
    coefficient arrays fold from their swapped partner.
    """
    y_name, y_size = y_axis
    x_name, x_size = x_axis
    fx = extend_x(f, k, x_axis)

    south = _take(fx, slice(-k, None), -2)
    north = _take(fx, slice(None, k), -2)
    if y_name is not None and y_size > 1:
        south = lax.ppermute(south, y_name, _ring_perm(y_size, True))
        north = lax.ppermute(north, y_name, _ring_perm(y_size, False))

    if fold_north:
        src_x = fx if fold_src is None else extend_x(fold_src, k, x_axis)
        chunk = _take(src_x, slice(-k, None), -2)[..., ::-1, ::-1]
        if x_name is not None and x_size > 1:
            pairs = [(i, x_size - 1 - i) for i in range(x_size)]
            chunk = lax.ppermute(chunk, x_name, pairs)
        if y_name is not None and y_size > 1:
            is_top = lax.axis_index(y_name) == y_size - 1
            north = jnp.where(is_top, chunk, north)
        else:
            north = chunk

    return jnp.concatenate([south, fx, north], axis=-2)


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
