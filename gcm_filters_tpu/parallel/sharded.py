"""shard_map'd filter execution: 2-D spatial domain decomposition.

This is the capability the reference lacks entirely (its spatial dims must
fit in a single dask chunk, reference filter.py:478-486): the (y, x) field is
sharded over a ``jax.sharding.Mesh``, the whole Chebyshev iteration runs
inside ONE ``shard_map`` (so only 1-cell halo rows/columns move over the
interconnect, once per neighbor access per step), and the tripolar fold is a
reversed ppermute pairing among top-row devices (parallel.halo.fold_row).

The per-shard arithmetic is *identical* to single-device execution (the same
``ops.stencil`` operators with a halo-exchanging shift injected), so sharded
results match unsharded ones to roundoff.

Leading batch dims stay local to each shard unless ``batch_axis`` names a
mesh axis to shard them over (the dask-parallelism analogue, but inside one
XLA program).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..engine import scalar_filter_apply, vector_filter_apply
from ..filter_spec import FilterSpec
from ..ops.stencil import ScalarStencil5
from . import halo

Array = jax.Array


def _axis_size(mesh: Mesh, name: Optional[str]) -> int:
    if name is None:
        return 1
    return mesh.shape[name]


def _leaf_spec(leaf, yax, xax):
    """PartitionSpec for an operator leaf: spatial arrays shard like the field."""
    if hasattr(leaf, "ndim") and leaf.ndim >= 2:
        return P(*([None] * (leaf.ndim - 2)), yax, xax)
    return P()


def _make_shift(mesh: Mesh, yax: Optional[str], xax: Optional[str]):
    y_size, x_size = _axis_size(mesh, yax), _axis_size(mesh, xax)

    def shift(f, s, axis):
        name, size = (yax, y_size) if axis in (-2, f.ndim - 2) else (xax, x_size)
        return halo.shifted(f, s, axis, name, size)

    return shift


def _make_north(mesh: Mesh, yax, xax, fold_north: bool):
    y_size, x_size = _axis_size(mesh, yax), _axis_size(mesh, xax)

    def north(g):
        return halo.north_neighbor_sharded(
            g, fold_north, (yax, y_size), (xax, x_size)
        )

    return north


def _normalize(field):
    """Flatten leading dims to one batch dim; return (arr3d, restore_fn)."""
    field = jnp.asarray(field)
    if field.ndim == 2:
        return field[None], lambda out: out[0]
    if field.ndim == 3:
        return field, lambda out: out
    lead = field.shape[:-2]
    flat = field.reshape((-1,) + field.shape[-2:])
    return flat, lambda out: out.reshape(lead + out.shape[-2:])


def make_sharded_scalar_apply(
    stencil: ScalarStencil5,
    spec: FilterSpec,
    mesh: Mesh,
    spatial_axes: Tuple[Optional[str], Optional[str]],
    use_pallas: Optional[bool] = None,
    batch_axis: Optional[str] = None,
):
    """Compile ``field -> filtered`` with the domain sharded over ``mesh``."""
    del use_pallas  # the sharded inner step currently runs the XLA-fused path
    yax, xax = spatial_axes
    shift = _make_shift(mesh, yax, xax)
    north = _make_north(mesh, yax, xax, stencil.fold_north)

    op_specs = jax.tree_util.tree_map(lambda l: _leaf_spec(l, yax, xax), stencil)
    field_spec = P(batch_axis, yax, xax)

    def _local(stencil_local, field_local):
        lap = partial(stencil_local.laplacian, shift=shift, north=north)
        return scalar_filter_apply(stencil_local, spec, field_local, laplacian_fn=lap)

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(op_specs, field_spec),
        out_specs=field_spec,
        check_vma=False,
    )

    @jax.jit
    def apply_fn(field):
        arr, restore = _normalize(field)
        return restore(sharded(stencil, arr))

    return apply_fn


def make_sharded_vector_apply(
    operator,
    spec: FilterSpec,
    mesh: Mesh,
    spatial_axes: Tuple[Optional[str], Optional[str]],
    use_pallas: Optional[bool] = None,
    batch_axis: Optional[str] = None,
):
    """Compile ``(u, v) -> (filtered_u, filtered_v)`` sharded over ``mesh``."""
    del use_pallas
    yax, xax = spatial_axes
    shift = _make_shift(mesh, yax, xax)

    op_specs = jax.tree_util.tree_map(lambda l: _leaf_spec(l, yax, xax), operator)
    field_spec = P(batch_axis, yax, xax)

    def _local(op_local, u_local, v_local):
        lap = partial(op_local.laplacian, shift=shift)
        return vector_filter_apply(op_local, spec, u_local, v_local, laplacian_fn=lap)

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(op_specs, field_spec, field_spec),
        out_specs=(field_spec, field_spec),
        check_vma=False,
    )

    @jax.jit
    def apply_fn(u, v):
        u3, restore = _normalize(u)
        v3, _ = _normalize(v)
        fu, fv = sharded(operator, u3, v3)
        return restore(fu), restore(fv)

    return apply_fn
