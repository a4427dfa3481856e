"""In-kernel ring halo exchange: the sharded path with compute/comm overlap.

The round-based sharded engine (sharded.py) alternates XLA-side collective
halo exchanges with Pallas local compute, fully serializing communication
and computation. This module instead runs the GLOBAL fused pass plan
(ops/pallas/cheb_pass.plan_passes) per shard of a 1-D y-decomposition, with
the halo exchange performed *inside* the kernel by
``pltpu.make_async_remote_copy`` ring sends (SURVEY.md §5/§7; the SPMD
compute/comm-overlap pattern from the Pallas distributed guide): each pass
kernel starts its neighbor sends at entry, computes the interior row blocks
while the transfers are in flight, and processes the two shard-edge blocks
last, waiting on the receive semaphores only there. Steady state carries
ZERO XLA collectives — the comm census of this path is empty.

Exactness: every block window receives exactly the rows the unsharded
kernel's periodic/fold window would contain (interior blocks read the local
core; edge blocks read the remote-filled halo buffers; the tripolar seam
stays local to the top shard because x is unsharded), so the sharded result
matches the single-device Pallas kernel bitwise for most configs — tested
on the virtual CPU mesh (tests/test_ring.py); configs with a pre-mask
stream can land ~1 ulp off under interpret mode because the remote-copy
ops change XLA's FMA fusion context, not the window data.

Eligibility (falls back to the round-based engine otherwise): 1-D
y-sharding (every other mesh axis size 1), 2-D f32 fields, a global plan
with 8-row-aligned halos whose block height divides the local rows with
>= 2 blocks per shard. The pass builders re-derive DMA-window eligibility
themselves and decline with None — this module never has to mirror that
predicate.

Both operator families are covered: the scalar pass kernels
(:func:`make_ring_scalar_apply`) and the coupled vector kernels
(:func:`make_ring_vector_apply`, B-grid and tap-expanded C-grid), whose
remote copies carry the stacked (u, v) pair so each pass still issues
exactly two sends per live field. ``halo_steps`` (the round-based engine's
comm:compute knob) bounds the steps fused per ring pass the same way it
bounds steps per exchange round.

Real-hardware status: the kernel includes the entry barrier
(``pltpu.get_barrier_semaphore`` + ``collective_id``) required for
cross-invocation buffer safety on real multi-chip TPU, but this environment
has a single chip, so the multi-device path is validated in interpret mode
— on the single-process virtual mesh AND across two real OS processes over
gloo/TCP (tests/test_multihost.py, bitwise). ``_RING`` defaults to auto =
on for interpret backends, off on real TPU until validated on a pod
(override: ``GCM_FILTERS_TPU_RING=1``).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 spells it jax.shard_map
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..filter_spec import FilterSpec
from ..ops.stencil import ScalarStencil5, hspace_drop_pre
from ..ops.pallas.cheb_pass import (
    _coef_arrays,
    _ext_geometry,
    build_ring_pass,
    host_ext_inputs,
    plan_passes,
)

# Tri-state switch: None = auto (on for interpret backends, off on real TPU
# until pod-validated), True/False = forced. GCM_FILTERS_TPU_RING=1/0
# overrides from the environment (pod validation without code edits).
_RING: Optional[bool] = {"1": True, "0": False}.get(
    os.environ.get("GCM_FILTERS_TPU_RING", ""))


def ring_enabled() -> bool:
    if _RING is not None:
        return _RING
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return False


def _axis_size(mesh: Mesh, name: Optional[str]) -> int:
    if name is None:
        return 1
    return mesh.shape[name]


def _ring_mesh_for(mesh: Mesh, spatial_axes):
    """(ring_mesh, yax, p_y) for a strict 1-D y-decomposition, else None.

    The sub-mesh carries the SAME devices on a single named axis: the
    remote-DMA discharge rule (interpret mode) supports exactly one named
    axis in the environment, and the ring only permutes along y anyway.
    """
    yax, _ = spatial_axes
    p_y = _axis_size(mesh, yax)
    if yax is None or p_y < 2:
        return None
    if any(n != yax and mesh.shape[n] != 1 for n in mesh.axis_names):
        return None
    return Mesh(mesh.devices.reshape(p_y), (yax,)), yax, p_y


def _max_fuse(halo_steps: Optional[int]) -> int:
    """Steps fused per ring pass, honoring the user's halo_steps knob the
    same way the round-based engine bounds steps per exchange round."""
    return min(16, halo_steps) if halo_steps else 16


def _shard_plan(plan, p_y: int, ny: int, dtype):
    """Validate a global plan against the shard grid: 4-byte elements and
    block heights tiling each shard's ly = ny/p_y rows with >= 2 blocks
    (the edge blocks need interior blocks to overlap the transfers with).
    Returns ly, or None if ineligible."""
    if np.dtype(dtype).itemsize != 4 or ny % p_y:
        return None
    ly = ny // p_y
    if plan is None or plan.halo > plan.br:
        return None
    if ly % plan.br or ly // plan.br < 2:
        return None
    return ly


def _pass_chain(plan, build_one):
    """[(fn, p_offset, n_p, first, last)] over the plan's passes, or None
    the moment any builder re-derives eligibility and declines."""
    pass_fns = []
    off = 0
    for m, n_ops in enumerate(plan.steps):
        first = m == 0
        last = m == len(plan.steps) - 1
        fn = build_one(n_ops, first, last)
        if fn is None:
            return None
        n_p = n_ops + 1 if first else n_ops
        pass_fns.append((fn, off, n_p, first, last))
        off += n_p
    return pass_fns


def _sharded_run(ring_mesh, yax, ext_host, local_run, n_fields):
    """jit(shard_map(local_run)) plus the device-placed coefficient exts.

    The exts are the GLOBAL extended-block layouts sharded over their
    leading (block) axis: each shard holds exactly its blocks.
    """
    # block axis 0 shards; trailing axes (rank 3 unpacked / rank 4 packed
    # coefficient layouts, see vec_pass._ext_layout) replicate per shard
    ext_specs = [P(yax, *([None] * (np.asarray(e).ndim - 1)))
                 for e in ext_host]
    ext_dev = [jax.device_put(jnp.asarray(e), NamedSharding(ring_mesh, s))
               for e, s in zip(ext_host, ext_specs)]
    field_spec = P(yax, None)
    out_specs = field_spec if n_fields == 1 else (field_spec,) * n_fields
    run = shard_map(
        local_run,
        mesh=ring_mesh,
        in_specs=(field_spec,) * n_fields + tuple(ext_specs),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(run), ext_dev


def make_ring_scalar_apply(
    stencil: ScalarStencil5,
    spec: FilterSpec,
    mesh: Mesh,
    spatial_axes: Tuple[Optional[str], Optional[str]],
    exact_nan: bool = False,
    halo_steps: Optional[int] = None,
):
    """``field -> filtered`` via per-shard ring kernels, or None.

    Returns an apply callable whose per-shape builds may themselves return
    None (caller falls back to the round-based engine for that shape).
    """
    meshed = _ring_mesh_for(mesh, spatial_axes)
    if meshed is None:
        return None
    ring_mesh, yax, p_y = meshed

    import dataclasses

    from ..engine import _laplacian_scale

    p_host = np.asarray(spec.p)
    drop_pre = hspace_drop_pre(stencil) and not exact_nan
    land_gain = float(np.polynomial.chebyshev.chebval(-1.0, p_host))
    hot_host = (
        dataclasses.replace(stencil, pre=None, zap_nans=False)
        if drop_pre
        else stencil
    )
    scale = _laplacian_scale(spec, stencil.is_dimensional)
    n_coef = (len(_coef_arrays(hot_host))
              + int(hot_host.area is not None)
              + int(hot_host.pre is not None))

    def _build(ny, nx, dtype):
        plan = plan_passes(
            ny, _ext_geometry(nx, 16)[0], spec.n_steps, n_coef,
            hot_host.post is not None, np.dtype(dtype).itemsize,
            max_fuse=_max_fuse(halo_steps),
            halo_mult=8,  # ring DMA segments demand 8-row-aligned halos
            br_divides=None if ny % p_y else ny // p_y,
        )
        ly = _shard_plan(plan, p_y, ny, dtype)
        if ly is None:
            return None

        pass_fns = _pass_chain(plan, lambda n_ops, first, last: build_ring_pass(
            hot_host, scale, ly, nx, dtype, plan, n_ops, first, last,
            ring_axis=yax, ring_size=p_y,
            drop_pre=drop_pre, land_gain=land_gain,
        ))
        if pass_fns is None:
            return None

        def local_run(field, *exts):
            p = jnp.asarray(p_host, dtype=dtype)
            state = (field,)
            for fn, poff, n_p, first, last in pass_fns:
                args = state + ((field,) if last and not first else ())
                out = fn(p[poff : poff + n_p], exts, *args)
                state = (out,) if last else out
            return state[0]

        return _sharded_run(
            ring_mesh, yax,
            # packed=False: ring kernels keep the unpacked layout so the
            # bitwise-vs-unsharded validation stays layout-consistent
            host_ext_inputs(hot_host, plan, ny, nx, dtype, scale,
                            packed=False),
            local_run, n_fields=1,
        )

    cache = {}

    def apply_fn(field):
        """2-D compute-dtype field -> filtered, or None if this shape is
        ring-ineligible (caller falls back)."""
        ny, nx = field.shape[-2:]
        key = (ny, nx, str(field.dtype))
        if key not in cache:
            cache[key] = _build(ny, nx, field.dtype)
        entry = cache[key]
        if entry is None:
            return None
        fn, ext_dev = entry
        return fn(field, *ext_dev)

    apply_fn.shape_cache = cache  # exposed for tests
    return apply_fn


def make_ring_vector_apply(
    operator,
    spec: FilterSpec,
    mesh: Mesh,
    spatial_axes: Tuple[Optional[str], Optional[str]],
    halo_steps: Optional[int] = None,
):
    """``(u, v) -> (fu, fv)`` via per-shard ring kernels, or None.

    Vector analogue of :func:`make_ring_scalar_apply`: the coupled pass
    kernels (ops/pallas/vec_pass.py) run the GLOBAL plan per shard of a 1-D
    y-decomposition with the halo exchange done inside the kernel by
    ``make_async_remote_copy`` ring sends on the stacked (u, v) pair. Same
    eligibility gates; the stacked halo buffers carry both components so
    each pass still issues exactly two remote copies per live field.
    """
    meshed = _ring_mesh_for(mesh, spatial_axes)
    if meshed is None:
        return None
    ring_mesh, yax, p_y = meshed

    from ..ops.stencil import BGridVectorStencil, CGridVectorOperator
    from ..ops.pallas.vec_pass import (
        build_ctap_pass,
        build_vec_pass,
        host_ctap_ext_inputs,
        host_vec_ext_inputs,
        plan_ctap_passes,
        plan_vec_passes,
    )
    from ..engine import _laplacian_scale

    if isinstance(operator, BGridVectorStencil):
        is_ctap = False
    elif isinstance(operator, CGridVectorOperator):
        is_ctap = True
    else:
        return None

    p_host = np.asarray(spec.p)
    scale = _laplacian_scale(spec, operator.is_dimensional)
    taps_cache = []  # lazy: large at production sizes

    def _taps():
        if not taps_cache:
            from ..ops.ctaps import cgrid_tap_arrays

            taps_cache.append(cgrid_tap_arrays(operator))
        return taps_cache[0]

    def _build(ny, nx, dtype):
        planner = plan_ctap_passes if is_ctap else plan_vec_passes
        plan = planner(
            ny, nx, spec.n_steps, np.dtype(dtype).itemsize,
            max_fuse=_max_fuse(halo_steps),
            halo_mult=8,  # ring DMA segments demand 8-row-aligned halos
            br_divides=None if ny % p_y else ny // p_y,
        )
        ly = _shard_plan(plan, p_y, ny, dtype)
        if ly is None:
            return None

        build = build_ctap_pass if is_ctap else build_vec_pass
        pass_fns = _pass_chain(plan, lambda n_ops, first, last: build(
            ly, nx, dtype, plan, n_ops, first, last,
            zap=operator.zap_nans, ring_axis=yax, ring_size=p_y,
        ))
        if pass_fns is None:
            return None

        if is_ctap:
            ext_host = host_ctap_ext_inputs(_taps(), plan, dtype, scale,
                                            packed=False)
        else:
            ext_host = host_vec_ext_inputs(operator, plan, dtype, scale,
                                           packed=False)

        def local_run(u, v, *exts):
            # prepare/finalize are identity for both vector operators
            # (parity with the unsharded dispatcher, dispatch.py run())
            w = jnp.stack([u, v])
            p = jnp.asarray(p_host, dtype=dtype)
            state = (w,)
            for fn, poff, n_p, first, last in pass_fns:
                out = fn(p[poff : poff + n_p], exts, *state)
                state = (out,) if last else out
            acc = state[0]
            return acc[0], acc[1]

        return _sharded_run(ring_mesh, yax, ext_host, local_run, n_fields=2)

    cache = {}

    def apply_fn(u, v):
        """2-D compute-dtype (u, v) -> (fu, fv), or None if this shape is
        ring-ineligible (caller falls back)."""
        ny, nx = u.shape[-2:]
        key = (ny, nx, str(u.dtype))
        if key not in cache:
            cache[key] = _build(ny, nx, u.dtype)
        entry = cache[key]
        if entry is None:
            return None
        fn, ext_dev = entry
        return fn(u, v, *ext_dev)

    apply_fn.shape_cache = cache  # exposed for tests
    return apply_fn
