"""shard_map'd filter execution: 2-D spatial domain decomposition.

This is the capability the reference lacks entirely (its spatial dims must
fit in a single dask chunk, reference filter.py:478-486): the (y, x) field is
sharded over a ``jax.sharding.Mesh`` and the whole Chebyshev iteration runs
inside ONE ``shard_map``.

Communication is *round-based* (wide halos): instead of one ppermute per
neighbor access per step (~5 collectives/step), each round exchanges a
``reach * k``-cell halo once (two ppermute phases, corners riding the second)
and then advances the recurrence k steps purely locally on the halo-extended
block — the same trapezoid schedule the Pallas kernel uses across row blocks
(ops/pallas/cheb_pass.py), here applied across devices. The tripolar fold is
a reversed pairing permute among top-row devices with the k-row mirror rule,
and the stencil coefficients are halo-extended once per call with the seam's
n<->s / e<->w coefficient swap baked into their fold chunks.

The per-cell arithmetic inside a round is *identical* to single-device
execution (same shifted-operator form, same elementwise order), so sharded
results match unsharded ones to roundoff.

Leading batch dims stay local to each shard unless ``batch_axis`` names a
mesh axis to shard them over (the dask-parallelism analogue, but inside one
XLA program).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..engine import _compute_dtype, _laplacian_scale, _operator_dtype_cache
from ..ops.pallas.dispatch import COMPILE_ERRORS
from ..filter_spec import FilterSpec
from ..ops.stencil import BGridVectorStencil, CGridVectorOperator, ScalarStencil5
from . import halo

Array = jax.Array

# How far one operator application propagates information (cells per step):
# radius-1 5-point stencils reach 1; the C-grid viscosity operator is a
# two-stage stencil (strain then divergence) so a local-rolls implementation
# consumes 2 halo cells per application.
_REACH = {ScalarStencil5: 1, BGridVectorStencil: 1, CGridVectorOperator: 2}

# The tripolar seam reflection swaps the meaning of the stencil neighbors.
_FOLD_SWAP = {"c": "c", "n": "s", "s": "n", "e": "w", "w": "e"}


def _axis_size(mesh: Mesh, name: Optional[str]) -> int:
    if name is None:
        return 1
    return mesh.shape[name]


def _leaf_spec(leaf, yax, xax):
    """PartitionSpec for an operator leaf: spatial arrays shard like the field."""
    if hasattr(leaf, "ndim") and leaf.ndim >= 2:
        return P(*([None] * (leaf.ndim - 2)), yax, xax)
    return P()


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


def _plan_rounds(n_steps: int, reach: int, ly: int, lx: int,
                 halo_steps: Optional[int]) -> Tuple[int, ...]:
    """Split n_steps operator applications into rounds of at most k each.

    k is capped so the halo (reach*k cells) stays well under the local block
    (redundant trapezoid compute ~ (1 + 2*reach*k/l)^2) and halo slices fit.
    """
    if halo_steps is not None:
        k = max(1, halo_steps)
    else:
        k = max(1, min(8, min(ly, lx) // (4 * reach)))
    k = min(k, n_steps, max(1, min(ly, lx) // reach))
    out = []
    remaining = n_steps
    while remaining > 0:
        s = min(k, remaining)
        out.append(s)
        remaining -= s
    return tuple(out)


def _extend_scalar_stencil(
    st: ScalarStencil5, cells: int, y_axis, x_axis, keep_area: bool = False
) -> ScalarStencil5:
    """Halo-extend every spatial coefficient of a scalar stencil by ``cells``.

    On fold grids the north halo rows of the coefficients come from the seam
    partner's *swapped* coefficient (reflection maps n<->s, e<->w), which is
    what keeps intermediate trapezoid steps exact across the seam. The
    returned stencil is purely local: fold_north is cleared (the halos carry
    the seam). ``keep_area`` additionally halo-extends the area array (its
    seam mirror is itself) for the end-fused local pass, which runs prepare/
    finalize in-window; by default area is dropped (prepare/finalize act on
    core data only).
    """
    fold = st.fold_north

    def ext(v, swap_v):
        # python-float coefficients arrive as 0-d tracers through shard_map
        if v is None or isinstance(v, (int, float)) or getattr(v, "ndim", 0) < 2:
            return v
        src = None
        if fold and swap_v is not v:
            src = jnp.broadcast_to(jnp.asarray(swap_v, v.dtype), v.shape) \
                if isinstance(swap_v, (int, float)) else swap_v
        return halo.exchange_2d(v, cells, y_axis, x_axis, fold, src)

    coefs = {
        k: ext(getattr(st, k), getattr(st, _FOLD_SWAP[k]))
        for k in ("c", "n", "s", "e", "w")
    }
    return dataclasses.replace(
        st,
        **coefs,
        pre=ext(st.pre, st.pre),
        post=ext(st.post, st.post),
        area=ext(st.area, st.area) if keep_area else None,
        fold_north=False,
    )


def _extend_vector_operator(op, cells: int, y_axis, x_axis):
    """Halo-extend every array leaf of a vector operator (never fold grids)."""

    def ext(v):
        if hasattr(v, "ndim") and v.ndim >= 2:
            return halo.exchange_2d(v, cells, y_axis, x_axis)
        return v

    return jax.tree_util.tree_map(ext, op)


def _balanced(n_steps, k):
    n_pass = -(-n_steps // k)
    base, extra = divmod(n_steps, n_pass)
    return tuple(base + (1 if i < extra else 0) for i in range(n_pass))


def _plan_local_pallas(ly, lx, n_steps, n_coef, has_post, itemsize, halo_steps):
    """(cells, halo, br, rows_p, steps) for the per-shard scalar pass.

    ``cells`` = max steps per round = the device-halo width actually
    exchanged; ``halo`` = the kernel's block-trapezoid halo, rounded up so
    windows stay sublane-aligned (kernel halo may exceed cells — block
    windows just overlap further into the local domain, which is safe).
    ``br`` is capped near the extended row count so padding stays bounded.
    """
    from ..ops.pallas.cheb_pass import _VMEM_BUDGET_WIDE, _vmem_rows

    # Local-path block target: 1x1-mesh measurements drift too much
    # session-to-session (3.2-4.8x overhead on identical code) to resolve
    # br=48 vs 96; 96 kept (it matches the configuration the round-2
    # benchmark record was taken with).
    br_target = 96

    from ..ops.pallas.cheb_pass import _halo_mult

    k_max = min(halo_steps or 16, n_steps, max(1, min(ly, lx) // 2))
    for k in range(k_max, 0, -1):
        steps = _balanced(n_steps, k)
        cells = max(steps)
        hm = _halo_mult()
        halo = -(-cells // hm) * hm  # aligned window height
        # budget at the width the kernel actually runs at: the zero-padded
        # lane-aligned width (review finding r3: budgeting at the unpadded
        # cols_e overestimated budget_rows ~1.8x on narrow shards and could
        # pick a br whose real footprint exceeds vmem_limit_bytes on chip)
        from ..ops.pallas.cheb_pass import _lane_width
        cols_p = _lane_width(lx + 2 * cells, 0)
        rows_e = ly + 2 * cells
        budget_rows = _VMEM_BUDGET_WIDE // (cols_p * itemsize)
        cands = []
        cand = max(8, 8 * ((halo + 7) // 8))  # kernel needs halo <= br
        cap = min(512, 8 * ((rows_e + 7) // 8))
        while cand <= cap:
            if _vmem_rows(cand, halo, n_coef, has_post) <= budget_rows:
                cands.append(cand)
            cand += 8
        if not cands:
            continue
        # aim near the measured sweet spot rather than maximizing br
        br = min(cands, key=lambda b: (abs(b - br_target), -b))
        rows_p = -(-rows_e // br) * br
        return cells, min(br, halo), br, rows_p, steps
    return None


def local_scalar_coef_exts(
    st: ScalarStencil5,
    ly: int,
    lx: int,
    dtype,
    n_steps: int,
    lap_scale: float,
    drop_pre: bool,
    host_coef_names,
    y_axis,
    x_axis,
    halo_steps: Optional[int],
):
    """The per-shard extended-layout coefficient blocks for the local pass.

    These depend only on the stencil, local shape, dtype and plan — NOT on
    the field — so the sharded engine computes them once per (shape, dtype)
    (one shard_map'd prepare call, cached eagerly) instead of re-extending
    and re-gathering every coefficient array on every apply, which was the
    bulk of the sharded-on-1x1-mesh overhead (benchmarks/README.md).
    """
    from ..ops.pallas.cheb_pass import _lane_width, ext_blocks_jnp

    has_post = st.post is not None
    keep_pre = st.pre is not None and not drop_pre  # exact-NaN mode
    has_area = st.area is not None
    planned = _plan_local_pallas(
        ly, lx, n_steps,
        len(host_coef_names) + int(keep_pre) + int(has_area), has_post,
        np.dtype(dtype).itemsize, halo_steps,
    )
    if planned is None:
        return None
    cells, khalo, br, rows_p, _ = planned
    pad_rows = rows_p - (ly + 2 * cells)
    # zero-pad columns up to the lane tile: the kernel then runs at an
    # aligned width (measured ~1.3x on unaligned widths, see cheb_pass).
    # Pad garbage entering through the roll wrap degrades the outer halo
    # columns exactly as the pre-existing local wrap garbage did.
    cols_p = _lane_width(lx + 2 * cells, 0)

    hot = dataclasses.replace(st, pre=None) if drop_pre else st
    ext_st = _extend_scalar_stencil(hot, cells, y_axis, x_axis,
                                    keep_area=True)

    pad_cols = cols_p - (lx + 2 * cells)

    def pad(a):
        cfgpad = [(0, 0)] * (a.ndim - 2) + [(0, pad_rows), (0, pad_cols)]
        return jnp.pad(a, cfgpad) if (pad_rows or pad_cols) else a

    # Array coefficients are pre-scaled by -2*lap_scale (the pass kernel's
    # coefficient convention; pre/post/area are NOT scaled).
    neg2s = np.dtype(dtype).type(-2.0 * lap_scale)
    coef_exts = [
        ext_blocks_jnp(
            pad(getattr(ext_st, k)).astype(dtype) * neg2s, br, khalo
        )
        for k in host_coef_names
    ]
    if keep_pre:
        coef_exts.append(
            ext_blocks_jnp(pad(ext_st.pre).astype(dtype), br, khalo)
        )
    if has_post:
        coef_exts.append(
            ext_blocks_jnp(pad(ext_st.post).astype(dtype), br, khalo)
        )
    if has_area:
        # end fusion: prepare/finalize run in-window in the local pass
        coef_exts.append(
            ext_blocks_jnp(pad(ext_st.area).astype(dtype), br, khalo)
        )
    from ..ops.pallas.cheb_pass import _PACK_COEF

    if _PACK_COEF and len(coef_exts) >= 2:
        # one contiguous (nb, n_ext, win, wx) chunk per block — must match
        # the kernel's packed BlockSpec (cheb_pass._build_pass_call)
        return (jnp.stack(coef_exts, axis=1),)
    return tuple(coef_exts)


def local_pallas_rounds_scalar(
    st: ScalarStencil5,
    field: Array,
    p_host,
    n_steps: int,
    lap_scale: float,
    drop_pre: bool,
    land_gain: float,
    host_coef_names,
    host_consts,
    y_axis,
    x_axis,
    halo_steps: Optional[int],
    coef_exts=None,
) -> Optional[Array]:
    """Wide-halo rounds with the temporally blocked Pallas pass as compute.

    Per round: one halo exchange extends the carries by k cells (device
    ppermutes on sharded axes, local periodic wrap — including the tripolar
    fold — on unsharded ones); the extended and row-padded block then runs
    the periodic trapezoid kernel (ops/pallas/cheb_pass.build_local_pass) —
    wrap/pad garbage stays confined to the halo zone, which is re-filled by
    the next exchange and sliced off at the end.

    This is both the per-shard local compute of the shard_map engine AND,
    with both axes unsharded, the single-device path for shapes whose rows
    don't divide into sublane-aligned blocks (the row padding frees the
    kernel from any divisibility constraint on ny).
    """
    from ..ops.pallas.cheb_pass import build_local_pass, ext_blocks_jnp

    dtype = field.dtype
    ly, lx = field.shape[-2:]
    has_post = st.post is not None
    keep_pre = st.pre is not None and not drop_pre  # exact-NaN mode
    has_area = st.area is not None
    planned = _plan_local_pallas(
        ly, lx, n_steps,
        len(host_coef_names) + int(keep_pre) + int(has_area), has_post,
        np.dtype(dtype).itemsize, halo_steps,
    )
    if planned is None:
        return None
    cells, khalo, br, rows_p, rounds = planned
    from ..ops.pallas.cheb_pass import _lane_width
    cols_e = lx + 2 * cells
    cols_p = _lane_width(cols_e, 0)  # lane-aligned kernel width (zero pad)
    pad_rows = rows_p - (ly + 2 * cells)
    pad_cols = cols_p - cols_e

    def pad(a):
        cfgpad = [(0, 0)] * (a.ndim - 2) + [(0, pad_rows), (0, pad_cols)]
        return jnp.pad(a, cfgpad) if (pad_rows or pad_cols) else a

    if coef_exts is None:
        # build in-trace (single-device pad-to-block path; the sharded
        # engine passes cached prepared blocks instead)
        coef_exts = local_scalar_coef_exts(
            st, ly, lx, dtype, n_steps, lap_scale, drop_pre,
            host_coef_names, y_axis, x_axis, halo_steps,
        )

    # END FUSION (round-3): the first pass consumes the RAW halo-extended
    # field and performs prepare (*area) + h-space masking in-window; the
    # last pass performs the land reconstruction + finalize (/area). The
    # XLA prologue/epilogue that used to bracket the rounds (prepare, mask,
    # where-reconstruction, finalize — ~4 full-array passes) is gone; the
    # area/pre/post streams ride the prepared extended coefficient blocks.
    fold = st.fold_north
    p = jnp.asarray(p_host, dtype=dtype)
    core = lambda a: a[..., cells : cells + ly, cells : cells + lx]

    state = None
    acc = None
    ext_raw = None
    off = 0
    for m, n_ops in enumerate(rounds):
        first = m == 0
        last = m == len(rounds) - 1
        pass_fn = build_local_pass(
            rows_p, cols_p, dtype, br, khalo, n_ops,
            host_coef_names, host_consts, has_post,
            zap=(False if drop_pre else st.zap_nans),
            lap_scale=lap_scale, first_pass=first, last_pass=last,
            has_pre=keep_pre, fuse_ends=True, has_area=has_area,
            drop_pre=drop_pre, land_gain=land_gain,
        )
        if first:
            ext_raw = pad(halo.exchange_2d(field, cells, y_axis, x_axis, fold))
            fields = (ext_raw,)
        else:
            cur, prev = state
            stacked = jnp.stack([cur, prev])
            ext = pad(halo.exchange_2d(stacked, cells, y_axis, x_axis, fold))
            fields = (ext[0], ext[1], acc)
            if last and drop_pre:
                fields = fields + (ext_raw,)  # raw field for reconstruction
        n_p = n_ops + 1 if first else n_ops
        out = pass_fn(p[off : off + n_p], coef_exts, *fields)
        off += n_p
        if last:
            acc = out
        else:
            state = (core(out[0]), core(out[1]))
            acc = out[2]

    return core(acc)


def make_sharded_scalar_apply(
    stencil: ScalarStencil5,
    spec: FilterSpec,
    mesh: Mesh,
    spatial_axes: Tuple[Optional[str], Optional[str]],
    use_pallas: Optional[bool] = None,
    batch_axis: Optional[str] = None,
    halo_steps: Optional[int] = None,
    exact_nan: bool = False,
):
    """Compile ``field -> filtered`` with the domain sharded over ``mesh``.

    The local compute inside each round is either the XLA-fused recurrence or
    the temporally blocked Pallas pass (``use_pallas``: None = auto on TPU),
    fed by the same device-level wide-halo exchange.
    """
    yax, xax = spatial_axes
    y_axis = (yax, _axis_size(mesh, yax))
    x_axis = (xax, _axis_size(mesh, xax))
    lap_scale = _laplacian_scale(spec, stencil.is_dimensional)
    p_host = np.asarray(spec.p)

    op_specs = jax.tree_util.tree_map(lambda l: _leaf_spec(l, yax, xax), stencil)
    field_spec = P(batch_axis, yax, xax)

    # Pallas eligibility, decided from the HOST stencil (shard_map turns its
    # python-float leaves into 0-d tracers): mask pattern must be h-space
    # eliminable or absent, exactly as in ops.pallas.dispatch.
    host_coef_names = tuple(
        k for k in ("c", "n", "s", "e", "w")
        if not isinstance(getattr(stencil, k), (int, float))
    )
    host_consts = {
        k: float(getattr(stencil, k)) for k in ("c", "n", "s", "e", "w")
        if k not in host_coef_names
    }

    from ..ops.stencil import hspace_drop_pre

    drop_pre = hspace_drop_pre(stencil) and not exact_nan
    # pre is either h-space eliminated or streamed through the kernel
    # (exact-NaN mode), so every masking pattern is Pallas-eligible
    pallas_eligible = True
    land_gain = float(np.polynomial.chebyshev.chebval(-1.0, p_host))

    def _pallas_on(dtype) -> bool:
        from ..ops.pallas.dispatch import _pallas_dtype_ok

        # the sharded local planners assume f32 sublane tiles; the
        # experimental bf16 opt-in covers the single-device path only
        if np.dtype(dtype).itemsize < 4:
            return False
        if not pallas_eligible or not _pallas_dtype_ok(dtype):
            return False
        if use_pallas is not None:
            return use_pallas
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False

    def _local_xla(st: ScalarStencil5, field: Array) -> Array:
        dtype = field.dtype
        ly, lx = field.shape[-2:]
        p = jnp.asarray(p_host, dtype=dtype)
        rounds = _plan_rounds(spec.n_steps, 1, ly, lx, halo_steps)
        cells = max(rounds)

        ext_st = _extend_scalar_stencil(st, cells, y_axis, x_axis)
        core = lambda a: a[..., cells:-cells, cells:-cells]

        def shifted(t: Array) -> Array:
            # identical form to engine.scalar_filter_apply, on extended blocks
            lap = ext_st.laplacian(
                t, shift=jnp.roll, north=lambda g: jnp.roll(g, -1, -2)
            )
            return -t - lap_scale * lap

        fold = st.fold_north
        fbar = st.prepare(field)

        acc = None
        cur = prev = None
        off = 0
        for m, n_ops in enumerate(rounds):
            if m == 0:
                prev = halo.exchange_2d(fbar, cells, y_axis, x_axis, fold)
                cur = shifted(prev)
                acc = p[0] * core(prev) + p[1] * core(cur)
                n_rec, p_off = n_ops - 1, 2
            else:
                stacked = jnp.stack([core(cur), core(prev)])
                ext = halo.exchange_2d(stacked, cells, y_axis, x_axis, fold)
                cur, prev = ext[0], ext[1]
                n_rec, p_off = n_ops, 0
            for j in range(n_rec):
                nxt = 2.0 * shifted(cur) - prev
                acc = acc + p[off + p_off + j] * core(nxt)
                prev, cur = cur, nxt
            off += n_ops + 1 if m == 0 else n_ops

        return st.finalize(acc)

    # Two compiled paths. The Pallas path takes the PREPARED per-shard
    # extended coefficient blocks as extra sharded arguments — they are
    # static per (stencil, shape, dtype), so they are computed once by a
    # separate shard_map'd prepare call and cached eagerly on device
    # (re-extending + re-gathering every coefficient per apply was the bulk
    # of the sharded overhead, benchmarks/README.md).
    keep_pre = stencil.pre is not None and not drop_pre
    n_exts = (len(host_coef_names) + int(keep_pre)
              + int(stencil.post is not None)
              + int(stencil.area is not None))  # area rides the ext blocks
    # packed coefficient streams (cheb_pass._PACK_COEF, snapshotted at
    # apply-construction time): >= 2 ext windows ride as one stacked
    # rank-4 (nb, n_ext, win, wx) array (local_scalar_coef_exts)
    from ..ops.pallas.cheb_pass import _PACK_COEF as _pack_coef

    if _pack_coef and n_exts >= 2:
        n_exts = 1
        ext_spec = P(yax, None, None, xax)
    else:
        ext_spec = P(yax, None, xax)

    _plan_cache = {}

    def _feasible(ly, lx, dtype):
        # cached: the planner's candidate sweep is pure Python and fully
        # determined by (ly, lx, dtype) — without the cache it re-ran on
        # the eager hot path of EVERY apply (review finding)
        key = (ly, lx, str(dtype))
        if key not in _plan_cache:
            _plan_cache[key] = _plan_local_pallas(
                ly, lx, spec.n_steps,
                len(host_coef_names) + int(keep_pre)
                + int(stencil.area is not None),
                stencil.post is not None, np.dtype(dtype).itemsize,
                halo_steps,
            )
        return _plan_cache[key]

    # On an actually-distributed mesh the prepared exts remove the
    # per-apply coefficient halo COLLECTIVES; on a 1x1/unsharded-spatial
    # mesh the in-trace build is faster (XLA fuses it and lays the blocks
    # out for the Pallas call; measured 2.7 vs 4.7 ms on the headline).
    _distributed = y_axis[1] > 1 or x_axis[1] > 1

    def _local_pallas(st: ScalarStencil5, field: Array, *coef_exts) -> Array:
        fn = lambda f: local_pallas_rounds_scalar(
            st, f, p_host, spec.n_steps, lap_scale, drop_pre, land_gain,
            host_coef_names, host_consts, y_axis, x_axis, halo_steps,
            coef_exts=coef_exts if coef_exts else None,
        )
        return jax.vmap(fn)(field) if field.ndim == 3 else fn(field)

    _pl_jit = {}

    def _pallas_jitted():
        key = "dist" if _distributed else "inline"
        if key not in _pl_jit:
            if _distributed:
                fn = shard_map(
                    _local_pallas,
                    mesh=mesh,
                    in_specs=(op_specs, field_spec) + (ext_spec,) * n_exts,
                    out_specs=field_spec,
                    check_vma=False,
                )
            else:
                fn = shard_map(
                    lambda st, f: _local_pallas(st, f),
                    mesh=mesh,
                    in_specs=(op_specs, field_spec),
                    out_specs=field_spec,
                    check_vma=False,
                )
            _pl_jit[key] = jax.jit(fn)
        return _pl_jit[key]

    _ext_cache = {}

    def _exts_for(ly, lx, dtype, st):
        key = (ly, lx, str(dtype))
        if key not in _ext_cache:
            prep = shard_map(
                lambda s: local_scalar_coef_exts(
                    s, ly, lx, dtype, spec.n_steps, lap_scale, drop_pre,
                    host_coef_names, y_axis, x_axis, halo_steps,
                ),
                mesh=mesh,
                in_specs=(op_specs,),
                out_specs=(ext_spec,) * n_exts,
                check_vma=False,
            )
            exts = jax.jit(prep)(st)
            jax.block_until_ready(exts)
            _ext_cache[key] = exts
        return _ext_cache[key]

    # The stencil enters as a jit argument (constants would be serialized
    # into the compile payload), converted to device arrays ONCE PER COMPUTE
    # DTYPE — passing host numpy would re-transfer every coefficient on every
    # call, and leaving f64 coefficients against f32 fields would promote the
    # whole pipeline (and crash the Pallas kernels' f32 out_shapes).
    op_for = _operator_dtype_cache(stencil)

    _primary = [None]  # a callable = injected override (tests)
    _pinned = set()  # (ly, lx, dtype) whose kernel failed to compile

    # In-kernel ring halo exchange (parallel/ring.py): the compute/comm
    # overlap path for 1-D y-sharded meshes — built lazily, None = tried
    # and ineligible / disabled, False sentinel before first attempt.
    _ring = [False]

    def _ring_for():
        if _ring[0] is False:
            from . import ring as _ring_mod

            _ring[0] = None
            if batch_axis is None and _ring_mod.ring_enabled():
                _ring[0] = _ring_mod.make_ring_scalar_apply(
                    stencil, spec, mesh, spatial_axes, exact_nan,
                    halo_steps=halo_steps)
        return _ring[0]

    def apply_fn(field):
        arr, restore = _normalize(field)
        # the local compute runs at the field's dtype, so integer inputs are
        # promoted here (the unsharded engine promotes in-trace instead)
        dtype = _compute_dtype(arr.dtype)
        if arr.dtype != dtype:
            arr = arr.astype(dtype)
        st = op_for(dtype)
        ly = arr.shape[-2] // y_axis[1]
        lx = arr.shape[-1] // x_axis[1]
        key = (ly, lx, str(dtype))
        # _normalize always yields a leading batch dim; ring handles the
        # single-field case (true batches keep the round-based path)
        if (arr.shape[0] == 1 and _primary[0] is None
                and ("ring",) + key not in _pinned and _pallas_on(dtype)):
            rf = _ring_for()
            if rf is not None:
                try:
                    out = rf(arr[0])
                    if out is not None:
                        return restore(out[None])
                except COMPILE_ERRORS:
                    from ..utils.telemetry import record_fallback

                    _pinned.add(("ring",) + key)
                    record_fallback(
                        "ring_pallas_compile_fallback",
                        f"ring halo-exchange kernel for shape "
                        f"{arr.shape[-2:]} dtype {arr.dtype} failed to "
                        f"compile; falling back to round-based exchange",
                    )
        use_pl = (
            key not in _pinned
            and _pallas_on(dtype)
            and _feasible(ly, lx, dtype) is not None
        )
        if use_pl:
            try:
                exts = _exts_for(ly, lx, dtype, st) if _distributed else ()
                fn = _primary[0] or _pallas_jitted()
                return restore(fn(st, arr, *exts))
            except COMPILE_ERRORS:
                # VMEM planning is a model, not ground truth: if the local
                # Pallas kernel fails to compile on this chip, pin THIS
                # shape/dtype to XLA rounds permanently (warned + counted;
                # other shapes keep the fast path).
                from ..utils.telemetry import record_fallback

                _pinned.add(key)
                record_fallback(
                    "sharded_pallas_compile_fallback",
                    f"sharded local Pallas compute for shape "
                    f"{arr.shape[-2:]} dtype {arr.dtype} failed to compile; "
                    f"pinned to sharded XLA rounds",
                )
        return restore(_fallback_jitted()(st, arr))

    apply_fn._primary = _primary  # exposed for tests/fault injection
    apply_fn._ring = _ring  # exposed for tests/fault injection
    apply_fn._pinned = _pinned
    apply_fn._pl_jit = _pl_jit  # exposed for tests (collective census)
    apply_fn._ext_cache = _ext_cache
    _fb = []
    apply_fn._fb = _fb  # exposed for the collective census

    def _fallback_jitted():
        if not _fb:
            fb = shard_map(
                lambda st, f: _local_xla(st, f),
                mesh=mesh,
                in_specs=(op_specs, field_spec),
                out_specs=field_spec,
                check_vma=False,
            )
            _fb.append(jax.jit(fb))
        return _fb[0]

    return apply_fn


def _plan_local_coupled(ly, lx, n_steps, n_ext, itemsize, halo_steps,
                        br_target=None):
    """(cells, halo, br, rows_p, steps) for the per-shard coupled pass
    (same conventions as :func:`_plan_local_pallas`).

    Uses the wide VMEM budget (the coupled pass builders lift Mosaic's
    scoped-vmem cap, ops/pallas/vec_pass.py) and aims br at the operator's
    measured sweet spot instead of growing it to the cap."""
    from ..ops.pallas.cheb_pass import _halo_mult
    from ..ops.pallas.vec_pass import (
        _BR_MAX,
        _BR_TARGET_CTAP,
        _VMEM_BUDGET_WIDE,
        _coupled_rows,
    )

    if br_target is None:
        br_target = _BR_TARGET_CTAP

    k_max = min(halo_steps or 16, n_steps, max(1, min(ly, lx) // 2))
    for k in range(k_max, 0, -1):
        steps = _balanced(n_steps, k)
        cells = max(steps)
        # align like the scalar local planner: the DMA-window gate needs
        # halo % 8 == 0 when _DMA_WINDOWS is on (review finding r3: a
        # 4-aligned halo silently failed the gate and A/B'd the wrong path)
        hm = _halo_mult(itemsize)
        halo = -(-cells // hm) * hm
        from ..ops.pallas.cheb_pass import _lane_width
        cols_p = _lane_width(lx + 2 * cells, 0)  # zero-padded kernel width
        rows_e = ly + 2 * cells
        budget_rows = (_VMEM_BUDGET_WIDE - (1 << 20)) // (cols_p * itemsize)
        cands = []
        cand = max(8, 8 * ((halo + 7) // 8))
        cap = min(_BR_MAX, 8 * ((rows_e + 7) // 8))
        while cand <= cap:
            if _coupled_rows(cand, halo, n_ext, 14) <= budget_rows:
                cands.append(cand)
            cand += 8
        if not cands:
            continue
        br = min(cands, key=lambda b: (abs(b - br_target), -b))
        rows_p = -(-rows_e // br) * br
        return cells, min(br, halo), br, rows_p, steps
    return None


def make_sharded_vector_apply(
    operator,
    spec: FilterSpec,
    mesh: Mesh,
    spatial_axes: Tuple[Optional[str], Optional[str]],
    use_pallas: Optional[bool] = None,
    batch_axis: Optional[str] = None,
    halo_steps: Optional[int] = None,
):
    """Compile ``(u, v) -> (filtered_u, filtered_v)`` sharded over ``mesh``.

    The C-grid operator runs in its tap-expanded form (ops/ctaps.py): reach 1
    instead of the staged form's 2, so each round's halo — and with it the
    exchanged volume and the redundant trapezoid compute — is half as wide.
    """
    yax, xax = spatial_axes
    y_axis = (yax, _axis_size(mesh, yax))
    x_axis = (xax, _axis_size(mesh, xax))
    lap_scale = _laplacian_scale(spec, operator.is_dimensional)
    p_host = np.asarray(spec.p)

    is_ctap = isinstance(operator, CGridVectorOperator)
    if is_ctap:
        from ..ops.ctaps import apply_taps, cgrid_tap_arrays  # noqa: F401

        # the taps ARE the sharded operand (they shard like the field)
        op_operand = cgrid_tap_arrays(operator)
        reach = 1
    else:
        op_operand = operator
        reach = _REACH.get(type(operator))
        if reach is None:
            raise ValueError(
                f"Operator type {type(operator).__name__} is not supported "
                "with mesh=: only framework stencil types can be sharded "
                "(Filter rejects protocol operators at construction)."
            )

    op_specs = jax.tree_util.tree_map(
        lambda l: _leaf_spec(l, yax, xax), op_operand
    )
    field_spec = P(batch_axis, yax, xax)

    # Coefficient metadata for the per-shard Pallas pass (runtime coef exts).
    from ..ops.pallas.vec_pass import _BR_TARGET_CTAP, _BR_TARGET_VEC

    if is_ctap:
        from ..ops.ctaps import CTAPS as _CT

        _coef_keys = tuple(name for name, *_ in _CT)
        _br_tgt = _BR_TARGET_CTAP
    elif isinstance(operator, BGridVectorStencil):
        from ..ops.pallas.vec_pass import _DIFF, _MIX

        _coef_keys = (*_DIFF, *_MIX)
        _br_tgt = _BR_TARGET_VEC  # measured B-grid sweet spot (br=40)
    else:
        _coef_keys = None
        _br_tgt = None

    def _pallas_on(dtype) -> bool:
        from ..ops.pallas.dispatch import _pallas_dtype_ok

        if np.dtype(dtype).itemsize < 4:  # see the scalar gate
            return False
        if _coef_keys is None or not _pallas_dtype_ok(dtype):
            return False
        if use_pallas is not None:
            return use_pallas
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False

    def _local_coef_exts(op, ly, lx, dtype):
        """Per-shard extended coefficient blocks (static per shape/dtype;
        computed once by the prepare shard_map and cached — the 10-18
        gathered tap/coefficient streams dominated the per-apply overhead)."""
        from ..ops.pallas.cheb_pass import ext_blocks_jnp

        planned = _plan_local_coupled(
            ly, lx, spec.n_steps, len(_coef_keys),
            np.dtype(dtype).itemsize, halo_steps, br_target=_br_tgt,
        )
        cells, khalo, br, rows_p, _ = planned
        pad_rows = rows_p - (ly + 2 * cells)
        # zero-pad columns up to the lane tile (same scheme as the scalar
        # local path: the kernel runs at an aligned width; pad garbage enters
        # only via roll wrap and degrades the discarded halo columns)
        from ..ops.pallas.cheb_pass import _lane_width
        pad_cols = _lane_width(lx + 2 * cells, 0) - (lx + 2 * cells)

        def pad(a):
            cfgpad = [(0, 0)] * (a.ndim - 2) + [(0, pad_rows), (0, pad_cols)]
            return jnp.pad(a, cfgpad) if (pad_rows or pad_cols) else a

        ext_op = _extend_vector_operator(op, cells, y_axis, x_axis)
        npdt = np.dtype(dtype)
        neg2s = npdt.type(-2.0 * lap_scale)
        if is_ctap:
            coef_src = {k: ext_op[k] for k in _coef_keys}
        else:
            coef_src = {k: getattr(ext_op, k) for k in _coef_keys}
        exts = tuple(
            ext_blocks_jnp(pad(coef_src[k]).astype(dtype) * neg2s, br, khalo)
            for k in _coef_keys
        )
        from ..ops.pallas.vec_pass import _PACK_COEF

        if _PACK_COEF:
            # one contiguous (nb, n_ext, win, wx) chunk per block — must
            # match the kernel's packed BlockSpec (vec_pass._ext_layout)
            return (jnp.stack(exts, axis=1),)
        return exts

    def _local_pallas_2d(op, u: Array, v: Array, coef_exts=None):
        """Rounds with the coupled trapezoid pass as local compute (vector
        analogue of the scalar path: exchange k-cell halos, pad, run the
        periodic pass kernel over the extended local block, slice the core).
        Both operator forms are reach-1 in kernel form."""
        from ..ops.pallas.vec_pass import build_ctap_pass, build_vec_pass
        from ..ops.pallas.cheb_pass import PassPlan

        dtype = u.dtype
        ly, lx = u.shape[-2:]
        planned = _plan_local_coupled(
            ly, lx, spec.n_steps, len(_coef_keys),
            np.dtype(dtype).itemsize, halo_steps, br_target=_br_tgt,
        )
        cells, khalo, br, rows_p, rounds = planned
        from ..ops.pallas.cheb_pass import _lane_width
        cols_p = _lane_width(lx + 2 * cells, 0)  # lane-aligned kernel width
        pad_rows = rows_p - (ly + 2 * cells)
        pad_cols = cols_p - (lx + 2 * cells)
        plan = PassPlan(br=br, halo=khalo, steps=rounds)

        def pad(a):
            cfgpad = [(0, 0)] * (a.ndim - 2) + [(0, pad_rows), (0, pad_cols)]
            return jnp.pad(a, cfgpad) if (pad_rows or pad_cols) else a

        if coef_exts is None:
            coef_exts = _local_coef_exts(op, ly, lx, dtype)

        p = jnp.asarray(p_host, dtype=dtype)
        core = lambda a: a[..., cells : cells + ly, cells : cells + lx]
        build = build_ctap_pass if is_ctap else build_vec_pass

        state = None
        acc = None
        off = 0
        for m, n_ops in enumerate(rounds):
            first = m == 0
            last = m == len(rounds) - 1
            pass_fn = build(rows_p, cols_p, dtype, plan, n_ops, first, last,
                            zap=operator.zap_nans)
            if first:
                w0 = jnp.stack([u, v]) if is_ctap \
                    else jnp.stack(op_prepare(op, u, v))
                ext = pad(halo.exchange_2d(w0, cells, y_axis, x_axis))
                fields = (ext,)
            else:
                w1, w2 = state
                stacked = jnp.concatenate([w1, w2])  # (4, ly, lx)
                ext = halo.exchange_2d(stacked, cells, y_axis, x_axis)
                fields = (pad(ext[:2]), pad(ext[2:]), acc)
            n_p = n_ops + 1 if first else n_ops
            out = pass_fn(p[off : off + n_p], coef_exts, *fields)
            off += n_p
            if last:
                acc = out
            else:
                state = (core(out[0]), core(out[1]))
                acc = out[2]

        res = core(acc)
        return res[0], res[1]

    def op_prepare(op, u, v):
        return op.prepare(u, v)

    _distributed = y_axis[1] > 1 or x_axis[1] > 1

    def _local_pl(op, u: Array, v: Array, *coef_exts) -> Tuple[Array, Array]:
        fn = lambda uu, vv: _local_pallas_2d(
            op, uu, vv, coef_exts=coef_exts if coef_exts else None)
        if u.ndim == 3:
            return jax.vmap(fn)(u, v)
        return fn(u, v)

    def _local_xla(op, u: Array, v: Array) -> Tuple[Array, Array]:
        dtype = u.dtype
        ly, lx = u.shape[-2:]
        p = jnp.asarray(p_host, dtype=dtype)
        rounds = _plan_rounds(spec.n_steps, reach, ly, lx, halo_steps)
        cells = max(rounds) * reach

        ext_op = _extend_vector_operator(op, cells, y_axis, x_axis)
        core = lambda a: a[..., cells:-cells, cells:-cells]

        if is_ctap:
            # honor operator.zap_nans like the unsharded engine and the
            # sharded Pallas local path (review finding: unconditional
            # scrubbing made sharded != unsharded for zap_nans=False)
            def lap_fn(tu, tv):
                if operator.zap_nans:
                    tu, tv = jnp.nan_to_num(tu), jnp.nan_to_num(tv)
                return apply_taps(ext_op, tu, tv)
        else:
            def lap_fn(tu, tv):
                return ext_op.laplacian(tu, tv, shift=jnp.roll)

        def shifted(tu: Array, tv: Array) -> Tuple[Array, Array]:
            lu, lv = lap_fn(tu, tv)
            return -tu - lap_scale * lu, -tv - lap_scale * lv

        if is_ctap:
            u0, v0 = u, v  # C-grid prepare/finalize are identity
        else:
            u0, v0 = op.prepare(u, v)

        uacc = vacc = None
        ucur = vcur = uprev = vprev = None
        off = 0
        for m, n_ops in enumerate(rounds):
            if m == 0:
                ext = halo.exchange_2d(jnp.stack([u0, v0]), cells, y_axis, x_axis)
                uprev, vprev = ext[0], ext[1]
                ucur, vcur = shifted(uprev, vprev)
                uacc = p[0] * core(uprev) + p[1] * core(ucur)
                vacc = p[0] * core(vprev) + p[1] * core(vcur)
                n_rec, p_off = n_ops - 1, 2
            else:
                stacked = jnp.stack([core(ucur), core(vcur), core(uprev), core(vprev)])
                ext = halo.exchange_2d(stacked, cells, y_axis, x_axis)
                ucur, vcur, uprev, vprev = ext[0], ext[1], ext[2], ext[3]
                n_rec, p_off = n_ops, 0
            for j in range(n_rec):
                su, sv = shifted(ucur, vcur)
                unxt = 2.0 * su - uprev
                vnxt = 2.0 * sv - vprev
                uacc = uacc + p[off + p_off + j] * core(unxt)
                vacc = vacc + p[off + p_off + j] * core(vnxt)
                uprev, ucur = ucur, unxt
                vprev, vcur = vcur, vnxt
            off += n_ops + 1 if m == 0 else n_ops

        return (uacc, vacc) if is_ctap else op.finalize(uacc, vacc)

    # packed coefficient streams (vec_pass._PACK_COEF, snapshotted at
    # apply-construction time): one stacked (nb, n_ext, win, wx) ext per
    # operator instead of n_ext separate rank-3 layouts
    from ..ops.pallas.vec_pass import _PACK_COEF as _pack_coef

    if _coef_keys is not None and _pack_coef:
        n_exts = 1
        ext_spec = P(yax, None, None, xax)
    else:
        n_exts = len(_coef_keys) if _coef_keys is not None else 0
        ext_spec = P(yax, None, xax)

    _pl_jit = {}

    def _pallas_jitted():
        key = "dist" if _distributed else "inline"
        if key not in _pl_jit:
            if _distributed:
                fn = shard_map(
                    _local_pl,
                    mesh=mesh,
                    in_specs=(op_specs, field_spec, field_spec)
                    + (ext_spec,) * n_exts,
                    out_specs=(field_spec, field_spec),
                    check_vma=False,
                )
            else:
                fn = shard_map(
                    lambda op, u, v: _local_pl(op, u, v),
                    mesh=mesh,
                    in_specs=(op_specs, field_spec, field_spec),
                    out_specs=(field_spec, field_spec),
                    check_vma=False,
                )
            _pl_jit[key] = jax.jit(fn)
        return _pl_jit[key]

    _ext_cache = {}

    def _exts_for(ly, lx, dtype, op):
        key = (ly, lx, str(dtype))
        if key not in _ext_cache:
            prep = shard_map(
                lambda o: _local_coef_exts(o, ly, lx, dtype),
                mesh=mesh,
                in_specs=(op_specs,),
                out_specs=(ext_spec,) * n_exts,
                check_vma=False,
            )
            exts = jax.jit(prep)(op)
            jax.block_until_ready(exts)
            _ext_cache[key] = exts
        return _ext_cache[key]

    op_for = _operator_dtype_cache(op_operand)

    _fb = []

    def _fallback_jitted():
        if not _fb:
            fb = shard_map(
                lambda op, u, v: _local_xla(op, u, v),
                mesh=mesh,
                in_specs=(op_specs, field_spec, field_spec),
                out_specs=(field_spec, field_spec),
                check_vma=False,
            )
            _fb.append(jax.jit(fb))
        return _fb[0]

    _primary = [None]  # a callable = injected override (tests)
    _pinned = set()  # (ly, lx, dtype) whose kernel failed to compile
    _plan_cache = {}

    # In-kernel ring halo exchange (parallel/ring.py): the compute/comm
    # overlap path for 1-D y-sharded meshes — built lazily, None = tried
    # and ineligible / disabled, False sentinel before first attempt.
    _ring = [False]

    def _ring_for():
        if _ring[0] is False:
            from . import ring as _ring_mod

            _ring[0] = None
            if batch_axis is None and _ring_mod.ring_enabled():
                _ring[0] = _ring_mod.make_ring_vector_apply(
                    operator, spec, mesh, spatial_axes,
                    halo_steps=halo_steps)
        return _ring[0]

    def apply_fn(u, v):
        u3, restore = _normalize(u)
        v3, _ = _normalize(v)
        # promote both components to the common floating compute dtype (the
        # local compute runs at the fields' dtype; mixed/integer inputs must
        # not truncate coefficients or compute in ints)
        dtype = _compute_dtype(u3.dtype, v3.dtype)
        if u3.dtype != dtype:
            u3 = u3.astype(dtype)
        if v3.dtype != dtype:
            v3 = v3.astype(dtype)
        op = op_for(dtype)
        ly = u3.shape[-2] // y_axis[1]
        lx = u3.shape[-1] // x_axis[1]
        key = (ly, lx, str(dtype))
        # _normalize always yields a leading batch dim; ring handles the
        # single-pair case (true batches keep the round-based path)
        if (u3.shape[0] == 1 and _primary[0] is None
                and ("ring",) + key not in _pinned and _pallas_on(dtype)):
            rf = _ring_for()
            if rf is not None:
                try:
                    res = rf(u3[0], v3[0])
                    if res is not None:
                        fu, fv = res
                        return restore(fu[None]), restore(fv[None])
                except COMPILE_ERRORS:
                    from ..utils.telemetry import record_fallback

                    _pinned.add(("ring",) + key)
                    record_fallback(
                        "ring_pallas_compile_fallback",
                        f"ring halo-exchange vector kernel for shape "
                        f"{u3.shape[-2:]} dtype {u3.dtype} failed to "
                        f"compile; falling back to round-based exchange",
                    )
        if key not in _plan_cache:  # see the scalar _feasible cache
            _plan_cache[key] = _plan_local_coupled(
                ly, lx, spec.n_steps, len(_coef_keys),
                np.dtype(dtype).itemsize, halo_steps, br_target=_br_tgt)
        use_pl = (
            key not in _pinned
            and _pallas_on(dtype)
            and _plan_cache[key] is not None
        )
        if use_pl:
            try:
                exts = _exts_for(ly, lx, dtype, op) if _distributed else ()
                fn = _primary[0] or _pallas_jitted()
                fu, fv = fn(op, u3, v3, *exts)
                return restore(fu), restore(fv)
            except COMPILE_ERRORS:
                from ..utils.telemetry import record_fallback

                _pinned.add(key)
                record_fallback(
                    "sharded_pallas_compile_fallback",
                    f"sharded local Pallas vector compute for shape "
                    f"{u3.shape[-2:]} dtype {u3.dtype} failed to compile; "
                    f"pinned to sharded XLA rounds",
                )
        fu, fv = _fallback_jitted()(op, u3, v3)
        return restore(fu), restore(fv)

    apply_fn._primary = _primary  # exposed for tests/fault injection
    apply_fn._ring = _ring  # exposed for tests/fault injection
    apply_fn._pinned = _pinned
    apply_fn._pl_jit = _pl_jit  # exposed for tests (collective census)
    apply_fn._ext_cache = _ext_cache
    apply_fn._fb = _fb  # exposed for the collective census
    return apply_fn
