"""Temporally blocked Pallas passes for the coupled vector filters.

Same trapezoid schedule as the scalar pass (cheb_pass.py), for operators on a
(u, v) pair. The pair rides as one stacked (2, ny, nx) array so every block
carries both components and each coefficient array streams once per pass from
a pre-gathered (nb, br+2H, nx) extended layout. One shared pass builder
(:func:`_build_coupled_pass`) hosts the trapezoid/recurrence scaffolding; the
two operators supply only their contraction body:

  - B-grid (reference kernels.py:702-840): a diffusion 5-point set applied to
    each component plus a mixing 5-point set coupling u<->v (10 arrays).
  - C-grid (reference kernels.py:591-699): the tap-expanded coupled 9-point
    stencil from ops/ctaps.py (18 arrays) — the two-stage strain/divergence
    form collapsed into a single reach-1 contraction.

Coefficient convention (same as the scalar pass): all coefficient arrays
are pre-scaled by ``-2*lap_scale`` by the host_* builders, so the recurrence
is

    lap'(t) = sum(X' * t_X),   A t = -t + 0.5*lap'(t),
    t_next = -2*t + lap'(t) - t_prev.

(A center-fold variant — absorbing the -2*t into the center coefficients —
was tried in round 2 and REVERTED: the folded term acts on the
nan_to_num-scrubbed field instead of the raw one, so a NaN cell's T_k
becomes finite and its whole neighborhood diverges from the XLA engine,
violating the Pallas==XLA parity invariant; the measured speed contribution
was within noise since these kernels are stream-bound.)

Both operators are doubly periodic with no land mask (parity with the
reference); NaNs are scrubbed per step inside the window, matching the
engine's nan_to_num semantics.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ctaps import CTAPS
from ..stencil import BGridVectorStencil
from . import cheb_pass as _cp
from .cheb_pass import (
    _VMEM_BUDGET_WIDE,
    _VMEM_LIMIT_BYTES,
    _ext_geometry,
    _halo_mult,
    PassPlan,
    ext_blocks_np,
)

# B-grid: diffusion set (applied to each component) and mixing set (u<->v).
_DIFF = ("cc", "dun", "dus", "due", "duw")
_MIX = ("dmc", "dmn", "dms", "dme", "dmw")
_CTAP_NAMES = tuple(name for name, *_ in CTAPS)


# Wide-VMEM notes: see cheb_pass.py (_VMEM_BUDGET_WIDE / _VMEM_LIMIT_BYTES;
# 96 MB admits the measured-fastest coupled configs — br=32 single-pass
# C-grid is a ~59 MB model footprint — while rejecting ones that overflow
# the chip: br=96 h=8 is ~191 MB and failed to compile at a 100 MB limit).

# Measured single-pass block-height sweet spots (2400x3600 f32, n_steps=11,
# one v5e; benchmarks/README.md): C-grid taps peak at br=32 (54.1 G gps vs
# 50.5 at br=48, 47.6 at br=40), the lighter B-grid at br=40 (65.6 G vs 62.2
# at br=32, 58.7 at br=48). Bigger blocks stream fewer redundant coefficient
# rows but degrade Mosaic's pipelining under VMEM pressure, so the planner
# aims for the sweet spot rather than maximizing br.
_BR_TARGET_CTAP = 32
_BR_TARGET_VEC = 40
_BR_MAX = 48

# Packed coefficient streams (round 5): stack the per-block extended
# coefficient layouts into ONE (nb, n_ext, win, wx) array so each block's
# coefficient data arrives as a single fully HBM-contiguous copy instead of
# n_ext (10 B-grid / 18 C-grid) separate strided streams. Same bytes, same
# values, same window rows — only the stream COUNT changes, which is what
# the round-5 profile correction blames for the missing copy/compute
# overlap in these kernels (benchmarks/README.md). A/B:
# benchmarks/sweep_vecpack.py patches this flag.
_PACK_COEF: bool = True


def _coupled_rows(br: int, halo: int, n_ext: int, temps: int) -> int:
    """VMEM footprint model in nx-row units (double-buffered blocked streams
    of the stacked pair + extended coefficient streams + live temps)."""
    win = br + 2 * halo
    return 2 * 10 * (2 * br) + 2 * n_ext * win + temps * win


def _plan_coupled(
    ny: int, nx: int, n_steps: int, itemsize: int,
    n_ext: int, temps: int, margin: int, br_target: int,
    max_fuse: int = 16,
    halo_mult: Optional[int] = None,
    br_divides: Optional[int] = None,
    budget: Optional[int] = None,
) -> Optional[PassPlan]:
    """Block rows + pass split for a coupled pass with ``n_ext`` coefficient
    streams and ~``temps`` live stacked/plane window temporaries.

    Strategy (validated on-chip, see benchmarks/README.md): these kernels
    are dominated by coefficient streaming, so FEWER PASSES beats smaller
    halos — prefer one whole-recurrence pass at the measured br sweet spot,
    falling back to balanced multi-pass splits only when the single-pass
    window exceeds the wide-VMEM budget.

    ``halo_mult``/``br_divides``: ring-mode constraints (see cheb_pass
    .plan_passes) — force 8-row-aligned halos and block heights dividing
    the LOCAL shard rows with at least two blocks per shard.
    """
    # Budget at the kernel's internal lane-aligned compute width (the x-leg
    # of the trapezoid, see cheb_pass._ext_geometry) — that is the width the
    # windows actually occupy in VMEM.
    budget_rows = ((budget or _VMEM_BUDGET_WIDE) - margin) // (
        _ext_geometry(nx, 16)[0] * itemsize)
    tile = _cp._sublane_tile(itemsize)
    brs = [b for b in range(tile, min(ny, _BR_MAX) + 1, tile) if ny % b == 0]
    if br_divides is not None:
        brs = [b for b in brs
               if br_divides % b == 0 and b <= br_divides // 2]
    if not brs:
        return None

    def aligned_halo(h):
        # window heights stay sublane-aligned; the DMA-window path needs
        # the halo itself tile-row aligned (HBM slice tiling, see cheb_pass)
        hm = halo_mult or _halo_mult(itemsize)
        return -(-h // hm) * hm

    # 1. single pass at the br closest to the sweet spot (largest first on
    #    ties: fewer redundant rows).
    if n_steps <= max_fuse:
        halo = aligned_halo(n_steps)
        cands = [b for b in brs if b >= halo and _coupled_rows(
            b, halo, n_ext, temps) <= budget_rows]
        if cands:
            br = min(cands, key=lambda b: (abs(b - br_target), -b))
            return PassPlan(br=br, halo=halo, steps=(n_steps,))

    # 2. multi-pass: minimize total streams under the budget.
    best = None
    for br in brs:
        h = min(max_fuse, n_steps, br)
        while h >= 1 and _coupled_rows(
                br, aligned_halo(h), n_ext, temps) > budget_rows:
            h -= 1
        if h < 1:
            continue
        ext = n_ext * (1.0 + 2.0 * aligned_halo(h) / br)
        n_pass = -(-n_steps // h)
        # stacked-field streams per pass: 12 reads + 2 acc + 6 writes
        streams = n_pass * (14 + ext + 6) - 4
        if best is None or streams < best[0]:
            best = (streams, br, h)
    if best is None:
        return None
    _, br, h = best
    n_pass = -(-n_steps // h)
    base, extra = divmod(n_steps, n_pass)
    steps = tuple(base + (1 if i < extra else 0) for i in range(n_pass))
    halo = min(br, aligned_halo(max(steps)))
    return PassPlan(br=br, halo=halo, steps=steps)


def plan_vec_passes(ny, nx, n_steps, itemsize, max_fuse=16,
                    halo_mult=None, br_divides=None,
                    budget=None) -> Optional[PassPlan]:
    return _plan_coupled(ny, nx, n_steps, itemsize,
                         n_ext=10, temps=12, margin=0,
                         br_target=_BR_TARGET_VEC, max_fuse=max_fuse,
                         halo_mult=halo_mult, br_divides=br_divides,
                         budget=budget)


def plan_ctap_passes(ny, nx, n_steps, itemsize, max_fuse=16,
                     halo_mult=None, br_divides=None,
                     budget=None) -> Optional[PassPlan]:
    # 18 live coefficient windows leave less slack than the B-grid kernel;
    # keep a margin under the wide budget for Mosaic's own scratch.
    return _plan_coupled(ny, nx, n_steps, itemsize,
                         n_ext=18, temps=14, margin=1 << 20,
                         br_target=_BR_TARGET_CTAP, max_fuse=max_fuse,
                         halo_mult=halo_mult, br_divides=br_divides,
                         budget=budget)


def _ext_layout(arrs: List[np.ndarray], plan: PassPlan,
                packed: Optional[bool] = None) -> List[np.ndarray]:
    """Extended-block layouts, packed into one stacked array when
    ``_PACK_COEF`` (axis order (nb, n_ext, win, wx): each block's
    coefficients are one contiguous HBM chunk). ``packed`` overrides the
    flag (ring mode forces unpacked, see _build_coupled_pass)."""
    wx = _ext_geometry(arrs[0].shape[-1], plan.halo)[0]
    blocks = [ext_blocks_np(a, plan.br, plan.halo, wx=wx) for a in arrs]
    if _PACK_COEF if packed is None else packed:
        return [np.stack(blocks, axis=1)]
    return blocks


def host_vec_ext_inputs(
    op: BGridVectorStencil, plan: PassPlan, dtype, lap_scale: float,
    packed: Optional[bool] = None,
) -> List[np.ndarray]:
    """Extended-block layouts of the ten B-grid coefficient arrays,
    pre-scaled by -2*lap_scale (the pass kernels' coefficient convention)."""
    npdt = np.dtype(dtype)
    neg2s = npdt.type(-2.0 * lap_scale)
    arrs = [np.asarray(getattr(op, k), dtype=npdt) * neg2s
            for k in (*_DIFF, *_MIX)]
    return _ext_layout(arrs, plan, packed)


def host_ctap_ext_inputs(taps, plan: PassPlan, dtype, lap_scale: float,
                         packed: Optional[bool] = None):
    """Extended-block layouts of the 18 tap arrays (ops/ctaps.py order),
    pre-scaled by -2*lap_scale."""
    npdt = np.dtype(dtype)
    neg2s = npdt.type(-2.0 * lap_scale)
    arrs = [np.asarray(taps[name], dtype=npdt) * neg2s
            for name in _CTAP_NAMES]
    return _ext_layout(arrs, plan, packed)


def _bgrid_lap(c, g, gN, gS, gE, gW):
    """Diffusion + mixing 5-point pair (coefficients pre-scaled)."""

    def s5(names):
        cc, n, s, e, w = (c(k) for k in names)
        return cc * g + n * gN + s * gS + e * gE + w * gW

    diff = s5(_DIFF)
    mix = s5(_MIX)
    # u picks up the v mixing term and vice versa
    return diff + jnp.stack([mix[1], mix[0]])


def _ctap_lap(c, g, gN, gS, gE, gW):
    """Tap-expanded C-grid contraction (coefficients pre-scaled).

    sh(a, dy, dx)[r, col] = a[r+dy, col+dx]; the two diagonal taps are
    SUBLANE shifts of the already-lane-rolled planes (row permutations
    commute with lane rolls, so e.g. north-shift(gW) == lane-roll(gN)
    bitwise — but a sublane concat is a cheap vreg move where a 128-lane
    roll is a cross-lane shuffle; round-5 on-chip A/B in
    benchmarks/sweep_vecpack.json, diag arm).
    """
    uNW = jnp.concatenate([gW[0][1:, :], gW[0][:1, :]], axis=0)  # u[j+1, i-1]
    vSE = jnp.concatenate([gE[1][-1:, :], gE[1][:-1, :]], axis=0)  # v[j-1, i+1]
    lap_u = (
        c("CU_c") * g[0] + c("CU_w") * gW[0] + c("CU_e") * gE[0]
        + c("CU_s") * gS[0] + c("CU_n") * gN[0]
        + c("DU_c") * g[1] + c("DU_s") * gS[1] + c("DU_e") * gE[1]
        + c("DU_se") * vSE
    )
    lap_v = (
        c("CV_c") * g[1] + c("CV_w") * gW[1] + c("CV_e") * gE[1]
        + c("CV_s") * gS[1] + c("CV_n") * gN[1]
        + c("DV_c") * g[0] + c("DV_w") * gW[0] + c("DV_n") * gN[0]
        + c("DV_nw") * uNW
    )
    return jnp.stack([lap_u, lap_v])


def _build_coupled_pass(
    coef_names: Sequence[str],
    lap_body: Callable,
    ny: int,
    nx: int,
    dtype,
    plan: PassPlan,
    n_ops: int,
    first_pass: bool,
    last_pass: bool,
    zap: bool,
    ring_axis: Optional[str] = None,
    ring_size: int = 0,
):
    """One fused pass of ``n_ops`` coupled operator applications.

      first+last : (p, coef_exts, w)            -> wacc
      first      : (p, coef_exts, w)            -> (w1, w2, wacc)
      middle     : (p, coef_exts, w1, w2, wacc) -> (w1, w2, wacc)
      last       : (p, coef_exts, w1, w2, wacc) -> wacc

    with w* stacked (2, ny, nx) arrays (u at index 0, v at index 1) and
    coef_exts pre-scaled by -2*lap_scale in host_* builder order.

    Ring mode (``ring_axis`` set; see cheb_pass._PassConfig): the kernel is
    the per-shard slice of the GLOBAL plan on a 1-D y-sharded mesh — ``ny``
    is then the LOCAL row count, the shard-edge windows are assembled from
    halo buffers filled by in-kernel ``make_async_remote_copy`` ring sends
    issued at kernel entry (overlapping the interior blocks, processed
    first), and the result matches the unsharded kernel by construction.
    """
    br, halo = plan.br, plan.halo
    if ring_axis is not None and not (
            n_ops <= halo <= br and ny % br == 0):
        # ring mode re-derives eligibility and declines gracefully instead
        # of asserting (an AssertionError is not a COMPILE_ERRORS member
        # and would escape the fallback chain — crash instead of the
        # mandated silent fallback; cf. cheb_pass.build_ring_pass)
        return None
    assert n_ops <= halo and halo <= br and ny % br == 0
    nb = ny // br
    win = br + 2 * halo
    # lane-unaligned nx: the kernel runs as a pure aligned problem of
    # width wx — the caller supplies lane-extended stacked inputs
    # (cheb_pass.lane_extend_jnp), refreshes w1/w2 wrap strips between
    # passes, and only the FINAL output truncates to the real columns
    wx = _ext_geometry(nx, halo)[0]
    out_nx, nx = (nx if wx != nx else 0), wx
    npdt = np.dtype(dtype)
    half = npdt.type(0.5)
    n_fields = 1 if first_pass else 2
    n_p = n_ops + 1 if first_pass else n_ops
    ring = ring_axis is not None
    interp = jax.default_backend() != "tpu"
    # Manual-DMA windows (see cheb_pass): blocked (i+-1) mod nb neighbor
    # views defeat Mosaic's input pipelining; stream each stacked field
    # once from an ANY(HBM) ref into a double-buffered VMEM scratch with
    # the block-(i+1) prefetch issued before block i's compute.
    dma = _cp.dma_window_eligible(
        br, halo, nb, npdt.itemsize, nx, force=ring)
    if ring and not (dma and nb >= 2 and ring_size >= 2):
        # ineligible ring config: callers fall back to the round-based
        # engine (never a crash / wrong-window kernel; see cheb_pass
        # build_ring_pass)
        return None

    def xslice(a):
        # offset-0 layout: slicing the leading out_nx lanes of the FINAL
        # output is a free truncation (real columns sit at offset 0)
        return a[..., :out_nx] if out_nx else a

    # Ring kernels stay UNPACKED (see cheb_pass._build_pass_call: the
    # bitwise ring-vs-unsharded validation requires one shared layout,
    # and packing perturbs FMA contraction at the last bit).
    packed = _PACK_COEF and ring_axis is None
    coef_idx = {k: j for j, k in enumerate(coef_names)}

    def kernel(p_ref, *refs):
        refs = list(refs)
        if dma:
            f_hbm = [refs.pop(0) for _ in range(n_fields)]
            f_views = None
        else:
            f_views = [
                [refs.pop(0) for _ in range(3)] for _ in range(n_fields)
            ]
        acc_ref = None if first_pass else refs.pop(0)
        if packed:
            coef_packed = refs.pop(0)
            coef_refs = None
        else:
            coef_refs = {k: refs.pop(0) for k in coef_names}
        if last_pass:
            acc_out = refs.pop(0)
            w1_out = w2_out = None
        else:
            w1_out, w2_out, acc_out = refs.pop(0), refs.pop(0), refs.pop(0)
        if ring:
            # halo receive buffers (ANY memory): filled by the neighbors'
            # remote copies, read back by the edge blocks' window DMAs
            hs_bufs = [refs.pop(0) for _ in range(n_fields)]
            hn_bufs = [refs.pop(0) for _ in range(n_fields)]
        scratches = refs  # DMA window buffers + x-extension staging buffers
        if ring:
            rsem = scratches.pop()  # remote recv semaphores
            ssem = scratches.pop()  # remote send semaphores
        if dma:
            sem = scratches.pop()  # DMA semaphores ride last
            sbufs = [scratches.pop(0) for _ in range(n_fields)]

        i = pl.program_id(0)

        if dma:
            ws = _cp._WindowStreamer(
                lead=1, n_fields=n_fields, ny=ny, nx=nx, br=br, halo=halo,
                nb=nb, win=win, ring=ring,
                ring_axis=ring_axis, ring_size=ring_size,
                interp=jax.default_backend() != "tpu",
                f_hbm=f_hbm, sbufs=sbufs, sem=sem,
                hs_bufs=hs_bufs if ring else None,
                hn_bufs=hn_bufs if ring else None,
                rsem=rsem if ring else None, ssem=ssem if ring else None,
                tile=_cp._sublane_tile(npdt.itemsize))
            ws.prologue(i)

        def dma_window(fi):
            """Stacked field ``fi``'s window from its DMA scratch (DMA
            eligibility requires a lane-aligned nx, so there is no
            in-window lane extension on this path)."""
            return sbufs[fi][i % 2]

        def window(views):
            own, prev, nxt = views
            return jnp.concatenate(
                [prev[:, br - halo :, :], own[...], nxt[:, :halo, :]], axis=1
            )

        def c(name):
            if packed:
                return coef_packed[0, coef_idx[name]]
            return coef_refs[name][0]

        def lap(t):
            g = jnp.nan_to_num(t) if zap else t
            gN = jnp.concatenate([g[:, 1:, :], g[:, :1, :]], axis=1)
            gS = jnp.concatenate([g[:, -1:, :], g[:, :-1, :]], axis=1)
            gE = jnp.roll(g, -1, axis=-1)
            gW = jnp.roll(g, 1, axis=-1)
            return lap_body(c, g, gN, gS, gE, gW)

        own = slice(halo, halo + br)

        def field_window(fi):
            if dma:
                return dma_window(fi)
            return window(f_views[fi])

        if first_pass:
            prev = field_window(0)
            cur = -prev + half * lap(prev)
            acc = p_ref[0, 0] * prev[:, own] + p_ref[0, 1] * cur[:, own]
            p_off = 2
        else:
            cur = field_window(0)
            prev = field_window(1)
            acc = acc_ref[...]
            p_off = 0

        n_rec = n_ops - 1 if first_pass else n_ops
        for j in range(n_rec):
            nxt = -2.0 * cur + lap(cur) - prev
            acc = acc + p_ref[0, p_off + j] * nxt[:, own]
            prev, cur = cur, nxt

        if not last_pass:
            # full kernel width: the dispatcher refreshes the wrap strips
            # (cheb_pass.refresh_wrap_jnp) before the next pass
            w1_out[...] = cur[:, own]
            w2_out[...] = prev[:, own]
            acc_out[...] = acc.astype(dtype)
            return
        # narrow (bf16) streams accumulate in f32 registers (f32 Chebyshev
        # scalars, see cheb_pass.p_dtype); round at the pass boundary only
        acc_out[...] = xslice(acc).astype(dtype)

    def _pblk_map(j):
        # index-map counterpart of the kernel-side block reorder
        return _cp._pblk(ring, nb, j)

    def blk(index_map=None):
        if index_map is None:
            index_map = lambda i: (0, _pblk_map(i), 0)
        return pl.BlockSpec((2, br, nx), index_map, memory_space=pltpu.VMEM)

    def views():
        return [
            blk(lambda i: (0, i, 0)),
            blk(lambda i: (0, (i - 1) % nb, 0)),
            blk(lambda i: (0, (i + 1) % nb, 0)),
        ]

    in_specs = [pl.BlockSpec((1, n_p), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    for _ in range(n_fields):
        if dma:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        else:
            in_specs += views()
    if not first_pass:
        in_specs.append(blk())
    if packed:
        # one stacked (n_ext, win, wx) chunk per block — fully contiguous
        # in HBM by the (nb, n_ext, win, wx) host layout
        in_specs.append(
            pl.BlockSpec((1, len(coef_names), win, nx),
                         lambda i: (_pblk_map(i), 0, 0, 0),
                         memory_space=pltpu.VMEM))
    else:
        in_specs += [
            pl.BlockSpec((1, win, nx), lambda i: (_pblk_map(i), 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(len(coef_names))
        ]

    # only the FINAL output truncates to the real columns; non-last
    # carries stay at the full kernel width (wraps refreshed by the caller)
    n_out = 1 if last_pass else 3
    if last_pass and out_nx:
        out_specs = [pl.BlockSpec((2, br, out_nx),
                                  lambda i: (0, _pblk_map(i), 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((2, ny, out_nx), dtype)]
    else:
        out_specs = [blk() for _ in range(n_out)]
        out_shape = [
            jax.ShapeDtypeStruct((2, ny, nx), dtype) for _ in range(n_out)
        ]
    if ring:
        # halo receive buffers (written by the neighbors' remote DMAs)
        out_specs += [pl.BlockSpec(memory_space=pl.ANY)
                      for _ in range(2 * n_fields)]
        out_shape += [
            jax.ShapeDtypeStruct((2, halo, nx), dtype)
            for _ in range(2 * n_fields)
        ]

    scratch_shapes = []
    if dma:
        scratch_shapes += [
            pltpu.VMEM((2, 2, win, nx), dtype) for _ in range(n_fields)
        ]
        scratch_shapes.append(pltpu.SemaphoreType.DMA((n_fields, 2, 2)))
    if ring:
        # popped from the end in the kernel: ..., sem, ssem, rsem
        scratch_shapes.append(pltpu.SemaphoreType.DMA((n_fields, 2)))
        scratch_shapes.append(pltpu.SemaphoreType.DMA((n_fields, 2)))

    grid_call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * len(coef_names) * n_ops * nb * win * nx,
            bytes_accessed=(6 * n_fields + 2 * n_out + 2) * ny * nx
            * npdt.itemsize + len(coef_names) * nb * win * nx * npdt.itemsize,
            transcendentals=0,
        ),
        # lift Mosaic's default 16 MiB scoped-vmem cap: the fast configs
        # (single whole-recurrence pass) legitimately use ~60 MB of the
        # chip's 128 MB VMEM (ignored in interpret mode).
        # Ring kernels use the entry barrier semaphore -> collective_id.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
            **({"collective_id": 0} if ring and not interp else {}),
        ),
        interpret=interp,
    )

    n_rep = 1 if dma else 3  # DMA windows take the field once

    def pass_fn(p_chunk, coef_exts, *fields_and_acc):
        fields = fields_and_acc[:n_fields]
        args = [jnp.reshape(p_chunk, (1, n_p)).astype(_cp.p_dtype(dtype))]
        for f in fields:
            args += [f] * n_rep
        if not first_pass:
            args.append(fields_and_acc[n_fields])
        args += list(coef_exts)
        out = grid_call(*args)
        # drop the 2*n_fields halo receive buffers riding as trailing outputs
        out = out[: 1 if last_pass else 3]
        return out[0] if last_pass else tuple(out)

    return pass_fn


def build_vec_pass(ny, nx, dtype, plan, n_ops, first_pass, last_pass,
                   zap=True, ring_axis=None, ring_size=0):
    """B-grid coupled pass; coefficients from :func:`host_vec_ext_inputs`."""
    return _build_coupled_pass((*_DIFF, *_MIX), _bgrid_lap, ny, nx, dtype,
                               plan, n_ops, first_pass, last_pass, zap,
                               ring_axis=ring_axis, ring_size=ring_size)


def build_ctap_pass(ny, nx, dtype, plan, n_ops, first_pass, last_pass,
                    zap=True, ring_axis=None, ring_size=0):
    """C-grid tap pass; coefficients from :func:`host_ctap_ext_inputs`."""
    return _build_coupled_pass(_CTAP_NAMES, _ctap_lap, ny, nx, dtype,
                               plan, n_ops, first_pass, last_pass, zap,
                               ring_axis=ring_axis, ring_size=ring_size)
