"""Temporally blocked Pallas pass: S Chebyshev steps fused into one kernel.

A 1-step kernel runs near the per-step HBM roofline (~9 full-array streams
per step). The remaining headroom is *traffic reduction*: this kernel
performs S operator applications per HBM pass using
the classic trapezoid (overlapped-halo) decomposition. Each row-strip block
loads its own rows plus an H=S row halo from its two neighbor blocks, steps
the recurrence S times entirely in VMEM/registers (the valid region shrinks
by one row per step, ending exactly on the block's own rows), and writes the
carry (T_k, T_{k-1}, acc) once. Per-step HBM traffic drops from ~9 streams to
~(7 + coef streams)/S, a 4-8x reduction; the cost is (br+2H)/br redundant VPU
compute at block seams, which is cheap next to bandwidth.

Boundary handling, all inside one uniform kernel:
  - x periodicity: in-register lane roll (blocks are full-width strips).
  - y periodicity: the neighbor-block views wrap via (i±1) mod nb index maps.
  - tripolar fold (reference kernels.py:33-40): the mirror property extends
    to multi-step evolution — extending the field by H mirrored rows
    (ext row ny-1+m = real row ny-m reversed in x) *and* the coefficient
    arrays by the swapped mirror rule (c->c, n<->s, e<->w, each reversed in
    x) keeps every real row exact for S<=H steps. Coefficient mirrors are
    baked into the top block of the precomputed extended-layout coefficient
    arrays; the field mirrors are H-row chunks the caller prepares per pass
    (negligible traffic) and the top block swaps in for its north halo.

Coefficient arrays are pre-gathered once per (br, H) config into an
"extended block" layout (nb, br+2H, nx) so each pass streams them ~once
(1 + 2H/br) instead of 3x via neighbor views. Two builder entry points share
the kernel: :func:`build_cheb_pass` (single-device path — host-side numpy
coefficients, fold support) and :func:`build_local_pass` (the per-shard inner
kernel of the shard_map engine — coefficients arrive as runtime arrays that
were halo-extended by device-level exchange, so the kernel itself is purely
periodic and edge garbage stays confined to the exchanged halo zone).

Land masks never enter the hot loop: the dispatch layer runs the recurrence
in masked h-space (see dispatch.py) so ``stencil.pre`` must be None here.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stencil import ScalarStencil5

# VMEM model budget (pipelined buffers + the ~6-window temp allowance in
# _vmem_rows). 16 MiB is Mosaic's DEFAULT scoped-vmem cap; kept as the
# conservative budget for code paths that don't lift it.
_VMEM_BUDGET = 16 * 1024 * 1024

# The v5e chip physically has 128 MB of VMEM; the pass kernels lift Mosaic's
# cap via CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES).
#
# Scalar single-pass block height: the round-2 "br=48 ~= br=96 within
# noise" claim predates the offset-0 tail-wrap lane geometry and the
# XLA-side lane extension; a round-5 on-chip sweep under the current
# geometry (benchmarks/sweep_br.json, 200-apply chains, headline tripolar
# 2400 rows) is monotone in br up to a cliff past the sweet spot:
#   3600 (lane-extended wx=3712): 94 / 104 / 111 / 116 / 119 / 134 / 91 G
#   3584 (aligned):              124 / 144 / 148 / 168 / 162 / 172 / 134 G
#   at br =                       32 /  48 /  80 /  96 / 120 / 160 / 240
# (br=200 probes: ~= br=160 at 3584, but 114 G at wx=3712 — Mosaic is
# width-quirky at large blocks, the same pattern as the documented br=200
# multi-pass overflow at wx=3712.) Trapezoid redundancy at halo=12 falls
# 1.5x -> 1.15x from br=48 to br=160; past that, too-large blocks break
# Mosaic's pipelining (the 240 cliff, worse at unaligned widths).
# 5-coefficient grids (IRREGULAR/MOM5/POP) plan at the same target now
# that packed streams removed their pipelining cliff (see _BR_CAP_HEAVY).
# The dispatcher still falls back to XLA (with one tightened-budget
# replan) if a planned kernel fails to compile on chip (dispatch.py).
_VMEM_BUDGET_WIDE = 96 * 1024 * 1024
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024
_BR_TARGET_SCALAR = 160
# Heavy-coefficient (>=4 array coefficients) block-height cap, UNPACKED
# streams only: many separate live coefficient streams degrade Mosaic
# pipelining at large br (round-2 measured br=96 at 0.64x of br=48 for
# the 5-coef grids). With PACKED streams (_PACK_COEF, the default) the
# cliff is gone — the round-5 on-chip sweep (sweep_pack_heavy.json) is
# monotone-improving to br=160 (104.2 G vs 89.7 at br=48, +16% on
# IRREGULAR), so packed planning uses the ordinary 512 cap/target.
_BR_CAP_HEAVY = 64
# Kernel-side switch for the strip-shaped neighbor views (A/B harness:
# benchmarks/sweep_strips.py patches this together with _strip_halo; the
# strips engage only when the halo divides the block height, see
# _build_pass_call).
_STRIPS: bool = True
# Packed extended-coefficient streams (round 5, same mechanism as
# vec_pass._PACK_COEF): when a pass streams >= 2 extended windows
# (coefficients + pre/post/area), stack them into ONE
# (nb, n_ext, win, wx) array so each block's windows arrive as a single
# fully HBM-contiguous copy instead of n_ext separate strided streams.
# Same bytes, same values, same window rows. A/B: benchmarks/sweep_pack.py.
_PACK_COEF: bool = True

COEF_NAMES = ("c", "n", "s", "e", "w")
# Reflection across the tripolar seam swaps the meaning of the neighbors.
_MIRROR_SWAP = {"c": "c", "n": "s", "s": "n", "e": "w", "w": "e"}

# Manual-DMA windows (round 3; MEASURED AND DEMOTED in round 4): replace the
# three blocked neighbor views per field with double-buffered async copies
# from an ANY(HBM) ref into VMEM scratch, prefetching block i+1 before block
# i's compute. The round-3 motivation (neighbor-view index maps serializing
# Mosaic's input pipelining) did not survive an honest on-chip A/B: with the
# alignment gate fixed so the DMA kernels provably execute (see
# dma_window_eligible), manual DMA measures 3-8% SLOWER than blocked views
# on every eligible config (2400x3584 100-200-apply chains: scalar headline
# 133.2 vs 138.1 G, C-grid 50.9 vs 54.6, B-grid 63.5 vs 68.7; full
# instrumented sweep in benchmarks/sweep_dma.json). Constraints: HBM
# slices are (8, 128)-tiled, so row
# offsets/counts must be tile-aligned (halo rounded to 8/16, not 4) and nx
# itself must be a 128 multiple — unaligned widths fail to compile outright.
# The flag stays OFF by default; the machinery remains because the ring
# halo-exchange path (build_ring_pass) requires in-kernel DMA regardless.
# GCM_FILTERS_TPU_DMA_WINDOWS=1 overrides from the environment (on-chip
# A/B and verify_tpu gating without code edits).
_DMA_WINDOWS: bool = os.environ.get("GCM_FILTERS_TPU_DMA_WINDOWS", "") == "1"


def _sublane_tile(itemsize: int) -> int:
    """Rows per sublane tile for the element width: 8 for f32, 16 for bf16
    (f64 is kept at the conservative 8 the f32 path uses)."""
    return max(8, 32 // itemsize)


def p_dtype(dtype):
    """SMEM dtype of the Chebyshev coefficient vector: the stream dtype for
    >=4-byte floats, f32 for narrow (bf16) streams — the f32 scalar
    coefficients keep the in-register accumulator f32 across the fused
    steps (rounded to the stream dtype only at pass boundaries) and avoid
    narrow-scalar SMEM layouts."""
    return jnp.float32 if np.dtype(dtype).itemsize < 4 else dtype


def dma_window_eligible(br, halo, nb, itemsize, nx,
                        force=False) -> bool:
    """Whether a pass config can take the manual-DMA window path: the
    single eligibility predicate for both kernel families (scalar and
    coupled) — tile-aligned rows AND a lane-aligned width, >=2 blocks,
    2- or 4-byte elements. ``force`` = ring mode, which REQUIRES manual
    DMA.

    The width constraint is a hard Mosaic rule, discovered on-chip in
    round 4: manual async copies slice the HBM memref directly, and
    "Slice shape along dimension 1 must be aligned to tiling (128)" — a
    full-width row slice of a (ny, 3600) array is a 3600-wide slice and
    fails to compile. Interpret mode does not enforce this, so the gate
    (not the tests) is what keeps unaligned shapes off the path; round 3
    shipped without it and every benchmarked config silently pinned to
    the XLA fallback on the real chip (VERDICT r3 weak #1)."""
    tile = _sublane_tile(itemsize)
    return (
        (_DMA_WINDOWS or force)
        and halo % tile == 0
        and br % tile == 0
        and nb >= 2
        and itemsize in (2, 4)
        and nx % 128 == 0  # unaligned HBM slices cannot compile
    )


def _dma_on(cfg: "_PassConfig") -> bool:
    return dma_window_eligible(
        cfg.br, cfg.halo, cfg.nb, np.dtype(cfg.dtype).itemsize, cfg.nx,
        force=cfg.ring_axis is not None,
    )


def _halo_mult(itemsize: int = 4) -> int:
    """Plan-halo rounding: tile/2 keeps window heights sublane-aligned
    (br+2H); the DMA-window path additionally needs H itself tile-row
    aligned (HBM slice constraint), at the price of a slightly taller
    trapezoid. The tile is 8 rows for f32, 16 for bf16."""
    tile = _sublane_tile(itemsize)
    return tile if _DMA_WINDOWS else tile // 2


def _strip_halo(br: int, halo: int, itemsize: int) -> int:
    """Smallest halo' >= halo that divides br and is a sublane-tile
    multiple — the eligibility condition for STRIP-shaped neighbor views
    (round 5): when halo | br, the two neighbor reads of each field can be
    streamed as (halo, nx) strip blocks instead of full (br, nx) blocks,
    cutting first-pass field traffic from 3 to 1 + 2*halo/br streams
    (e.g. 3.0 -> 1.2 at br=160/halo=16, ~62 MB/apply on the headline).
    Capped at halo + 2 tiles: growing the halo inflates trapezoid
    redundancy (VPU) and the ext-coefficient streams, so a distant
    divisor costs more than the strip saving. Returns ``halo`` unchanged
    if no divisor qualifies (full-block views are used instead)."""
    tile = _sublane_tile(itemsize)
    h = -(-halo // tile) * tile
    while h <= min(br, halo + 2 * tile):
        if br % h == 0:
            return h
        h += tile
    return halo


def _lane_width(nx: int, halo: int) -> int:
    """nx rounded up to the 128-lane tile, with >= 2*halo margin."""
    if nx % 128 == 0:
        return nx
    wx = -(-nx // 128) * 128
    while wx - nx < 2 * halo:
        wx += 128
    return wx


def _ext_geometry(nx: int, halo: int) -> Tuple[int, int]:
    """(wx, 0): the kernel's internal lane-aligned compute width; real
    columns sit at offset 0 ("offset-0 tail-wrap" layout, round 4).

    Round-3 on-chip A/B (headline 2400x3600): the SAME kernel on a
    lane-aligned width runs ~1.35x faster per cell (137-140 G vs 100-105 G)
    — jnp.roll's periodic wrap on a non-multiple-of-128 logical width
    lowers to misaligned lane shuffles that tax every recurrence step. So
    each pass computes on an x-extended window (the x-leg of the
    trapezoid).

    Layout: columns [0, nx) are real, [nx, nx+halo) hold the east wrap
    (real columns [0, halo)), and the LAST halo columns [wx-halo, wx) hold
    the west wrap (real columns [nx-halo, nx)). With the west wrap at the
    tail, jnp.roll's wrap across the wx boundary lands exactly the right
    periodic neighbor on both sides — column 0 sees column wx-1 == real
    nx-1 and column wx-halo+k evolves with the same neighbors as real
    nx-halo+k — so the extended array is EXACTLY periodic at width wx and
    every real column stays bit-exact for up to halo steps. Garbage is
    confined to the interior gap [nx+halo, wx-halo), which grows one
    column per side per step and never reaches a real or wrap column
    within halo steps.

    This replaces round 3's hl=128 layout (real columns at a full-vreg
    offset, wx = roundup(nx + 128 + halo)): offset 0 is itself a
    128-multiple, wx shrinks to roundup(nx + 2*halo) (3712 vs 3840 on the
    headline — 3.4% less VPU work) and the output slice [..., :nx] is a
    free truncation instead of a lane rotation.

    Round-4 on-chip measurements moved the extension OUT of the kernel
    entirely: every in-kernel assembly variant (concat+copy at hl=128,
    concat+copy at offset 0, direct three-segment scratch writes) cost
    0.18-0.27 ms/apply on the 2400x3600 headline against a 0.685 ms pure
    kernel — Mosaic lowers the strip stores poorly and the copies sit on
    the critical path — while an XLA-side extension is one fused
    bandwidth-bound concat (~0.09 ms). So the caller now extends the
    field once per apply (:func:`lane_extend_jnp`), the kernel runs as a
    PURE ALIGNED problem of width wx (out_nx truncation on the final
    output only), and pass boundaries refresh the two wrap strips
    (:func:`refresh_wrap_jnp`) because gap garbage grows into them during
    a pass.

    Aligned nx needs no extension: wrap-roll is already correct and cheap.
    """
    if nx % 128 == 0:
        return nx, 0
    return -(-(nx + 2 * halo) // 128) * 128, 0


def lane_extend_jnp(a: jax.Array, wx: int, halo: int) -> jax.Array:
    """Tail-wrap-extend the last axis to width ``wx`` (see
    :func:`_ext_geometry`): [real | east wrap | zero gap | west wrap].
    One fused XLA concat — bandwidth-bound, ~2 field transits."""
    nx = a.shape[-1]
    if wx == nx:
        return a
    if nx >= halo:
        gap = wx - nx - 2 * halo
        parts = [a, a[..., :halo]]
        if gap:
            parts.append(jnp.zeros(a.shape[:-1] + (gap,), a.dtype))
        parts.append(a[..., nx - halo :])
        return jnp.concatenate(parts, axis=-1)
    # tiny nx (< halo): gather whole periods via the layout's column map
    return a[..., np.asarray(_ext_col_index(nx, wx, halo))]


def refresh_wrap_jnp(t: jax.Array, nx: int, halo: int) -> jax.Array:
    """Restore the tail-wrap strips of an extended array between passes.

    A pass of up to ``halo`` steps grows the interior-gap garbage one
    column per side per step, so the stored carries' wrap strips are
    stale; the real columns are exact, and two narrow in-place updates
    re-derive the wraps from them."""
    wx = t.shape[-1]
    if wx == nx:
        return t
    if nx < halo:
        # tiny nx: the east wrap spans whole periods — rebuild outright
        return lane_extend_jnp(t[..., :nx], wx, halo)
    t = jax.lax.dynamic_update_slice_in_dim(t, t[..., :halo], nx, axis=-1)
    return jax.lax.dynamic_update_slice_in_dim(
        t, t[..., nx - halo : nx], wx - halo, axis=-1)


@dataclasses.dataclass(frozen=True)
class PassPlan:
    """A schedule of fused passes covering all n_steps operator applications."""

    br: int  # block rows (divides ny, multiple of 8)
    halo: int  # H = max ops per pass (mirror chunks / ext layout sized for this)
    steps: Tuple[int, ...]  # ops per pass; steps[0] is the first (A-step) pass


def _coef_arrays(stencil: ScalarStencil5) -> List[str]:
    return [
        k for k in COEF_NAMES
        if not isinstance(getattr(stencil, k), (int, float))
    ]


def _vmem_rows(
    br: int, halo: int, n_coef: int, has_post: bool, single_pass: bool = False
) -> int:
    """Rough VMEM footprint in rows for one (br, halo) config.

    Pipelined streams are double-buffered: field views (3x t1 + 3x t2), acc,
    3 outputs = 10 blocked streams — but a single whole-recurrence pass
    (first+last) needs only h's 3 views + the acc output = 4, which buys a
    much larger block (less trapezoid recompute; the kernel is VPU-bound).
    Plus (n_coef + post) extended-layout streams of br+2H rows and ~6 live
    window temporaries inside the kernel body.
    """
    win = br + 2 * halo
    blocked = 2 * (4 if single_pass else 10) * br
    ext = 2 * (n_coef + int(has_post)) * win
    temps = 6 * win
    return blocked + ext + temps


def plan_passes(
    ny: int,
    nx: int,
    n_steps: int,
    n_coef: int,
    has_post: bool,
    itemsize: int,
    max_fuse: int = 16,
    halo_mult: Optional[int] = None,
    br_divides: Optional[int] = None,
    budget: Optional[int] = None,
) -> Optional[PassPlan]:
    """Choose block rows and per-pass step counts under the VMEM budget.

    Prefers ONE whole-recurrence pass (minimal HBM traffic: ~1 read + 1
    write of the field total) at a block height near the measured sweet
    spot, falling back to the stream/VPU cost model for multi-pass splits.

    ``budget``: VMEM byte budget override. The dispatcher retries a
    compile-failed config once with a tightened budget — the row model is
    an estimate and Mosaic's real scoped-vmem allocation is width-quirky
    (observed on-chip: the same br=200 multi-pass fits at wx=3840 but
    overflows by 12% at wx=3712), so a smaller-block replan recovers such
    shapes instead of pinning them to the ~10x slower XLA path.
    """
    row_bytes = nx * itemsize
    budget_rows = (budget or _VMEM_BUDGET_WIDE) // row_bytes

    # Candidate block heights: sublane-tile multiples dividing ny (8 rows
    # for f32, 16 for bf16). Heavy-coefficient stencils cap the block
    # height — many live coefficient windows degrade pipelining at large br
    # (measured: 5-coef br=96 runs 0.64x of br=48).
    tile = _sublane_tile(itemsize)
    heavy = n_coef >= 4 and not _PACK_COEF
    br_cap = min(ny, _BR_CAP_HEAVY if heavy else 512)
    brs = [b for b in range(tile, br_cap + 1, tile) if ny % b == 0]
    if br_divides is not None:
        # ring mode: the block height must divide the LOCAL rows with at
        # least two blocks per shard (edge blocks need interior to overlap)
        brs = [b for b in brs
               if br_divides % b == 0 and b <= br_divides // 2]
    if not brs:
        return None

    if n_steps <= max_fuse:
        hm = halo_mult or _halo_mult(itemsize)
        halo = -(-n_steps // hm) * hm  # aligned single-pass halo
        cands = [
            b for b in brs
            if b >= halo and _vmem_rows(
                b, halo, n_coef, has_post, single_pass=True) <= budget_rows
        ]
        if cands:
            br = min(cands, key=lambda b: (abs(b - _BR_TARGET_SCALAR), -b))
            return PassPlan(br=br, halo=_strip_halo(br, halo, itemsize),
                            steps=(n_steps,))

    best = None
    # Multi-pass candidates respect the same measured sweet-spot ceiling as
    # the single-pass target: blocks past ~160 rows degrade Mosaic's
    # pipelining (the br=240 cliff in benchmarks/sweep_br.json), and the
    # cost model's VPU term would otherwise chase ever-larger blocks —
    # round 4's br=200 taper plan was exactly the config that fails to
    # compile at wx=3712 f32 and burned the one replan retry every run.
    brs_mp = [b for b in brs if b <= _BR_TARGET_SCALAR] or brs[:1]
    for br in brs_mp:
        # Largest per-pass step count allowed by this block height.
        h = min(max_fuse, n_steps, br)
        while h >= 1 and _vmem_rows(
            br, h, n_coef, has_post, single_pass=(h >= n_steps)
        ) > budget_rows:
            h -= 1
        if h < 1:
            continue
        # Cost model: HBM streams for the whole filter (pass 1 reads 3 field
        # views + ext coefs, writes 3 — or 1 if single pass; later passes
        # read 6 views + acc + ext coefs), plus a VPU term for the redundant
        # trapezoid compute at block seams (the fused kernel is VPU-bound on
        # current TPUs, so seam overhead matters as much as streams).
        ext = (n_coef + int(has_post)) * (1.0 + 2.0 * h / br)
        n_pass = -(-n_steps // h)
        if n_pass == 1:
            streams = 3 + ext + 1
        else:
            streams = (3 + ext + 3) + (n_pass - 1) * (7 + ext + 3) - 2
        vpu = 3.0 * n_steps * (br + 2.0 * h) / br  # ~3 stream-equiv/step/cell
        cost = streams + vpu
        if best is None or cost < best[0]:
            best = (cost, br, h)
    if best is None:
        return None
    _, br, h = best

    # Balanced split: ceil(n/h) near-equal passes (a trailing 1-op remainder
    # pass would waste a full HBM sweep on one step).
    n_pass = -(-n_steps // h)
    base, extra = divmod(n_steps, n_pass)
    steps = tuple(base + (1 if i < extra else 0) for i in range(n_pass))
    # Round the halo allocation up so the window height br+2*halo stays a
    # multiple of 8 (sublane tile): unaligned windows measured ~1.5x slower.
    hm = halo_mult or _halo_mult(itemsize)
    halo = min(br, -(-max(steps) // hm) * hm)
    return PassPlan(br=br, halo=_strip_halo(br, halo, itemsize), steps=steps)


def _ext_col_index(nx: int, wx: int, halo: int) -> np.ndarray:
    """(wx,) source-column map of the offset-0 tail-wrap layout (see
    :func:`_ext_geometry`): [0, nx) real, then the east wrap, then — at the
    LAST halo positions — the west wrap. Interior-gap positions take the
    plain periodic value (a valid superset of "don't care")."""
    cols = np.arange(wx)
    return np.where(cols < wx - halo, cols % nx, (cols - wx) % nx)


def ext_blocks_np(
    arr: np.ndarray, br: int, halo: int, fold: bool = False,
    mirror_src: Optional[np.ndarray] = None, wx: Optional[int] = None,
) -> np.ndarray:
    """Pre-gather a coefficient array into (nb, br+2H, wx) extended layout.

    Block i covers global rows [i*br - H, (i+1)*br + H) with periodic wrap;
    on fold grids the top block's north halo holds the seam-mirrored rows of
    ``mirror_src`` (the n/s- or e/w-swapped partner coefficient). With
    ``wx > nx`` the columns are wrap-extended to the kernel's lane-aligned
    compute width in the tail-wrap layout (see :func:`_ext_geometry`).
    """
    ny, nx = arr.shape[-2:]
    nb = ny // br
    idx = (np.arange(-halo, br + halo)[None, :] + br * np.arange(nb)[:, None]) % ny
    ext = arr[..., idx, :]  # (nb, br+2H, nx)
    if fold:
        # ext rows ny..ny+H-1 of the top block: real rows ny-1-j, reversed.
        mirror = mirror_src[..., ny - halo : ny, :][..., ::-1, ::-1]
        ext = np.array(ext)
        ext[..., -1, br + halo :, :] = mirror
    if wx is not None and wx != nx:
        ext = ext[..., _ext_col_index(nx, wx, halo)]
    return ext


def ext_blocks_jnp(
    arr: jax.Array, br: int, halo: int, wx: Optional[int] = None,
) -> jax.Array:
    """Runtime (traced) counterpart of :func:`ext_blocks_np`, periodic only."""
    ny, nx = arr.shape[-2:]
    nb = ny // br
    idx = (np.arange(-halo, br + halo)[None, :] + br * np.arange(nb)[:, None]) % ny
    ext = arr[..., idx, :]
    if wx is not None and wx != nx:
        ext = ext[..., _ext_col_index(nx, wx, halo)]
    return ext


def _mirror_chunk(x: jax.Array, halo: int, rows_m: int) -> jax.Array:
    """(rows_m, nx) chunk whose first H rows are the seam mirror of ``x``."""
    m = x[..., -halo:, :][..., ::-1, ::-1]
    if rows_m > halo:
        pad = [(0, 0)] * (m.ndim - 2) + [(0, rows_m - halo), (0, 0)]
        m = jnp.pad(m, pad)
    return m


def _pblk(ring: bool, nb: int, j):
    """Block id at grid position ``j``: ring mode processes the two
    shard-edge blocks LAST so their remote halos arrive while the interior
    blocks compute (the overlap). Used both inside the kernels and as the
    index-map counterpart for blocked inputs/outputs."""
    if not ring or nb <= 2:
        return j
    return jnp.where(j < nb - 2, j + 1,
                     jnp.where(j == nb - 2, 0, nb - 1))


class _WindowStreamer:
    """Manual-DMA window streaming shared by the scalar and coupled kernels.

    Owns the double-buffered HBM->VMEM window segments (periodic wrap, or
    ring-mode assembly from remote-filled halo buffers), the block-(i+1)
    prefetch schedule, and the ring remote-copy descriptors with their
    entry barrier and exit send-drain. The scalar kernel streams (ny, nx)
    fields (``lead=0``); the coupled kernel streams (2, ny, nx) stacked
    pairs (``lead=1``) — the row/lane geometry is identical, the stacked
    axis rides through leading full slices.
    """

    def __init__(self, *, lead, n_fields, ny, nx, br, halo, nb, win,
                 ring, ring_axis, ring_size, interp, f_hbm, sbufs, sem,
                 hs_bufs=None, hn_bufs=None, rsem=None, ssem=None, tile=8):
        self.lead, self.n_fields = lead, n_fields
        self.tile = tile
        self.ny, self.nx, self.br, self.halo = ny, nx, br, halo
        self.nb, self.win = nb, win
        self.ring, self.ring_size, self.interp = ring, ring_size, interp
        self.f_hbm, self.sbufs, self.sem = f_hbm, sbufs, sem
        self.hs_bufs, self.hn_bufs = hs_bufs, hn_bufs
        self.rsem, self.ssem = rsem, ssem
        self.pre = (slice(None),) * lead
        if ring:
            psize = np.int32(ring_size)  # match axis_index (x64-safe)
            self.my = jax.lax.axis_index(ring_axis)
            self.up_dev = jax.lax.rem(self.my + np.int32(1), psize)
            self.dn_dev = jax.lax.rem(self.my + psize - np.int32(1), psize)

    def pblk(self, j):
        return _pblk(self.ring, self.nb, j)

    def rem_desc(self, fi, up):
        """SPMD ring-copy descriptor for field ``fi``: ``up`` sends my top
        ``halo`` rows to the up-neighbor's south buffer (so my own hs
        receives from my down-neighbor running the same descriptor);
        ``not up`` sends my bottom rows to the down-neighbor's north
        buffer."""
        ny, halo, pre = self.ny, self.halo, self.pre
        if up:
            return pltpu.make_async_remote_copy(
                src_ref=self.f_hbm[fi].at[
                    (*pre, pl.ds(ny - halo, halo), slice(None))],
                dst_ref=self.hs_bufs[fi],
                send_sem=self.ssem.at[fi, 0], recv_sem=self.rsem.at[fi, 0],
                device_id=self.up_dev,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
        return pltpu.make_async_remote_copy(
            src_ref=self.f_hbm[fi].at[(*pre, pl.ds(0, halo), slice(None))],
            dst_ref=self.hn_bufs[fi],
            send_sem=self.ssem.at[fi, 1], recv_sem=self.rsem.at[fi, 1],
            device_id=self.dn_dev,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def prologue(self, i):
        """Per-grid-step I/O schedule: ring sends at entry (overlapping the
        interior blocks), send-drain at exit, block-0 load + block-(i+1)
        prefetch, and the wait for block i's own window."""
        nb = self.nb
        if self.ring:
            @pl.when(i == 0)
            def _():
                if not self.interp:
                    # All ring participants must have entered this pass
                    # before any remote write lands (buffer-liveness across
                    # chained invocations); interpret-mode discharge is
                    # synchronous and needs no barrier.
                    bsem = pltpu.get_barrier_semaphore()
                    pltpu.semaphore_signal(
                        bsem, 1, device_id=self.up_dev,
                        device_id_type=pltpu.DeviceIdType.LOGICAL)
                    pltpu.semaphore_signal(
                        bsem, 1, device_id=self.dn_dev,
                        device_id_type=pltpu.DeviceIdType.LOGICAL)
                    pltpu.semaphore_wait(bsem, 2)
                for fi in range(self.n_fields):
                    self.rem_desc(fi, True).start()
                    self.rem_desc(fi, False).start()

            @pl.when(i == nb - 1)
            def _():
                for fi in range(self.n_fields):
                    self.rem_desc(fi, True).wait_send()
                    self.rem_desc(fi, False).wait_send()

        @pl.when(i == 0)
        def _():
            self.window_io(0, 0, "start")

        @pl.when(i + 1 < nb)
        def _():
            self.window_io((i + 1) % 2, i + 1, "start")

        self.window_io(i % 2, i, "wait")

    def _seg(self, fi, slot, src, d0, n, sidx):
        # full-width rows only: DMA eligibility requires nx % 128 == 0
        # (Mosaic's HBM slice tiling), so no lane offsets exist here
        buf, pre = self.sbufs[fi], self.pre
        dst = buf.at[(slot, *pre, pl.ds(d0, n), slice(None))]
        return pltpu.make_async_copy(src, dst, self.sem.at[fi, slot, sidx])

    def _hbm(self, fi, s0, n):
        if not isinstance(s0, int):
            # br/halo are tile multiples, so traced offsets are too — tell
            # Mosaic the full alignment (16 rows for bf16, 8 for f32)
            s0 = pl.multiple_of(s0, self.tile)
        return self.f_hbm[fi].at[(*self.pre, pl.ds(s0, n), slice(None))]

    def _window_copies(self, fi, slot, j, top):
        """The async-copy descriptors loading field ``fi``'s block-j window
        — rows [j*br - halo, (j+1)*br + halo) with periodic wrap — into
        sbufs[fi][slot] at lane offset hl. ``top=False`` covers every j
        whose wrap (if any) is at the south edge; ``top=True`` is the last
        block (north wrap). Offsets/counts are sublane-tile aligned (br,
        halo), as HBM slices demand. Built per-branch: an unconsumed
        descriptor is an error in interpret mode."""
        ny, br, halo = self.ny, self.br, self.halo
        seg = lambda s0, n, d0, sidx: self._seg(
            fi, slot, self._hbm(fi, s0, n), d0, n, sidx)
        if top:
            return [seg(ny - br - halo, br + halo, 0, 0),
                    seg(0, halo, br + halo, 1)]
        return [seg((j * br - halo) % ny, halo, 0, 0),
                seg(j * br, br + halo, halo, 1)]

    def _ring_copies(self, fi, slot, jb, kind):
        """Ring-mode window segments for block ``jb``: interior blocks
        stream one contiguous core slice; the south/north edge blocks take
        their outer ``halo`` rows from the remote-filled hs/hn buffers
        instead of a periodic wrap."""
        ny, br, halo, pre = self.ny, self.br, self.halo, self.pre
        seg = lambda src, d0, n, sidx: self._seg(fi, slot, src, d0, n, sidx)
        full = (*pre, slice(None), slice(None))
        if kind == "south":  # jb == 0
            return [seg(self.hs_bufs[fi].at[full], 0, halo, 0),
                    seg(self._hbm(fi, 0, br + halo), halo, br + halo, 1)]
        if kind == "north":  # jb == nb - 1
            return [seg(self._hbm(fi, ny - br - halo, br + halo), 0,
                        br + halo, 0),
                    seg(self.hn_bufs[fi].at[full], br + halo, halo, 1)]
        return [seg(self._hbm(fi, jb * br - halo, self.win), 0, self.win, 0)]

    def window_io(self, slot, j, op):
        # Descriptors are built inside their branch: an unconsumed
        # descriptor is an error in interpret mode.
        nb = self.nb
        if self.ring:
            jb = self.pblk(j)
            for fi in range(self.n_fields):
                @pl.when(jb == 0)
                def _():
                    if op == "start":
                        # halo must have landed before reading it back
                        self.rem_desc(fi, True).wait_recv()
                    for d in self._ring_copies(fi, slot, jb, "south"):
                        getattr(d, op)()

                @pl.when(jb == nb - 1)
                def _():
                    if op == "start":
                        self.rem_desc(fi, False).wait_recv()
                    for d in self._ring_copies(fi, slot, jb, "north"):
                        getattr(d, op)()

                if nb > 2:
                    # no mid blocks exist at nb == 2 — and tracing their
                    # win-row HBM slice would fail outright when the
                    # window is taller than the local rows (win > ly),
                    # even though the branch never executes
                    @pl.when((jb != 0) & (jb != nb - 1))
                    def _():
                        for d in self._ring_copies(fi, slot, jb, "mid"):
                            getattr(d, op)()
            return
        for fi in range(self.n_fields):
            @pl.when(j != nb - 1)
            def _():
                for d in self._window_copies(fi, slot, j, top=False):
                    getattr(d, op)()

            @pl.when(j == nb - 1)
            def _():
                for d in self._window_copies(fi, slot, j, top=True):
                    getattr(d, op)()


@dataclasses.dataclass(frozen=True)
class _PassConfig:
    """Static description of one fused pass kernel.

    Ring mode (``ring_axis`` set): the kernel is the per-shard slice of the
    GLOBAL plan on a 1-D y-sharded mesh. ``ny`` is then the LOCAL row count
    (ly = ny_global / ring_size); shard-edge windows are assembled from halo
    buffers filled by in-kernel ``make_async_remote_copy`` ring sends
    (issued at kernel entry, so the transfer overlaps the interior blocks,
    which are processed first; the two edge blocks run last). Because every
    block sees exactly the rows the unsharded kernel's periodic/fold window
    would contain, the sharded result is bitwise identical to the global
    kernel by construction.
    """

    ny: int
    nx: int
    br: int
    halo: int
    n_ops: int
    coef_names: Tuple[str, ...]  # which of c/n/s/e/w are arrays
    consts: Dict[str, float]  # the rest, as compile-time immediates
    # Exact-NaN mode: keep the per-step pre-mask IN the kernel as one more
    # extended coefficient stream (g = pre * nan_to_num(t)), reproducing the
    # reference's re-scrub-every-step semantics for wet-cell NaNs instead of
    # the h-space elimination. ~1 extra stream of cost; opt-in.
    has_pre: bool
    has_post: bool
    zap: bool
    fold: bool
    first_pass: bool
    last_pass: bool
    lap_scale: float
    dtype: object
    # End fusion (single-device path): the first pass takes the RAW field and
    # does prepare (*area) + h-space masking in-window; the last pass does the
    # land reconstruction + finalize (/area) and emits the filtered result —
    # no XLA prologue/epilogue passes over the field at all.
    fuse_ends: bool = False
    has_area: bool = False
    drop_pre: bool = False
    land_gain: float = 0.0
    # Logical (real-column) output width when the caller supplies
    # lane-extended tail-wrap inputs of width nx (see _ext_geometry /
    # lane_extend_jnp): the kernel runs as a pure aligned problem of width
    # nx and truncates ONLY the final output to out_nx real columns.
    # 0 = inputs are unextended; no truncation.
    out_nx: int = 0
    # Ring mode (see class docstring): mesh axis carrying the 1-D y
    # decomposition and its size. None = ordinary single-device kernel.
    ring_axis: Optional[str] = None
    ring_size: int = 0

    @property
    def nb(self) -> int:
        return self.ny // self.br

    @property
    def win(self) -> int:
        return self.br + 2 * self.halo

    @property
    def n_fields(self) -> int:
        return 1 if self.first_pass else 2  # h, or (t1, t2)

    @property
    def n_p(self) -> int:
        return self.n_ops + 1 if self.first_pass else self.n_ops

    @property
    def rows_m(self) -> int:
        # mirror chunks padded to the sublane tile (8 rows f32, 16 bf16)
        return max(_sublane_tile(np.dtype(self.dtype).itemsize), self.halo)


def _build_pass_call(cfg: _PassConfig):
    """The pallas_call shared by both builder entry points.

    Input order: p (SMEM), 3 views per field, [acc], [mirror chunks x fields],
    one (nb, win, nx) extended-layout array per array coefficient, [post ext].
    Outputs: (t1, t2, acc) or (acc,) for the last pass.
    """
    br, halo, nb, win = cfg.br, cfg.halo, cfg.nb, cfg.win
    nx = cfg.nx  # the KERNEL width (== wx when the caller extended lanes)
    out_nx = cfg.out_nx or nx

    def xslice(a):
        # offset-0 layout: slicing the leading out_nx lanes of the FINAL
        # output is a free truncation (real columns sit at offset 0)
        return a[..., :out_nx] if out_nx != nx else a

    npdt = np.dtype(cfg.dtype)
    # Coefficients (array inputs AND consts) arrive pre-scaled by -2*lap_scale
    # so the recurrence needs no per-cell scale multiply:
    #   lap'(t) = post * sum(X' * t_X),  X' = -2*lap_scale*X
    #   A t     = -t + 0.5 * lap'(t)
    #   t_next  = -2*t + lap'(t) - t_prev
    half = npdt.type(0.5)
    coef_names = cfg.coef_names
    consts = {k: npdt.type(-2.0 * cfg.lap_scale * v) for k, v in cfg.consts.items()}
    has_post, zap, fold = cfg.has_post, cfg.zap, cfg.fold

    fuse = cfg.fuse_ends
    # fbar is only needed at own rows for the land reconstruction; area-only
    # grids finalize from acc alone, so don't stream the raw field for them.
    need_field_own = fuse and cfg.last_pass and not cfg.first_pass and cfg.drop_pre
    dma = _dma_on(cfg)
    # Strip-shaped neighbor views (round 5): when the halo divides the
    # block height (the planner's _strip_halo arranges this), the two
    # neighbor reads stream (halo, nx) strips instead of full (br, nx)
    # blocks — field traffic drops from 3 to 1 + 2*halo/br streams per
    # field per pass. The assembled window is IDENTICAL (same rows), so
    # the Pallas-vs-XLA exactness invariant is untouched.
    strips = (_STRIPS and not dma and cfg.br % cfg.halo == 0
              and cfg.halo % _sublane_tile(npdt.itemsize) == 0)
    ny = cfg.ny
    ring = cfg.ring_axis is not None
    interp = jax.default_backend() != "tpu"
    if ring:
        assert dma and nb >= 2 and cfg.ring_size >= 2
    # Packed extended streams (_PACK_COEF): index layout mirrors the
    # unpacked pop order below (coefficients, then pre/post/area) and the
    # host_ext_inputs append order.
    ext_names = list(coef_names)
    if cfg.has_pre:
        ext_names.append("pre")
    if has_post:
        ext_names.append("post")
    if fuse and cfg.has_area:
        ext_names.append("area")
    # Ring kernels stay UNPACKED: the ring path's bitwise-vs-unsharded
    # validation requires both sides to share one coefficient layout, and
    # packing perturbs XLA's FMA contraction at the last bit (measured on
    # CPU interpret; packed vs unpacked agree to roundoff, not bitwise).
    packed = _PACK_COEF and cfg.ring_axis is None and len(ext_names) >= 2
    ext_idx = {k: j for j, k in enumerate(ext_names)}

    def kernel(p_ref, *refs):
        refs = list(refs)
        if dma:
            f_hbm = [refs.pop(0) for _ in range(cfg.n_fields)]
            f_views = None
        else:
            f_views = [
                [refs.pop(0) for _ in range(3)] for _ in range(cfg.n_fields)
            ]
        acc_ref = None if cfg.first_pass else refs.pop(0)
        field_own_ref = refs.pop(0) if need_field_own else None
        mirrors = [refs.pop(0) for _ in range(cfg.n_fields)] if fold else []
        if packed:
            ext_ref = refs.pop(0)
            coef_refs = pre_ref = post_ref = area_ref = None
        else:
            ext_ref = None
            coef_refs = {k: refs.pop(0) for k in coef_names}
            pre_ref = refs.pop(0) if cfg.has_pre else None
            post_ref = refs.pop(0) if has_post else None
            area_ref = refs.pop(0) if (fuse and cfg.has_area) else None
        if cfg.last_pass:
            acc_out = refs.pop(0)
            t1_out = t2_out = None
        else:
            t1_out, t2_out, acc_out = refs.pop(0), refs.pop(0), refs.pop(0)
        if ring:
            # halo receive buffers (ANY memory): filled by the neighbors'
            # remote copies, read back by the edge blocks' window DMAs
            hs_bufs = [refs.pop(0) for _ in range(cfg.n_fields)]
            hn_bufs = [refs.pop(0) for _ in range(cfg.n_fields)]
        scratches = refs  # DMA window buffers + x-extension staging buffers
        if ring:
            rsem = scratches.pop()  # remote recv semaphores
            ssem = scratches.pop()  # remote send semaphores
        if dma:
            sem = scratches.pop()  # DMA semaphores ride last
            sbufs = [scratches.pop(0) for _ in range(cfg.n_fields)]

        i = pl.program_id(0)

        if dma:
            ws = _WindowStreamer(
                lead=0, n_fields=cfg.n_fields, ny=ny, nx=nx, br=br,
                halo=halo, nb=nb, win=win, ring=ring,
                ring_axis=cfg.ring_axis, ring_size=cfg.ring_size,
                interp=interp, f_hbm=f_hbm, sbufs=sbufs, sem=sem,
                hs_bufs=hs_bufs if ring else None,
                hn_bufs=hn_bufs if ring else None,
                rsem=rsem if ring else None, ssem=ssem if ring else None,
                tile=_sublane_tile(npdt.itemsize))
            ws.prologue(i)

        def dma_window(fi, mirror_ref):
            """Finish assembling field ``fi``'s window in its DMA scratch:
            the top block swaps the fold-mirror rows in for the north halo.
            (DMA eligibility requires a lane-aligned nx, so there is no
            in-window lane extension on this path.)"""
            buf = sbufs[fi]
            slot = i % 2
            if fold:
                # ring mode: only the TOP shard's top block is the seam;
                # other shards' last blocks use the real north halo
                is_seam = ((ws.pblk(i) == nb - 1)
                           & (ws.my == cfg.ring_size - 1)
                           if ring else i == nb - 1)

                @pl.when(is_seam)
                def _():
                    buf[slot, halo + br :, :] = mirror_ref[:halo, :]
            return buf[slot]

        def window(views, mirror_ref):
            own, prev, nxt = views
            lo = prev[...] if strips else prev[br - halo :, :]
            hi = nxt[...] if strips else nxt[:halo, :]
            if fold:
                hi = jnp.where(i == nb - 1, mirror_ref[:halo, :], hi)
            return jnp.concatenate([lo, own[...], hi], axis=0)

        def ext(name):
            return ext_ref[0, ext_idx[name]]

        if packed:
            post = ext("post") if has_post else None
            pre = ext("pre") if cfg.has_pre else None
        else:
            post = post_ref[0] if has_post else None
            pre = pre_ref[0] if cfg.has_pre else None

        def coef(k):
            if k in ext_idx:
                return ext(k) if packed else coef_refs[k][0]
            return consts[k]

        # NOTE (round-3 on-chip A/B, 6 interleaved reps): factoring equal
        # constant coefficients — k*(gn+gs+ge+gw) instead of k*gn + k*gs +
        # k*ge + k*gw — measured consistently 16.4 G SLOWER (92 vs 104 G) on
        # the headline tripolar grid. The VPU fuses each coefficient multiply
        # into an FMA, so the naive chain is 1 mul + 4 FMAs already; the
        # factored form is the same op count on a longer dependency chain.
        # Keep the naive per-tap chain.
        def lap(t):
            if cfg.has_pre:
                # honor zap_nans: a custom pre-masked stencil with
                # zap_nans=False must propagate NaNs exactly like the XLA
                # engine (review finding, round 2)
                g = pre * (jnp.nan_to_num(t) if zap else t)
            else:
                g = jnp.nan_to_num(t) if zap else t
            gn = jnp.concatenate([g[1:, :], g[:1, :]], axis=0)
            gs = jnp.concatenate([g[-1:, :], g[:-1, :]], axis=0)
            ge = jnp.roll(g, -1, axis=-1)
            gw = jnp.roll(g, 1, axis=-1)
            out = coef("c") * g + coef("n") * gn + coef("s") * gs
            out = out + coef("e") * ge + coef("w") * gw
            if has_post:
                out = post * out
            return out

        own = slice(halo, halo + br)
        if fuse and cfg.has_area:
            area = ext("area") if packed else area_ref[0]
        else:
            area = None
        fbar_w = None

        def field_window(fi):
            m = mirrors[fi] if fold else None
            if dma:
                return dma_window(fi, m)
            return window(f_views[fi], m)

        if cfg.first_pass:
            w = field_window(0)
            if fuse:
                # prepare (*area) + h-space masking, in-window
                fbar_w = w * area if cfg.has_area else w
                w = (
                    post * jnp.nan_to_num(fbar_w)
                    if cfg.drop_pre
                    else fbar_w
                )
            prev = w  # T_0 = h
            cur = -prev + half * lap(prev)  # T_1 = A h
            acc = p_ref[0, 0] * prev[own] + p_ref[0, 1] * cur[own]
            p_off = 2
        else:
            cur = field_window(0)
            prev = field_window(1)
            acc = acc_ref[...]
            p_off = 0

        n_rec = cfg.n_ops - 1 if cfg.first_pass else cfg.n_ops
        for j in range(n_rec):
            nxt = -2.0 * cur + lap(cur) - prev
            acc = acc + p_ref[0, p_off + j] * nxt[own]
            prev, cur = cur, nxt

        if not cfg.last_pass:
            # full kernel width: the dispatcher refreshes the wrap strips
            # (refresh_wrap_jnp) before the next pass consumes these
            t1_out[...] = cur[own]
            t2_out[...] = prev[own]
            acc_out[...] = acc.astype(cfg.dtype)
            return

        if fuse:
            # land reconstruction + finalize (/area), in-window
            if cfg.drop_pre:
                if cfg.first_pass:
                    fbar_own = fbar_w[own]
                elif cfg.has_area:
                    fbar_own = field_own_ref[...] * area[own]
                else:
                    fbar_own = field_own_ref[...]
            if cfg.drop_pre:
                # 0*fbar poisons wet-cell NaNs back into the result (the
                # h-space recurrence scrubbed them; the reference keeps a
                # NaN cell NaN while neighbors see it as zero).
                gain = npdt.type(cfg.land_gain)
                acc = jnp.where(
                    post[own] == 0, gain * fbar_own,
                    acc + fbar_own * npdt.type(0),
                )
            if cfg.has_area:
                acc = acc / area[own]
        acc_out[...] = xslice(acc).astype(cfg.dtype)

    def _pblk_map(j):
        # index-map counterpart of the kernel-side block reorder
        return _pblk(ring, nb, j)

    def blk(index_map=None):
        if index_map is None:
            index_map = lambda i: (_pblk_map(i), 0)
        return pl.BlockSpec((br, cfg.nx), index_map, memory_space=pltpu.VMEM)

    def views():
        if strips:
            # neighbor strips on the (ny/halo)-strip grid: prev = the halo
            # rows just below the block, next = the halo rows just above
            r = br // halo
            nsb = nb * r
            sblk = lambda im: pl.BlockSpec((halo, cfg.nx), im,
                                           memory_space=pltpu.VMEM)
            return [
                blk(lambda i: (i, 0)),
                sblk(lambda i: ((i * r - 1) % nsb, 0)),
                sblk(lambda i: (((i + 1) * r) % nsb, 0)),
            ]
        return [
            blk(lambda i: (i, 0)),
            blk(lambda i: ((i - 1) % nb, 0)),
            blk(lambda i: ((i + 1) % nb, 0)),
        ]

    in_specs = [
        pl.BlockSpec((1, cfg.n_p), lambda i: (0, 0), memory_space=pltpu.SMEM)
    ]
    for _ in range(cfg.n_fields):
        if dma:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        else:
            in_specs += views()
    if not cfg.first_pass:
        in_specs.append(blk())  # acc
    if need_field_own:
        in_specs.append(blk())  # raw field, own rows (finalize)
    if fold:
        in_specs += [
            pl.BlockSpec((cfg.rows_m, cfg.nx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(cfg.n_fields)
        ]
    n_ext = (len(coef_names) + int(cfg.has_pre) + int(has_post)
             + int(fuse and cfg.has_area))
    assert n_ext == len(ext_names)
    if packed:
        # one stacked (n_ext, win, wx) chunk per block — fully contiguous
        # in HBM by the (nb, n_ext, win, wx) host layout (host_ext_inputs)
        in_specs.append(
            pl.BlockSpec((1, n_ext, win, cfg.nx),
                         lambda i: (_pblk_map(i), 0, 0, 0),
                         memory_space=pltpu.VMEM))
    else:
        in_specs += [
            pl.BlockSpec((1, win, cfg.nx), lambda i: (_pblk_map(i), 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_ext)
        ]

    # non-last outputs stay at the full kernel width (the caller refreshes
    # wrap strips between passes); ONLY the final output truncates to the
    # real columns (free at lane offset 0)
    n_out = 1 if cfg.last_pass else 3
    if cfg.last_pass:
        out_specs = [pl.BlockSpec((br, out_nx),
                                  lambda i: (_pblk_map(i), 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((cfg.ny, out_nx), cfg.dtype)]
    else:
        out_specs = [blk() for _ in range(n_out)]
        out_shape = [
            jax.ShapeDtypeStruct((cfg.ny, cfg.nx), cfg.dtype)
            for _ in range(n_out)
        ]
    if ring:
        # halo receive buffers (written by the neighbors' remote DMAs)
        out_specs += [pl.BlockSpec(memory_space=pl.ANY)
                      for _ in range(2 * cfg.n_fields)]
        out_shape += [
            jax.ShapeDtypeStruct((halo, cfg.nx), cfg.dtype)
            for _ in range(2 * cfg.n_fields)
        ]

    scratch_shapes = []
    if dma:
        scratch_shapes += [
            pltpu.VMEM((2, win, cfg.nx), cfg.dtype)
            for _ in range(cfg.n_fields)
        ]
        scratch_shapes.append(
            pltpu.SemaphoreType.DMA((cfg.n_fields, 2, 2)))
    if ring:
        # popped from the end in the kernel: ..., sem, ssem, rsem
        scratch_shapes.append(pltpu.SemaphoreType.DMA((cfg.n_fields, 2)))
        scratch_shapes.append(pltpu.SemaphoreType.DMA((cfg.n_fields, 2)))

    n_arrays = n_ext
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=12 * cfg.n_ops * nb * win * cfg.nx,
            bytes_accessed=int(
                ((1 + 2 * halo / br if strips else 3) * cfg.n_fields
                 + n_out + 1) * cfg.ny * cfg.nx * npdt.itemsize
            ) + n_arrays * nb * win * cfg.nx * npdt.itemsize,
            transcendentals=0,
        ),
        # lift Mosaic's default 16 MiB scoped-vmem cap (the chip has 128 MB;
        # the lift alone measured +33% on the headline at unchanged br, and
        # enables the large single-pass blocks; ignored in interpret mode).
        # Ring kernels use the entry barrier semaphore -> collective_id.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
            **({"collective_id": 0} if ring and not interp else {}),
        ),
        interpret=interp,
    )


def build_cheb_pass(
    stencil: ScalarStencil5,
    lap_scale: float,
    ny: int,
    nx: int,
    dtype,
    plan: PassPlan,
    n_ops: int,
    first_pass: bool,
    last_pass: bool,
    drop_pre: bool = False,
    land_gain: float = 0.0,
):
    """Build one fused pass performing ``n_ops`` operator applications.

    Single-device entry point (fold-capable), with END FUSION: the first pass
    consumes the RAW field and performs prepare (*area) plus the h-space
    masking in-window; the last pass performs the land reconstruction and
    finalize (/area) and emits the final filtered result. ``coef_exts`` are
    the runtime extended-layout arrays from :func:`host_ext_inputs`.
    Signatures of the returned function:

      first+last : (p[0..n_ops],  coef_exts, field)                -> result
      first      : (p[0..n_ops],  coef_exts, field)                -> (t1, t2, acc)
      middle     : (p[0..n_ops-1], coef_exts, t1, t2, acc)         -> (t1, t2, acc)
      last       : (p[0..n_ops-1], coef_exts, t1, t2, acc, field)  -> result

    Widths: with a lane-aligned nx all arrays are (ny, nx). Otherwise the
    kernel runs as a pure aligned problem of width wx = _ext_geometry(nx,
    plan.halo): the caller supplies field/t1/t2/acc LANE-EXTENDED to
    (ny, wx) via :func:`lane_extend_jnp`, refreshes the t1/t2 wrap strips
    between passes (:func:`refresh_wrap_jnp`), and receives non-last
    outputs at (ny, wx) but the FINAL result truncated to (ny, nx).
    ``stencil.pre`` is either None (h-space mode: ``drop_pre`` says the
    elimination applies, with ``stencil.post`` as the 0/1 wet mask and
    ``land_gain = chebval(-1, p)``, see dispatch.py) or kept as an
    in-kernel per-step mask stream (exact-NaN mode).
    """
    assert stencil.pre is None or not drop_pre
    br, halo = plan.br, plan.halo
    assert n_ops <= halo and halo <= br and ny % br == 0

    coef_names = tuple(_coef_arrays(stencil))
    fold = stencil.fold_north
    wx = _ext_geometry(nx, halo)[0]
    cfg = _PassConfig(
        ny=ny, nx=wx, out_nx=(nx if wx != nx else 0),
        br=br, halo=halo, n_ops=n_ops,
        coef_names=coef_names,
        consts={k: float(getattr(stencil, k)) for k in COEF_NAMES
                if k not in coef_names},
        has_pre=stencil.pre is not None,
        has_post=stencil.post is not None,
        zap=stencil.zap_nans,
        fold=fold,
        first_pass=first_pass,
        last_pass=last_pass,
        lap_scale=lap_scale,
        dtype=dtype,
        fuse_ends=True,
        has_area=stencil.area is not None,
        drop_pre=drop_pre,
        land_gain=land_gain,
    )
    grid_call = _build_pass_call(cfg)
    n_rep = 1 if _dma_on(cfg) else 3  # DMA windows take the field once

    def _mirror(f):
        # fields arrive lane-extended; the seam mirror must be computed
        # from the REAL columns and re-extended (reversal does not commute
        # with the tail-wrap layout)
        if wx == nx:
            return _mirror_chunk(f, halo, cfg.rows_m)
        return lane_extend_jnp(
            _mirror_chunk(f[..., :nx], halo, cfg.rows_m), wx, halo)

    def pass_fn(p_chunk, coef_exts, *fields_and_acc):
        fields = fields_and_acc[: cfg.n_fields]
        args = [jnp.reshape(p_chunk, (1, cfg.n_p)).astype(p_dtype(dtype))]
        for f in fields:
            args += [f] * n_rep
        if not first_pass:
            args.append(fields_and_acc[cfg.n_fields])  # acc
            if last_pass and drop_pre:
                args.append(fields_and_acc[cfg.n_fields + 1])  # raw field
        if fold:
            args += [_mirror(f) for f in fields]
        args += list(coef_exts)
        out = grid_call(*args)
        return out[0] if last_pass else tuple(out)

    return pass_fn


def host_ext_inputs(
    stencil: ScalarStencil5, plan: PassPlan, ny: int, nx: int, dtype,
    lap_scale: float, packed: Optional[bool] = None,
) -> List[np.ndarray]:
    """The extended-block coefficient arrays for :func:`build_cheb_pass`.

    Built once per (plan, shape, dtype) on the host, pre-scaled by
    ``-2*lap_scale`` (the kernel's coefficient convention; ``post`` is NOT
    scaled). The caller should pass them to the compiled function as
    *runtime arguments* (eager device arrays), never as trace-time
    constants — multi-hundred-MB constants get serialized into the compile
    payload.
    """
    br, halo = plan.br, plan.halo
    wx = _ext_geometry(nx, halo)[0]
    fold = stencil.fold_north
    npdt = np.dtype(dtype)
    neg2s = npdt.type(-2.0 * lap_scale)

    def _host(a):
        return np.asarray(a, dtype=npdt) * neg2s

    def _full(v):
        if isinstance(v, (int, float)):
            return np.broadcast_to(npdt.type(v) * neg2s, (ny, nx))
        return _host(v)

    out = [
        ext_blocks_np(
            _host(getattr(stencil, k)), br, halo, fold,
            _full(getattr(stencil, _MIRROR_SWAP[k])), wx=wx,
        )
        for k in _coef_arrays(stencil)
    ]
    if stencil.pre is not None:
        pre = np.asarray(stencil.pre, dtype=npdt)  # pre is NOT scaled
        out.append(ext_blocks_np(pre, br, halo, fold, pre, wx=wx))
    if stencil.post is not None:
        post = np.asarray(stencil.post, dtype=npdt)  # post is NOT scaled
        out.append(ext_blocks_np(post, br, halo, fold, post, wx=wx))
    if stencil.area is not None:
        area = np.asarray(stencil.area, dtype=npdt)  # area is NOT scaled
        out.append(ext_blocks_np(area, br, halo, fold, area, wx=wx))
    if packed is None:
        packed = _PACK_COEF
    if packed and len(out) >= 2:
        # one contiguous (nb, n_ext, win, wx) chunk per block — must match
        # the kernel's packed BlockSpec (_build_pass_call)
        return [np.stack(out, axis=1)]
    return out


def build_local_pass(
    ny: int,
    nx: int,
    dtype,
    br: int,
    halo: int,
    n_ops: int,
    coef_names: Sequence[str],
    consts: Dict[str, float],
    has_post: bool,
    zap: bool,
    lap_scale: float,
    first_pass: bool,
    last_pass: bool,
    has_pre: bool = False,
    fuse_ends: bool = False,
    has_area: bool = False,
    drop_pre: bool = False,
    land_gain: float = 0.0,
):
    """Build the per-shard inner pass for the shard_map engine.

    Runtime-coefficient entry point: the (nb, br+2H, nx) extended-layout
    coefficient arrays are *arguments* of the returned function (built inside
    shard_map with :func:`ext_blocks_jnp` from device-halo-extended local
    coefficients, once per apply). Array coefficients must be pre-scaled by
    ``-2*lap_scale`` (post unscaled); the given ``consts`` are scaled here. The kernel itself is purely periodic —
    the device-level halo exchange already placed the fold/neighbor data, so
    wrap garbage at the domain edges stays confined to the halo zone that the
    caller discards.

    With ``fuse_ends`` the same end fusion as :func:`build_cheb_pass`
    applies: the first pass consumes the RAW (halo-extended, padded) field
    and performs prepare (*area) + h-space masking in-window; the last pass
    performs the land reconstruction + finalize (/area). The caller's
    coefficient exts must then also carry [pre], [post], [area] extended
    blocks in host_ext_inputs order, and the last pass of a multi-round
    schedule takes the padded raw field as its trailing argument.

      pass_fn(p_chunk, coef_exts, *fields_and_acc) -> same as build_cheb_pass
    """
    assert n_ops <= halo and halo <= br and ny % br == 0
    cfg = _PassConfig(
        ny=ny, nx=nx, br=br, halo=halo, n_ops=n_ops,
        coef_names=tuple(coef_names),
        consts=dict(consts),
        has_pre=has_pre,
        has_post=has_post,
        zap=zap,
        fold=False,
        first_pass=first_pass,
        last_pass=last_pass,
        lap_scale=lap_scale,
        dtype=dtype,
        fuse_ends=fuse_ends,
        has_area=has_area,
        drop_pre=drop_pre,
        land_gain=land_gain,
    )
    # callers (sharded local rounds, pad-to-block dispatch) always pad the
    # local width to a lane multiple (_lane_width), so no extension here
    assert nx % 128 == 0, nx
    grid_call = _build_pass_call(cfg)
    n_rep = 1 if _dma_on(cfg) else 3  # DMA windows take the field once

    def pass_fn(p_chunk, coef_exts, *fields_and_acc):
        fields = fields_and_acc[: cfg.n_fields]
        args = [jnp.reshape(p_chunk, (1, cfg.n_p)).astype(p_dtype(dtype))]
        for f in fields:
            args += [f] * n_rep
        if not first_pass:
            args.append(fields_and_acc[cfg.n_fields])  # acc
            if last_pass and fuse_ends and drop_pre:
                args.append(fields_and_acc[cfg.n_fields + 1])  # raw field
        args += list(coef_exts)
        out = grid_call(*args)
        return out[0] if last_pass else tuple(out)

    return pass_fn


def build_ring_pass(
    stencil: ScalarStencil5,
    lap_scale: float,
    ly: int,
    nx: int,
    dtype,
    plan: PassPlan,
    n_ops: int,
    first_pass: bool,
    last_pass: bool,
    ring_axis: str,
    ring_size: int,
    drop_pre: bool = False,
    land_gain: float = 0.0,
):
    """Per-shard slice of the GLOBAL fused pass on a 1-D y-sharded mesh.

    Same end-fused trapezoid kernel as :func:`build_cheb_pass`, but run
    inside shard_map on ``ly = ny_global / ring_size`` local rows with the
    halo exchange performed by the kernel itself (``make_async_remote_copy``
    ring sends at kernel entry overlapping the interior blocks — the SPMD
    compute/comm-overlap pattern; SURVEY.md §5/§7). Windows get exactly the
    rows the global kernel's periodic/fold windows would contain, so the
    sharded result is bitwise identical to the unsharded kernel. The
    coefficient exts are the GLOBAL ``host_ext_inputs`` layouts sharded over
    their leading (block) axis; the fold coefficient mirror is baked into
    the top shard's last block, and the field mirror chunk is computed
    per shard from its own top rows (only the top shard's block uses it).
    """
    assert stencil.pre is None or not drop_pre
    br, halo = plan.br, plan.halo
    # Eligibility is re-derived here rather than trusted from the caller:
    # an ineligible config returns None (-> round-based fallback), never a
    # crash or a kernel with wrong window data (CLAUDE.md fallback
    # invariant; review finding r3 on the assert/fallback mismatch).
    if not (n_ops <= halo <= br and ly % br == 0 and ly // br >= 2
            and halo % 8 == 0 and br % 8 == 0 and ring_size >= 2):
        return None

    coef_names = tuple(_coef_arrays(stencil))
    fold = stencil.fold_north
    cfg = _PassConfig(
        ny=ly, nx=nx, br=br, halo=halo, n_ops=n_ops,
        coef_names=coef_names,
        consts={k: float(getattr(stencil, k)) for k in COEF_NAMES
                if k not in coef_names},
        has_pre=stencil.pre is not None,
        has_post=stencil.post is not None,
        zap=stencil.zap_nans,
        fold=fold,
        first_pass=first_pass,
        last_pass=last_pass,
        lap_scale=lap_scale,
        dtype=dtype,
        fuse_ends=True,
        has_area=stencil.area is not None,
        drop_pre=drop_pre,
        land_gain=land_gain,
        ring_axis=ring_axis,
        ring_size=ring_size,
    )
    if not _dma_on(cfg):  # ring REQUIRES manual-DMA windows
        return None
    grid_call = _build_pass_call(cfg)

    def pass_fn(p_chunk, coef_exts, *fields_and_acc):
        fields = fields_and_acc[: cfg.n_fields]
        args = [jnp.reshape(p_chunk, (1, cfg.n_p)).astype(p_dtype(dtype))]
        for f in fields:
            args.append(f)
        if not first_pass:
            args.append(fields_and_acc[cfg.n_fields])  # acc
            if last_pass and drop_pre:
                args.append(fields_and_acc[cfg.n_fields + 1])  # raw field
        if fold:
            args += [_mirror_chunk(f, halo, cfg.rows_m) for f in fields]
        args += list(coef_exts)
        out = grid_call(*args)
        # drop the 2*n_fields halo receive buffers riding as trailing outputs
        out = out[: 1 if last_pass else 3]
        return out[0] if last_pass else tuple(out)

    return pass_fn
