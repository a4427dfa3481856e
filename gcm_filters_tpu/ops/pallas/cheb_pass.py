"""Temporally blocked Pallas pass: S Chebyshev steps fused into one kernel.

The 1-step kernel (cheb_step.py) already runs near the per-step HBM roofline
(~9 full-array streams per step). The remaining headroom is *traffic
reduction*: this kernel performs S operator applications per HBM pass using
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
(1 + 2H/br) instead of 3x via neighbor views.

Land masks never enter the hot loop: the dispatch layer runs the recurrence
in masked h-space (see dispatch.py) so ``stencil.pre`` must be None here.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stencil import ScalarStencil5

# VMEM spent on Pallas-pipelined buffers; temporaries need headroom on top.
# Tuned on v5e (16 MiB VMEM): 13 MiB here + the ~6-window temp allowance in
# _vmem_rows compiles reliably and beats smaller budgets on the headline
# workload (larger blocks -> less trapezoid recompute).
_VMEM_BUDGET = 13 * 1024 * 1024

COEF_NAMES = ("c", "n", "s", "e", "w")
# Reflection across the tripolar seam swaps north<->south and east<->west.
_MIRROR_SWAP = {"c": "c", "n": "s", "s": "n", "e": "w", "w": "e"}


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


def _vmem_rows(br: int, halo: int, n_coef: int, has_post: bool) -> int:
    """Rough VMEM footprint in rows for one (br, halo) config.

    Pipelined streams are double-buffered: field views (3x t1 + 3x t2), acc,
    3 outputs = 10 blocked streams; (n_coef + post) extended-layout streams of
    br+2H rows; plus ~6 live window temporaries inside the kernel body.
    """
    win = br + 2 * halo
    blocked = 2 * 10 * br
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
) -> Optional[PassPlan]:
    """Choose block rows and per-pass step counts under the VMEM budget."""
    row_bytes = nx * itemsize
    budget_rows = _VMEM_BUDGET // row_bytes

    # Candidate block heights: multiples of 8 dividing ny.
    brs = [b for b in range(8, min(ny, 512) + 1, 8) if ny % b == 0]
    if not brs:
        return None

    best = None
    for br in brs:
        # Largest per-pass step count allowed by this block height.
        h = min(max_fuse, n_steps, br)
        while h >= 1 and _vmem_rows(br, h, n_coef, has_post) > budget_rows:
            h -= 1
        if h < 1:
            continue
        # HBM streams for the whole filter under this config (see module doc):
        # pass 1 reads 3 field views + ext coefs, writes 3 (or 1 if single
        # pass); later passes read 6 views + acc + ext coefs.
        ext = (n_coef + int(has_post)) * (1.0 + 2.0 * h / br)
        n_pass = -(-n_steps // h)
        if n_pass == 1:
            streams = 3 + ext + 1
        else:
            streams = (3 + ext + 3) + (n_pass - 1) * (7 + ext + 3) - 2
        if best is None or streams < best[0]:
            best = (streams, br, h)
    if best is None:
        return None
    _, br, h = best

    # Balanced split: ceil(n/h) near-equal passes (a trailing 1-op remainder
    # pass would waste a full HBM sweep on one step).
    n_pass = -(-n_steps // h)
    base, extra = divmod(n_steps, n_pass)
    steps = tuple(base + (1 if i < extra else 0) for i in range(n_pass))
    return PassPlan(br=br, halo=max(steps), steps=steps)


def _ext_coef_blocks(
    arr: np.ndarray, br: int, halo: int, fold: bool, mirror_src: np.ndarray
) -> np.ndarray:
    """Pre-gather a coefficient array into (nb, br+2H, nx) extended layout.

    Block i covers global rows [i*br - H, (i+1)*br + H) with periodic wrap;
    on fold grids the top block's north halo holds the seam-mirrored rows of
    ``mirror_src`` (the n/s- or e/w-swapped partner coefficient).
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
    return ext


def _mirror_chunk(x: jax.Array, halo: int, rows_m: int) -> jax.Array:
    """(rows_m, nx) chunk whose first H rows are the seam mirror of ``x``."""
    m = x[..., -halo:, :][..., ::-1, ::-1]
    if rows_m > halo:
        pad = [(0, 0)] * (m.ndim - 2) + [(0, rows_m - halo), (0, 0)]
        m = jnp.pad(m, pad)
    return m


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
):
    """Build one fused pass performing ``n_ops`` operator applications.

    Signatures of the returned function:
      first+last : (p[0..n_ops],  h)           -> acc
      first      : (p[0..n_ops],  h)           -> (t1, t2, acc)
      middle     : (p[0..n_ops-1], t1, t2, acc) -> (t1, t2, acc)
      last       : (p[0..n_ops-1], t1, t2, acc) -> acc

    where h/t1/t2/acc are (ny, nx) and p chunks are (1, len) SMEM rows.
    ``stencil.pre`` must be None (h-space recurrence, see dispatch.py).
    """
    assert stencil.pre is None
    br, halo = plan.br, plan.halo
    assert n_ops <= halo and halo <= br and ny % br == 0
    nb = ny // br
    win = br + 2 * halo

    coef_names = _coef_arrays(stencil)
    has_post = stencil.post is not None
    fold = stencil.fold_north
    zap = stencil.zap_nans
    consts = {
        k: float(getattr(stencil, k))
        for k in COEF_NAMES
        if k not in coef_names
    }
    npdt = np.dtype(dtype)

    def _host(a):
        return np.asarray(a, dtype=npdt)

    def _full(v):
        """Coefficient as a full (ny, nx) host array (scalars broadcast)."""
        if isinstance(v, (int, float)):
            return np.broadcast_to(npdt.type(v), (ny, nx))
        return _host(v)

    ext_coefs = [
        _ext_coef_blocks(
            _host(getattr(stencil, k)), br, halo, fold,
            _full(getattr(stencil, _MIRROR_SWAP[k])),
        )
        for k in coef_names
    ]
    ext_post = (
        _ext_coef_blocks(_host(stencil.post), br, halo, fold, _host(stencil.post))
        if has_post
        else None
    )

    rows_m = max(8, halo)  # mirror chunks padded to the f32 sublane tile
    n_p = n_ops + 1 if first_pass else n_ops
    n_fields = 1 if first_pass else 2  # h, or (t1, t2)
    neg2scale = npdt.type(-2.0 * lap_scale)
    negscale = npdt.type(-lap_scale)

    def kernel(p_ref, *refs):
        refs = list(refs)
        f_views = [[refs.pop(0) for _ in range(3)] for _ in range(n_fields)]
        acc_ref = None if first_pass else refs.pop(0)
        mirrors = [refs.pop(0) for _ in range(n_fields)] if fold else []
        coef_refs = {k: refs.pop(0) for k in coef_names}
        post_ref = refs.pop(0) if has_post else None
        if last_pass:
            (acc_out,) = refs
            t1_out = t2_out = None
        else:
            t1_out, t2_out, acc_out = refs

        i = pl.program_id(0)

        def window(views, mirror_ref):
            own, prev, nxt = views
            lo = prev[br - halo :, :]
            hi = nxt[:halo, :]
            if fold:
                hi = jnp.where(i == nb - 1, mirror_ref[:halo, :], hi)
            return jnp.concatenate([lo, own[...], hi], axis=0)

        def coef(k):
            if k in coef_refs:
                return coef_refs[k][0]
            return consts[k]

        post = post_ref[0] if has_post else None

        def lap(t):
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
        if first_pass:
            prev = window(f_views[0], mirrors[0] if fold else None)  # T_0 = h
            cur = -prev + negscale * lap(prev)  # T_1 = A h
            acc = p_ref[0, 0] * prev[own] + p_ref[0, 1] * cur[own]
            p_off = 2
        else:
            cur = window(f_views[0], mirrors[0] if fold else None)  # T_{m-1}
            prev = window(f_views[1], mirrors[1] if fold else None)  # T_{m-2}
            acc = acc_ref[...]
            p_off = 0

        n_rec = n_ops - 1 if first_pass else n_ops
        for j in range(n_rec):
            nxt = -2.0 * cur + neg2scale * lap(cur) - prev
            acc = acc + p_ref[0, p_off + j] * nxt[own]
            prev, cur = cur, nxt

        if not last_pass:
            t1_out[...] = cur[own]
            t2_out[...] = prev[own]
        acc_out[...] = acc

    def blk(index_map=lambda i: (i, 0)):
        return pl.BlockSpec((br, nx), index_map, memory_space=pltpu.VMEM)

    def views():
        return [
            blk(),
            blk(lambda i: ((i - 1) % nb, 0)),
            blk(lambda i: ((i + 1) % nb, 0)),
        ]

    in_specs = [pl.BlockSpec((1, n_p), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    for _ in range(n_fields):
        in_specs += views()
    if not first_pass:
        in_specs.append(blk())  # acc
    if fold:
        in_specs += [
            pl.BlockSpec((rows_m, nx), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(n_fields)
        ]
    in_specs += [
        pl.BlockSpec((1, win, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(len(coef_names) + int(has_post))
    ]

    n_out = 1 if last_pass else 3
    out_specs = [blk() for _ in range(n_out)]
    out_shape = [jax.ShapeDtypeStruct((ny, nx), dtype) for _ in range(n_out)]

    n_arrays = len(coef_names) + int(has_post)
    grid_call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=12 * n_ops * nb * win * nx,
            bytes_accessed=(3 * n_fields + n_out + 1) * ny * nx * npdt.itemsize
            + n_arrays * nb * win * nx * npdt.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )

    ext_inputs = [jnp.asarray(c) for c in ext_coefs]
    if has_post:
        ext_inputs.append(jnp.asarray(ext_post))

    def pass_fn(p_chunk, *fields_and_acc):
        fields = fields_and_acc[:n_fields]
        args = [jnp.reshape(p_chunk, (1, n_p)).astype(dtype)]
        for f in fields:
            args += [f, f, f]
        if not first_pass:
            args.append(fields_and_acc[n_fields])  # acc
        if fold:
            args += [_mirror_chunk(f, halo, rows_m) for f in fields]
        args += ext_inputs
        out = grid_call(*args)
        return out[0] if last_pass else tuple(out)

    return pass_fn
