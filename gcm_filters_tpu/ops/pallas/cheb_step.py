"""Fused Pallas TPU kernel for one Chebyshev filter step (streaming form).

One step of the recurrence is, per cell,

    g    = nan_to_num(t1)                     (NaN scrub, if the grid does it)
    lap  = post * (c*g + n*g_N + s*g_S + e*g_E + w*g_W)
    t0   = -2*t1 - 2*lap_scale*lap - t2
    acc' = acc + p_i * t0

fused into one pipelined pass over row blocks, so per-step HBM traffic is the
reads of (t1, t2, acc) + grid coefficient arrays + writes of (t0, acc') —
near the memory-bandwidth speed of light for the recurrence. (The XLA path
materializes several intermediates per step.)

Halos: blocks are full-width row strips; x-periodicity is an in-register
roll. The one north/south row each block needs is taken from the i+1 / i-1
*neighbor block*, which is passed as an additional BlockSpec view of the same
t1 array (index maps (i±1) mod nb). That re-reads t1 ~3x, but needs no
gather, no unaligned (1, nx) blocks, and stays fully pipelined; the net
traffic is still far below the XLA path. The tripolar fold needs no
communication at all here: the north neighbor of the global top row is that
row itself reversed in x, i.e. local data of the top block.

The `pre` land mask never enters this loop: the dispatch layer runs the
recurrence in masked space (h = wet * t is closed under the recurrence for
0/1 masks since wet^2 = wet) and reconstructs land values analytically —
on land the shifted operator is -identity, so t_k = (-1)^k * fbar and the
filtered land value is chebval(-1, p) * fbar (see dispatch.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stencil import ScalarStencil5

# VMEM budget for pipelined buffers; Pallas double-buffers each stream.
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_block_rows(ny: int, nx: int, n_streams: int, itemsize: int) -> Optional[int]:
    """Largest row-block height (multiple of 8, dividing ny) that fits VMEM."""
    limit = _VMEM_BUDGET // (2 * n_streams * nx * itemsize)
    best = None
    for br in range(8, ny + 1, 8):
        if ny % br == 0 and br <= limit:
            best = br
    return best


def build_cheb_step(
    stencil: ScalarStencil5,
    lap_scale: float,
    ny: int,
    nx: int,
    dtype,
):
    """Build ``(p_i, t1, t2, acc) -> (t0, acc')`` as a fused Pallas call.

    ``stencil.pre`` must already have been eliminated by the caller (see
    module docstring). Returns None when the shape can't be blocked cleanly.
    """
    assert stencil.pre is None
    coef_names = [
        k for k in ("c", "n", "s", "e", "w")
        if not isinstance(getattr(stencil, k), (int, float))
    ]
    has_post = stencil.post is not None

    # streams: t1 (x3: self + two neighbor views), t2, acc, t0, acc' + coefs
    n_streams = 7 + len(coef_names) + int(has_post)
    br = _pick_block_rows(ny, nx, n_streams, np.dtype(dtype).itemsize)
    if br is None:
        return None
    nb = ny // br

    coefs = {k: jnp.asarray(getattr(stencil, k), dtype) for k in coef_names}
    post = jnp.asarray(stencil.post, dtype) if has_post else None
    zap = stencil.zap_nans
    fold = stencil.fold_north
    consts = {
        k: getattr(stencil, k)
        for k in ("c", "n", "s", "e", "w")
        if k not in coef_names
    }
    neg2scale = -2.0 * lap_scale

    def kernel(p_ref, t1_ref, t1m_ref, t1p_ref, t2_ref, acc_ref, *rest):
        refs = list(rest)
        fold_ref = refs.pop(0) if fold else None
        coef_refs = {k: refs.pop(0) for k in coef_names}
        post_ref = refs.pop(0) if has_post else None
        t0_out, acc_out = refs

        t1 = t1_ref[...]
        g = jnp.nan_to_num(t1) if zap else t1

        # south halo row: last row of the block below (wraps at the bottom)
        s_row = t1m_ref[br - 1 :, :]
        # north halo row: first row of the block above (wraps at the top)...
        n_row = t1p_ref[:1, :]
        if zap:
            s_row = jnp.nan_to_num(s_row)
            n_row = jnp.nan_to_num(n_row)
        if fold:
            # ...except the global top block, whose north neighbor is the
            # global top row reversed in x (the tripolar seam). Lane reversal
            # has no Mosaic lowering, so XLA prepares the reversed (and
            # scrubbed) row and we select it here.
            i = pl.program_id(0)
            n_row = jnp.where(i == nb - 1, fold_ref[:1, :], n_row)

        gn = jnp.concatenate([g[1:, :], n_row], axis=0)
        gs = jnp.concatenate([s_row, g[:-1, :]], axis=0)
        ge = jnp.roll(g, -1, axis=-1)
        gw = jnp.roll(g, 1, axis=-1)

        def coef(k):
            return coef_refs[k][...] if k in coef_refs else consts[k]

        lap = coef("c") * g + coef("n") * gn + coef("s") * gs
        lap = lap + coef("e") * ge + coef("w") * gw
        if has_post:
            lap = post_ref[...] * lap

        t0 = -2.0 * t1 + neg2scale * lap - t2_ref[...]
        t0_out[...] = t0
        acc_out[...] = acc_ref[...] + p_ref[0, 0] * t0

    def block(index_map=lambda i: (i, 0)):
        return pl.BlockSpec((br, nx), index_map, memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),  # p_i
        block(),  # t1 (own block)
        block(lambda i: ((i - 1) % nb, 0)),  # t1 block below (south halo)
        block(lambda i: ((i + 1) % nb, 0)),  # t1 block above (north halo)
        block(),  # t2
        block(),  # acc
    ]
    if fold:
        # the reversed global-top row, padded to the 8-row tile minimum
        in_specs.append(
            pl.BlockSpec((8, nx), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    in_specs += [block() for _ in coef_names]
    if has_post:
        in_specs.append(block())

    grid_call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[block(), block()],
        out_shape=[
            jax.ShapeDtypeStruct((ny, nx), dtype),
            jax.ShapeDtypeStruct((ny, nx), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * ny * nx,
            bytes_accessed=n_streams * ny * nx * np.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )

    def step(p_i, t1, t2, acc):
        args = [jnp.reshape(p_i, (1, 1)).astype(dtype), t1, t1, t1, t2, acc]
        if fold:
            row = t1[-1:, ::-1]
            if zap:
                row = jnp.nan_to_num(row)
            args.append(jnp.broadcast_to(row, (8, nx)))
        args += [coefs[k] for k in coef_names]
        if has_post:
            args.append(post)
        return grid_call(*args)

    return step
