"""Unified stencil representations for all grid-aware discrete Laplacians.

Design: instead of 11 imperative kernel classes chained from ``np.roll`` calls
(reference /root/reference/gcm_filters/kernels.py), every scalar Laplacian in
this framework is *data*: a single 5-point stencil with per-cell coefficient
arrays, optional pre/post masks, and two static boundary flags. The entire
grid-specific math is folded into the coefficients once, at construction time
(:mod:`gcm_filters_tpu.ops.laplacians`), so the hot loop is one uniform fused
contraction:

    out = post * (c*g + n*g_north + s*g_south + e*g_east + w*g_west),
    g   = pre * nan_to_num(field)

This uniformity is what makes a single Pallas TPU kernel (and a single
shard_map halo-exchange path) serve every scalar grid type, and it lets XLA
constant-fold the coefficients for regular grids (python-float coefficients
are compile-time immediates, so ``REGULAR`` costs 1 array read + stencil).

Boundary semantics: x is periodic (wraparound); y is periodic unless
``fold_north`` is set, in which case the north neighbor of the top row is the
top row itself reversed in x — the tripolar seam exchange (reference
kernels.py:33-40 does this by appending a mirrored row; here it is a gather,
and under sharding a reversed ppermute pairing).

Vector Laplacians: the B-grid operator is two coupled 5-point stencils
(it reduces to the same representation, applied twice with u/v mixing);
the C-grid Griffies & Hallberg viscosity operator is a genuinely two-stage
stencil (strain at T/q points, then divergence) kept as a structured op with
all metric factors precomputed.
"""
from __future__ import annotations

import dataclasses
from dataclasses import field
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array
Coef = Union[Array, float]  # python floats become compile-time constants


def _static(default) -> dataclasses.Field:
    return field(default=default, metadata=dict(static=True))


def hspace_drop_pre(stencil) -> bool:
    """True when the mask pattern admits the exact h-space elimination used
    by the fused kernels and the sharded engine: the same 0/1 wet mask as
    both pre- and post-multiplier, with NaN scrubbing (see
    ops/pallas/dispatch.py for the algebra)."""
    import numpy as np

    pre, post = stencil.pre, stencil.post
    if pre is None or post is None or not stencil.zap_nans:
        return False
    if pre is not post:  # identity is the common case; fall back to values
        a, b = np.asarray(pre), np.asarray(post)
        if a.shape != b.shape or not np.array_equal(a, b):
            return False
    a = np.asarray(pre)
    return bool(np.all((a == 0) | (a == 1)))


def north_neighbor(g: Array, fold_north: bool) -> Array:
    """Value of the cell to the north (j+1), with wraparound or tripolar fold.

    With ``fold_north``, the north neighbor of the top row is the top row
    reversed in x (the two halves of the tripolar seam face each other).
    """
    gn = jnp.roll(g, -1, axis=-2)
    if fold_north:
        gn = gn.at[..., -1, :].set(g[..., -1, ::-1])
    return gn


def south_neighbor(g: Array) -> Array:
    return jnp.roll(g, 1, axis=-2)


def east_neighbor(g: Array) -> Array:
    return jnp.roll(g, -1, axis=-1)


def west_neighbor(g: Array) -> Array:
    return jnp.roll(g, 1, axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScalarStencil5:
    """A grid-aware scalar Laplacian as a masked 5-point stencil.

    Coefficient fields may be 2-D arrays (spatially varying grids) or python
    floats (constant-coefficient grids — folded into the kernel as
    immediates). ``pre``/``post`` are optional multiplicative masks applied
    before/after the contraction (land masking). ``area`` is the optional
    fixed-factor weighting applied once per filter in prepare/finalize, not
    per step.
    """

    c: Coef  # center
    n: Coef  # north  (j+1)
    s: Coef  # south  (j-1)
    e: Coef  # east   (i+1)
    w: Coef  # west   (i-1)
    pre: Optional[Array] = None
    post: Optional[Array] = None
    area: Optional[Array] = None
    fold_north: bool = _static(False)
    zap_nans: bool = _static(False)
    is_dimensional: bool = _static(False)

    def gather_input(self, f: Array) -> Array:
        """The masked, NaN-scrubbed field the stencil contracts over."""
        g = jnp.nan_to_num(f) if self.zap_nans else f
        if self.pre is not None:
            g = self.pre * g
        return g

    def contract(self, g: Array, gn: Array, gs: Array, ge: Array, gw: Array) -> Array:
        out = self.c * g + self.n * gn + self.s * gs + self.e * ge + self.w * gw
        if self.post is not None:
            out = self.post * out
        return out

    def laplacian(self, f: Array, shift=None, north=None) -> Array:
        """Apply the Laplacian on the full (periodic/folded) domain.

        ``shift(g, s, axis)`` / ``north(g)`` default to local periodic rolls;
        the sharded engine injects halo-exchanging equivalents
        (parallel.halo) so single-device and decomposed execution share this
        exact arithmetic.
        """
        if shift is None:
            shift = jnp.roll
        if north is None:
            north = lambda g: north_neighbor(g, self.fold_north)
        g = self.gather_input(f)
        return self.contract(
            g, north(g), shift(g, 1, -2), shift(g, -1, -1), shift(g, 1, -1)
        )

    __call__ = laplacian

    def prepare(self, f: Array) -> Array:
        """Fixed-factor transform to the unit-spacing grid (once per filter)."""
        return f * self.area if self.area is not None else f

    def finalize(self, f: Array) -> Array:
        """Inverse of :meth:`prepare` (once per filter)."""
        return f / self.area if self.area is not None else f


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BGridVectorStencil:
    """POP B-grid friction operator: two coupled 5-point stencils.

    u_out = S_diff(u) + S_mix(v);  v_out = S_diff(v) + S_mix(u),

    with all ten coefficient arrays precomputed at construction (the
    reference recomputes ~25 intermediate arrays inside every call,
    kernels.py:740-806 — hoisting them is a large win). Periodic boundaries,
    no land mask (parity with reference).
    """

    cc: Array  # central, diffusion part (DUC + DUM)
    dun: Array
    dus: Array
    due: Array
    duw: Array
    dmc: Array  # central, u/v mixing part
    dmn: Array
    dms: Array
    dme: Array
    dmw: Array
    is_dimensional: bool = _static(True)
    zap_nans: bool = _static(True)
    fold_north: bool = _static(False)

    def _s5(self, f, c, n, s, e, w, shift):
        return (
            c * f
            + n * shift(f, -1, -2)
            + s * shift(f, 1, -2)
            + e * shift(f, -1, -1)
            + w * shift(f, 1, -1)
        )

    def laplacian(self, u: Array, v: Array, shift=None) -> Tuple[Array, Array]:
        if shift is None:
            shift = jnp.roll
        if self.zap_nans:
            u = jnp.nan_to_num(u)
            v = jnp.nan_to_num(v)
        # Both components see the same diffusion and mixing stencils, so they
        # are stacked on a leading axis and each coefficient array streams
        # from HBM once per step instead of twice (broadcast over the stack).
        w2 = jnp.stack([u, v])
        diff = self._s5(w2, self.cc, self.dun, self.dus, self.due, self.duw, shift)
        mix = self._s5(w2, self.dmc, self.dmn, self.dms, self.dme, self.dmw, shift)
        return diff[0] + mix[1], diff[1] + mix[0]

    __call__ = laplacian

    def prepare(self, u: Array, v: Array) -> Tuple[Array, Array]:
        return u, v

    def finalize(self, u: Array, v: Array) -> Tuple[Array, Array]:
        return u, v


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CGridVectorOperator:
    """Griffies & Hallberg (2000) C-grid viscosity operator.

    Two-stage stencil: horizontal tension str_xx at T points and shear strain
    str_xy at q (vorticity) points, scaled by the (an)isotropic viscosities,
    then divergence back to the u/v points. All metric combinations
    (aspect ratios, squared spacings, reciprocal areas/spacings) are
    precomputed (reference kernels.py:630-645 precomputes some; here all).
    Periodic boundaries; zero-area cells guarded via precomputed
    ``where(area > 0, 1/area, 0)``.
    """

    dy_dxT: Array  # (dyT/dxT) * wet_mask_t
    dx_dyT: Array
    dy_dxBu: Array  # (dyBu/dxBu) * wet_mask_q
    dx_dyBu: Array
    dx2h: Array  # dxT^2
    dy2h: Array
    dx2q: Array  # dxBu^2
    dy2q: Array
    r_dxCu: Array  # 1/dxCu
    r_dyCu: Array
    r_dxCv: Array
    r_dyCv: Array
    recip_area_u: Array
    recip_area_v: Array
    kappa_tension: Array  # kappa_iso + 0.5 * kappa_aniso
    kappa_iso: Array
    is_dimensional: bool = _static(True)
    zap_nans: bool = _static(True)
    fold_north: bool = _static(False)

    def laplacian(self, u: Array, v: Array, shift=None) -> Tuple[Array, Array]:
        if shift is None:
            shift = jnp.roll
        if self.zap_nans:
            u = jnp.nan_to_num(u)
            v = jnp.nan_to_num(v)

        # Stage 1: strains.
        u_dy = u * self.r_dyCu
        v_dx = v * self.r_dxCv
        str_xx = -self.kappa_tension * (
            self.dy_dxT * (u_dy - shift(u_dy, 1, -1))
            - self.dx_dyT * (v_dx - shift(v_dx, 1, -2))
        )
        v_dy = v * self.r_dyCv
        u_dx = u * self.r_dxCu
        str_xy = -self.kappa_iso * (
            self.dy_dxBu * (shift(v_dy, -1, -1) - v_dy)
            + self.dx_dyBu * (shift(u_dx, -1, -2) - u_dx)
        )

        # Stage 2: divergence of the stress tensor back to u/v points.
        a = self.dy2h * str_xx
        b = self.dx2q * str_xy
        u_out = (
            self.r_dyCu * (a - shift(a, -1, -1))
            + self.r_dxCu * (shift(b, 1, -2) - b)
        ) * self.recip_area_u

        c = self.dy2q * str_xy
        d = self.dx2h * str_xx
        v_out = (
            self.r_dyCv * (shift(c, 1, -1) - c)
            - self.r_dxCv * (d - shift(d, -1, -2))
        ) * self.recip_area_v

        return u_out, v_out

    __call__ = laplacian

    def prepare(self, u: Array, v: Array) -> Tuple[Array, Array]:
        return u, v

    def finalize(self, u: Array, v: Array) -> Tuple[Array, Array]:
        return u, v
