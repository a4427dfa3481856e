"""Dispatch: scalar filter apply built on the fused Pallas step kernel.

Mask elimination ("h-space" recurrence): grids whose stencil both pre- and
post-multiplies by the same 0/1 wet mask (REGULAR_WITH_LAND and friends,
reference kernels.py:172-187) admit an exact transformation that removes the
pre-mask from the hot loop. With h_k = wet * nan_to_num(t_k):

    h_k = -2 h_{k-1} - 2c * wet * S(h_{k-1}) - h_{k-2}        (wet^2 = wet)

is closed in h, and on land the shifted operator is exactly -identity, so
t_k = (-1)^k fbar there and the filtered land value is chebval(-1, p) * fbar
— reconstructed in one fused where() at the end (NaN land inputs stay NaN,
matching the reference). This cuts one full array stream per step and keeps
the kernel uniform across all scalar grid types.

Falls back to the XLA path whenever the traced shape/config isn't supported
(non-8-divisible row counts, batched inputs, non-binary masks).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...filter_spec import FilterSpec
from ..stencil import ScalarStencil5
from .cheb_pass import build_cheb_pass, plan_passes, _coef_arrays
from .cheb_step import build_cheb_step


def _lap_scale(spec: FilterSpec, is_dimensional: bool) -> float:
    if is_dimensional:
        return 2.0 / spec.s_max
    return 2.0 / (spec.s_max * spec.dx_min_sq)


def _binary01(arr) -> bool:
    a = np.asarray(arr)
    return bool(np.all((a == 0) | (a == 1)))


def make_pallas_scalar_apply(stencil: ScalarStencil5, spec: FilterSpec):
    """``field -> filtered`` using the fused per-step kernel when possible."""
    from ...engine import scalar_filter_apply, _cast_operator

    p_host = np.asarray(spec.p)

    # h-space eligibility: same 0/1 array as pre and post mask.
    drop_pre = (
        stencil.pre is not None
        and stencil.post is not None
        and stencil.pre is stencil.post
        and _binary01(stencil.pre)
        and stencil.zap_nans
    )
    if stencil.pre is not None and not drop_pre:
        return None  # unsupported masking pattern: XLA path handles it
    land_gain = float(np.polynomial.chebyshev.chebval(-1.0, p_host))

    def _run_multistep(hot, st, field, dtype):
        """Temporally blocked passes (cheb_pass.py); None if not applicable."""
        ny, nx = field.shape
        scale = _lap_scale(spec, st.is_dimensional)
        plan = plan_passes(
            ny,
            nx,
            n_steps=spec.n_steps,
            n_coef=len(_coef_arrays(hot)),
            has_post=hot.post is not None,
            itemsize=np.dtype(dtype).itemsize,
        )
        if plan is None:
            return None

        p = jnp.asarray(p_host, dtype=dtype)
        fbar = st.prepare(field)
        h = st.pre * jnp.nan_to_num(fbar) if drop_pre else fbar

        state = (h,)
        off = 0
        for m, n_ops in enumerate(plan.steps):
            first = m == 0
            last = m == len(plan.steps) - 1
            pass_fn = build_cheb_pass(
                hot, scale, ny, nx, dtype, plan, n_ops, first, last
            )
            n_p = n_ops + 1 if first else n_ops
            out = pass_fn(p[off : off + n_p], *state)
            off += n_p
            state = (out,) if last else (out[0], out[1], out[2])
        acc = state[0]

        if drop_pre:
            acc = jnp.where(st.pre == 0, land_gain * fbar, acc)
        return st.finalize(acc)

    def _run_singlestep(hot, st, field, dtype):
        """One fused kernel per step (cheb_step.py); None if not applicable."""
        ny, nx = field.shape
        scale = _lap_scale(spec, st.is_dimensional)
        step = build_cheb_step(hot, scale, ny, nx, dtype)
        if step is None:
            return None

        p = jnp.asarray(p_host, dtype=dtype)
        fbar = st.prepare(field)
        h = st.pre * jnp.nan_to_num(fbar) if drop_pre else fbar

        t2 = h
        t1 = -h - scale * hot.laplacian(h)  # first step in XLA (runs once)
        acc = p[0] * t2 + p[1] * t1

        def body(carry, p_i):
            acc, t1, t2 = carry
            t0, acc_new = step(p_i, t1, t2, acc)
            return (acc_new, t0, t1), None

        (acc, _, _), _ = jax.lax.scan(body, (acc, t1, t2), p[2:])

        if drop_pre:
            acc = jnp.where(st.pre == 0, land_gain * fbar, acc)
        return st.finalize(acc)

    def _apply_2d(field):
        dtype = field.dtype
        st = _cast_operator(stencil, dtype)
        if drop_pre:
            # cheb_pass pre-gathers coefficients on host, so it needs the
            # original (concrete numpy) stencil, not trace-time casts.
            hot_host = dataclasses.replace(stencil, pre=None, zap_nans=False)
            hot = dataclasses.replace(st, pre=None, zap_nans=False)
        else:
            hot_host, hot = stencil, st
        out = _run_multistep(hot_host, st, field, dtype)
        if out is None:
            out = _run_singlestep(hot, st, field, dtype)
        if out is None:
            out = scalar_filter_apply(stencil, spec, field)
        return out

    def apply_fn(field):
        field = jnp.asarray(field)
        if not jnp.issubdtype(field.dtype, jnp.floating):
            return scalar_filter_apply(stencil, spec, field)
        if field.ndim == 2:
            return _apply_2d(field)
        if field.ndim > 2:
            # Batched: vmap the 2-D path over flattened leading dims.
            lead = field.shape[:-2]
            flat = field.reshape((-1,) + field.shape[-2:])
            out = jax.vmap(_apply_2d)(flat)
            return out.reshape(lead + out.shape[-2:])
        return scalar_filter_apply(stencil, spec, field)

    return apply_fn
