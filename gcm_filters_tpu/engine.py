"""The Chebyshev filter iteration engine.

The filter is a degree-``n_steps`` Chebyshev polynomial of the shifted
operator A = -I - (2/s_max) * Laplacian (nondimensionalized by dx_min^2 for
nondimensional Laplacians), evaluated by the three-term recurrence

    T_0 = f,  T_1 = A f,  T_k = 2 A T_{k-1} - T_{k-2},
    filtered = sum_k p_k T_k

(reference /root/reference/gcm_filters/filter.py:154-291). Here the recurrence
is a ``jax.lax.scan`` over the coefficient tail, so the whole filter is one
XLA computation: every step fuses the shifted Laplacian, the recurrence
update, and the accumulation into a handful of HBM-bandwidth-bound fused
loops (or a single Pallas pass when enabled — see ops.pallas).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .filter_spec import FilterSpec
from .ops.stencil import BGridVectorStencil, CGridVectorOperator, ScalarStencil5

Array = jax.Array


def _laplacian_scale(spec: FilterSpec, is_dimensional: bool) -> float:
    """The constant multiplying the Laplacian inside the shifted operator."""
    if is_dimensional:
        return 2.0 / spec.s_max
    return 2.0 / (spec.s_max * spec.dx_min_sq)


def _cast_operator(operator, dtype):
    """Cast all floating-point leaves of an operator pytree to ``dtype``.

    Opaque leaves (free-form protocol operators are not pytrees — the whole
    object is one leaf) pass through unchanged: they manage their own
    coefficient dtypes.
    """

    def cast(leaf):
        if isinstance(leaf, (float, int)):
            return leaf  # python scalars stay compile-time constants
        try:
            leaf = jnp.asarray(leaf)
        except (TypeError, ValueError):
            return leaf
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(cast, operator)


def scalar_filter_apply(
    stencil: ScalarStencil5, spec: FilterSpec, field: Array, laplacian_fn=None
) -> Array:
    """Filter ``field`` (spatial dims last two, leading dims batched).

    ``laplacian_fn`` optionally replaces the stencil's local periodic
    laplacian (an extension hook for custom operator applications; note it
    must close over coefficients cast to the compute dtype itself).
    Non-floating inputs are promoted (the reference filters integer fields
    via numpy promotion).
    """
    field = jnp.asarray(field)
    dtype = jnp.result_type(field.dtype, jnp.float32)
    field = field.astype(dtype)
    stencil = _cast_operator(stencil, dtype)
    if laplacian_fn is None:
        laplacian_fn = stencil.laplacian
    lap_scale = _laplacian_scale(spec, stencil.is_dimensional)
    p = jnp.asarray(np.asarray(spec.p), dtype=dtype)

    def shifted(f: Array) -> Array:
        return -f - lap_scale * laplacian_fn(f)

    fbar = stencil.prepare(field)
    t_prev2 = fbar
    t_prev1 = shifted(fbar)
    acc = p[0] * t_prev2 + p[1] * t_prev1

    def step(carry, p_i):
        acc, t1, t2 = carry
        t0 = 2.0 * shifted(t1) - t2
        return (acc + p_i * t0, t0, t1), None

    (acc, _, _), _ = jax.lax.scan(step, (acc, t_prev1, t_prev2), p[2:])
    return stencil.finalize(acc)


def vector_filter_apply(
    operator: Union[BGridVectorStencil, CGridVectorOperator],
    spec: FilterSpec,
    ufield: Array,
    vfield: Array,
    laplacian_fn=None,
) -> Tuple[Array, Array]:
    """Filter a vector field (u, v) in lockstep with a vector Laplacian.

    Inputs are promoted to a common floating dtype.
    """
    ufield = jnp.asarray(ufield)
    vfield = jnp.asarray(vfield)
    dtype = jnp.result_type(ufield.dtype, vfield.dtype, jnp.float32)
    ufield = ufield.astype(dtype)
    vfield = vfield.astype(dtype)
    operator = _cast_operator(operator, dtype)
    if laplacian_fn is None:
        laplacian_fn = operator.laplacian
    lap_scale = _laplacian_scale(spec, operator.is_dimensional)
    p = jnp.asarray(np.asarray(spec.p), dtype=dtype)

    def shifted(u: Array, v: Array) -> Tuple[Array, Array]:
        lu, lv = laplacian_fn(u, v)
        return -u - lap_scale * lu, -v - lap_scale * lv

    u0, v0 = operator.prepare(ufield, vfield)
    ut2, vt2 = u0, v0
    ut1, vt1 = shifted(u0, v0)
    uacc = p[0] * ut2 + p[1] * ut1
    vacc = p[0] * vt2 + p[1] * vt1

    def step(carry, p_i):
        uacc, vacc, ut1, vt1, ut2, vt2 = carry
        su, sv = shifted(ut1, vt1)
        ut0 = 2.0 * su - ut2
        vt0 = 2.0 * sv - vt2
        return (uacc + p_i * ut0, vacc + p_i * vt0, ut0, vt0, ut1, vt1), None

    (uacc, vacc, *_), _ = jax.lax.scan(
        step, (uacc, vacc, ut1, vt1, ut2, vt2), p[2:]
    )
    return operator.finalize(uacc, vacc)


def _pallas_auto(use_pallas: bool | None) -> bool:
    if use_pallas is not None:
        return use_pallas
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _compute_dtype(*dtypes):
    """The floating dtype the filter actually computes in.

    Inputs promote against float32 (integer fields filter via promotion, as
    in the reference's numpy semantics); operator coefficients must be cast
    to THIS dtype, never to a raw input dtype — casting float coefficients
    (kappa, area) to an integer dtype would silently truncate them.
    """
    return jnp.result_type(*dtypes, jnp.float32)


def _operator_dtype_cache(operator):
    """Per-compute-dtype eager device copies of an operator pytree.

    The operator is a jit *argument* (constants would be serialized into the
    compile payload), so repeated calls must hand jit the SAME committed
    device arrays — passing host numpy would re-transfer every coefficient
    on every call, and casting inside the program would re-run per call.

    Keys are normalized through :func:`_compute_dtype`, so integer input
    dtypes can never truncate floating coefficients.
    """
    cache = {}

    def get(dtype):
        dtype = _compute_dtype(dtype)
        key = str(dtype)
        if key not in cache:
            cache[key] = _cast_operator(operator, dtype)  # eager off-trace
        return cache[key]

    return get


def make_jitted_scalar_apply(
    stencil: ScalarStencil5,
    spec: FilterSpec,
    use_pallas: bool | None = None,
    exact_nan: bool = False,
):
    """A compiled ``field -> filtered`` function for this stencil.

    The operator pytree is threaded through the jit boundary as a runtime
    argument: closing over it would embed the (potentially multi-hundred-MB)
    coefficient arrays as constants in the compile payload, which bloats
    compile caches and overflows remote-compile transports.

    Free-form protocol operators (anything that isn't a framework stencil
    type — the reference's arbitrary-Laplacian extension path,
    kernels.py:43-87) run through the XLA engine with the operator closed
    over (it is opaque to jax; see ops.custom).
    """
    if not isinstance(stencil, ScalarStencil5):
        from .ops.custom import as_protocol_adapter

        adapter = as_protocol_adapter(stencil)
        jitted = jax.jit(lambda field: scalar_filter_apply(adapter, spec, field))
        return lambda field: jitted(jnp.asarray(field))
    if _pallas_auto(use_pallas):
        from .ops.pallas import make_pallas_scalar_apply

        fn = make_pallas_scalar_apply(stencil, spec, exact_nan=exact_nan)
        if fn is not None:
            return fn  # manages its own jit + argument threading
    jitted = jax.jit(lambda st, field: scalar_filter_apply(st, spec, field))
    op_for = _operator_dtype_cache(stencil)

    def call(field):
        field = jnp.asarray(field)
        return jitted(op_for(field.dtype), field)

    return call


def make_jitted_vector_apply(operator, spec: FilterSpec, use_pallas: bool | None = None):
    """A compiled ``(u, v) -> (filtered_u, filtered_v)`` function."""
    if not isinstance(operator, (BGridVectorStencil, CGridVectorOperator)):
        from .ops.custom import as_protocol_adapter

        adapter = as_protocol_adapter(operator)
        jitted = jax.jit(
            lambda u, v: vector_filter_apply(adapter, spec, u, v)
        )
        return lambda u, v: jitted(jnp.asarray(u), jnp.asarray(v))
    if _pallas_auto(use_pallas):
        from .ops.pallas.dispatch import make_pallas_vector_apply

        fn = make_pallas_vector_apply(operator, spec)
        if fn is not None:
            return fn  # manages its own jit + argument threading
    jitted = jax.jit(lambda op, u, v: vector_filter_apply(op, spec, u, v))
    op_for = _operator_dtype_cache(operator)

    def call(u, v):
        u = jnp.asarray(u)
        v = jnp.asarray(v)
        # key on the promoted compute dtype (u float32 + v float64 computes
        # in float64; truncating coefficients to u's dtype would lose it)
        return jitted(op_for(_compute_dtype(u.dtype, v.dtype)), u, v)

    return call
