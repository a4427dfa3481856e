"""In-kernel ring halo exchange (parallel/ring.py): the compute/comm
overlap path.

Every pass kernel exchanges its halos with `pltpu.make_async_remote_copy`
ring sends issued at kernel entry (interior blocks compute while the
transfers fly; edge blocks run last) — no XLA collectives at all. Because
each shard runs the GLOBAL pass plan's blocks with windows containing
exactly the rows the unsharded kernel would see, the sharded result must be
BITWISE identical to the single-device Pallas kernel. f32 throughout (the
ring DMA gate requires 4-byte elements).
"""
from contextlib import contextmanager

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gcm_filters_tpu import Filter, GridType
from gcm_filters_tpu.ops.pallas import make_pallas_scalar_apply
import gcm_filters_tpu.ops.pallas.cheb_pass as cp
import gcm_filters_tpu.parallel.ring as ring_mod


def _ymesh(p):
    return Mesh(np.array(jax.devices()[:p]).reshape(p, 1), ("y", "x"))


def _remote_spy(monkeypatch):
    count = []
    real = cp.pltpu.make_async_remote_copy

    def spy(*a, **k):
        count.append(1)
        return real(*a, **k)

    monkeypatch.setattr(cp.pltpu, "make_async_remote_copy", spy)
    return count


@contextmanager
def _unpacked_layout():
    """Build an unsharded reference with the UNPACKED coefficient layout.

    Ring kernels always run unpacked (cheb_pass._build_pass_call): the
    bitwise ring-vs-unsharded claim holds at a fixed layout. The packed
    production layout is value-identical but XLA contracts its FMAs
    differently at the last bit (same phenomenon as the exact-NaN note
    below), so the bitwise reference must be built inside this context —
    including the first CALL, which triggers the dispatcher's lazy build."""
    import gcm_filters_tpu.ops.pallas.cheb_pass as cpm
    import gcm_filters_tpu.ops.pallas.vec_pass as vpm

    old = cpm._PACK_COEF, vpm._PACK_COEF
    cpm._PACK_COEF = vpm._PACK_COEF = False
    try:
        yield
    finally:
        cpm._PACK_COEF, vpm._PACK_COEF = old


@pytest.mark.parametrize("p_y", [4, 8])
def test_ring_matches_unsharded_pallas_bitwise(monkeypatch, p_y):
    ny, nx = 768, 256
    rng = np.random.default_rng(5)
    m = np.ones((ny, nx))
    wet = m.copy(); wet[:2] = 0
    wet_fold = m.copy(); wet_fold[0] = 0
    count = _remote_spy(monkeypatch)
    cases = [
        (GridType.REGULAR, {}, None),
        (GridType.REGULAR, {}, 37),  # multi-pass: middles stream 2 fields
        (GridType.IRREGULAR_WITH_LAND,
         dict(wet_mask=wet, dxw=m, dyw=m, dxs=m, dys=m, area=m,
              kappa_w=m, kappa_s=m), None),
        (GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
         {"area": 0.9 + 0.2 * rng.random((ny, nx)), "wet_mask": wet_fold},
         None),
    ]
    mesh = _ymesh(p_y)
    for gt, gv, n_steps in cases:
        kw = {"n_steps": n_steps} if n_steps else {}
        filt = Filter(filter_scale=6.0, dx_min=1.0, grid_type=gt,
                      grid_vars=gv, use_pallas=False, **kw)
        rf = ring_mod.make_ring_scalar_apply(
            filt.operator, filt.filter_spec, mesh, ("y", "x"))
        assert rf is not None
        data = jnp.asarray(rng.random((ny, nx)), dtype=jnp.float32)
        n0 = len(count)
        got = rf(data)
        assert got is not None, (gt, n_steps)
        assert len(count) > n0, "ring kernel issued no remote copies"
        with _unpacked_layout():
            want = make_pallas_scalar_apply(
                filt.operator, filt.filter_spec)(data)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=f"{gt} {n_steps}")


def test_ring_odd_width_declines_cleanly(monkeypatch):
    """nx=250: manual-DMA HBM slices must be 128-lane aligned (a hard
    Mosaic tiling rule, verified on-chip in round 4 — round 3 allowed
    unaligned widths here, and every such kernel failed to compile on the
    real chip and silently pinned to XLA). The ring path therefore
    declines unaligned widths OUTRIGHT: the builder/apply return None
    without issuing any remote copies, and the Filter-level path falls
    back to the round-based sharded engine with an identical result."""
    ny, nx = 768, 250
    rng = np.random.default_rng(6)
    count = _remote_spy(monkeypatch)
    wet = np.ones((ny, nx)); wet[0] = 0
    cases = [
        (GridType.REGULAR, {}),
        (GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
         {"area": 0.9 + 0.2 * rng.random((ny, nx)), "wet_mask": wet}),
    ]
    mesh = _ymesh(8)
    for gt, gv in cases:
        filt = Filter(filter_scale=6.0, dx_min=1.0, grid_type=gt,
                      grid_vars=gv, use_pallas=False)
        rf = ring_mod.make_ring_scalar_apply(
            filt.operator, filt.filter_spec, mesh, ("y", "x"))
        data = jnp.asarray(rng.random((ny, nx)), dtype=jnp.float32)
        assert rf is None or rf(data) is None, gt
        assert not count, "unaligned width must not issue remote copies"
        # Filter-level: the y-mesh apply still works via the round-based
        # sharded fallback and matches the unsharded Pallas result
        sfilt = Filter(filter_scale=6.0, dx_min=1.0, grid_type=gt,
                       grid_vars=gv, use_pallas=True, mesh=mesh,
                       spatial_axes=("y", "x"))
        got = np.asarray(sfilt.apply(data))
        want = make_pallas_scalar_apply(filt.operator, filt.filter_spec)(data)
        np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5,
                                   atol=2e-6, err_msg=str(gt))


def test_ring_two_blocks_per_shard_window_taller_than_shard(monkeypatch):
    """ly=16 with win=24 > ly: exactly two blocks per shard and block
    windows taller than the local rows. The phantom 'mid' branch used to
    trace a win-row slice that cannot fit the local operand and crashed at
    build time (review/telemetry finding); it must instead run — bitwise —
    with only the south/north edge assemblies."""
    ny, nx = 128, 128
    rng = np.random.default_rng(13)
    count = _remote_spy(monkeypatch)
    filt = Filter(filter_scale=4.0, dx_min=1.0, use_pallas=False)
    rf = ring_mod.make_ring_scalar_apply(
        filt.operator, filt.filter_spec, _ymesh(8), ("y", "x"))
    data = jnp.asarray(rng.random((ny, nx)), dtype=jnp.float32)
    got = rf(data)
    assert got is not None and count
    with _unpacked_layout():
        want = make_pallas_scalar_apply(filt.operator, filt.filter_spec)(data)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ring_via_filter_with_fallbacks(monkeypatch):
    """Filter.apply on a y-only mesh routes through the ring path for 2-D
    f32 fields and falls back (still correct) for batches, f64, and
    x-sharded meshes."""
    ny, nx = 768, 256
    rng = np.random.default_rng(7)
    wet = np.ones((ny, nx)); wet[0] = 0
    area = 0.9 + 0.2 * rng.random((ny, nx))
    data = rng.random((ny, nx)).astype(np.float32)
    kw = dict(filter_scale=6.0, dx_min=1.0,
              grid_type=GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
              grid_vars={"area": area, "wet_mask": wet})
    base = Filter(**kw, use_pallas=False)
    want = np.asarray(base.apply(data))
    fin = np.isfinite(want)
    count = _remote_spy(monkeypatch)

    filt = Filter(**kw, use_pallas=True, mesh=_ymesh(8),
                  spatial_axes=("y", "x"))
    n0 = len(count)
    got = np.asarray(filt.apply(data))
    assert len(count) > n0, "ring path not engaged on y-only mesh"
    np.testing.assert_allclose(got[fin], want[fin], rtol=2e-5, atol=2e-6)

    # batch input: ring skipped, result still matches
    batch = np.stack([data, 2 * data + 1])
    n0 = len(count)
    got_b = np.asarray(filt.apply(batch))
    assert len(count) == n0
    want_b = np.asarray(base.apply(batch))
    fin_b = np.isfinite(want_b)
    np.testing.assert_allclose(got_b[fin_b], want_b[fin_b],
                               rtol=2e-5, atol=2e-6)

    # f64: the ring gate requires 4-byte elements -> round-based path
    n0 = len(count)
    got64 = np.asarray(filt.apply(data.astype(np.float64)))
    assert len(count) == n0
    want64 = np.asarray(base.apply(data.astype(np.float64)))
    fin64 = np.isfinite(want64)
    np.testing.assert_allclose(got64[fin64], want64[fin64],
                               rtol=1e-11, atol=1e-13)

    # x-sharded mesh: ring ineligible (builder returns None)
    mesh2d = Mesh(np.array(jax.devices()).reshape(2, 4), ("y", "x"))
    assert ring_mod.make_ring_scalar_apply(
        base.operator, base.filter_spec, mesh2d, ("y", "x")) is None


def _cgrid_vars(ny, nx, rng):
    dxy = 0.9 + 0.2 * rng.random((ny, nx))
    ones = np.ones((ny, nx))
    return dict(wet_mask_t=ones, wet_mask_q=ones,
                dxT=dxy, dyT=dxy, dxCu=dxy, dyCu=dxy, dxCv=dxy, dyCv=dxy,
                dxBu=dxy, dyBu=dxy, area_u=dxy * dxy, area_v=dxy * dxy,
                kappa_iso=ones, kappa_aniso=ones)


def _bgrid_vars(ny, nx, rng):
    dxy = 0.9 + 0.2 * rng.random((ny, nx))
    return dict(DXU=dxy, DYU=dxy, HUS=dxy, HUW=dxy, HTE=dxy, HTN=dxy,
                UAREA=dxy * dxy, TAREA=dxy * dxy)


@pytest.mark.parametrize("gt_name,n_steps", [
    ("VECTOR_C_GRID", None),
    ("VECTOR_C_GRID", 37),  # multi-pass: middles stream 2 stacked fields
    ("VECTOR_B_GRID", None),
])
def test_ring_vector_matches_unsharded_pallas_bitwise(
        monkeypatch, gt_name, n_steps):
    """The coupled (u, v) ring kernels run the global plan per shard with
    in-kernel remote halo exchange on the stacked pair; windows contain
    exactly the unsharded kernel's rows, so the result is bitwise equal."""
    from gcm_filters_tpu.ops.pallas import make_pallas_vector_apply

    ny, nx = 768, 256
    rng = np.random.default_rng(9)
    gt = getattr(GridType, gt_name)
    gv = (_cgrid_vars if gt_name == "VECTOR_C_GRID" else _bgrid_vars)(
        ny, nx, rng)
    count = _remote_spy(monkeypatch)
    kw = {"n_steps": n_steps} if n_steps else {}
    filt = Filter(filter_scale=6.0, dx_min=1.0, grid_type=gt, grid_vars=gv,
                  use_pallas=False, **kw)
    rf = ring_mod.make_ring_vector_apply(
        filt.operator, filt.filter_spec, _ymesh(8), ("y", "x"))
    assert rf is not None
    u = jnp.asarray(rng.random((ny, nx)), dtype=jnp.float32)
    v = jnp.asarray(rng.random((ny, nx)), dtype=jnp.float32)
    res = rf(u, v)
    assert res is not None and count, (gt_name, n_steps)
    with _unpacked_layout():
        want = make_pallas_vector_apply(filt.operator, filt.filter_spec)(u, v)
    for got_c, want_c, name in zip(res, want, "uv"):
        np.testing.assert_array_equal(
            np.asarray(got_c), np.asarray(want_c),
            err_msg=f"{gt_name} {n_steps} {name}")


def test_ring_vector_via_filter_with_fallbacks(monkeypatch):
    """Filter.apply_to_vector on a y-only mesh routes through the vector
    ring path for 2-D f32 pairs and falls back (still correct) for batches
    and x-sharded meshes."""
    ny, nx = 768, 256
    rng = np.random.default_rng(10)
    gv = _cgrid_vars(ny, nx, rng)
    u = rng.random((ny, nx)).astype(np.float32)
    v = rng.random((ny, nx)).astype(np.float32)
    kw = dict(filter_scale=6.0, dx_min=1.0,
              grid_type=GridType.VECTOR_C_GRID, grid_vars=gv)
    base = Filter(**kw, use_pallas=False)
    wu, wv = (np.asarray(a) for a in base.apply_to_vector(u, v))
    # single f32 apply: Pallas and the XLA engine differ at f32 rounding on
    # O(10) values, so the tolerance is absolute at that scale
    tol = dict(rtol=2e-5, atol=2e-5)
    count = _remote_spy(monkeypatch)

    filt = Filter(**kw, use_pallas=True, mesh=_ymesh(8),
                  spatial_axes=("y", "x"))
    n0 = len(count)
    fu, fv = (np.asarray(a) for a in filt.apply_to_vector(u, v))
    assert len(count) > n0, "vector ring path not engaged on y-only mesh"
    np.testing.assert_allclose(fu, wu, **tol)
    np.testing.assert_allclose(fv, wv, **tol)

    # batch input: ring skipped, result still matches
    ub, vb = np.stack([u, 2 * u]), np.stack([v, 2 * v])
    n0 = len(count)
    fub, fvb = (np.asarray(a) for a in filt.apply_to_vector(ub, vb))
    assert len(count) == n0
    wub, wvb = (np.asarray(a) for a in base.apply_to_vector(ub, vb))
    np.testing.assert_allclose(fub, wub, **tol)
    np.testing.assert_allclose(fvb, wvb, **tol)

    # x-sharded mesh: ring ineligible (builder returns None)
    mesh2d = Mesh(np.array(jax.devices()).reshape(2, 4), ("y", "x"))
    assert ring_mod.make_ring_vector_apply(
        base.operator, base.filter_spec, mesh2d, ("y", "x")) is None


def test_ring_exact_nan_mode(monkeypatch):
    """exact_nan streams the per-step pre-mask; the ring path must stay
    bitwise equal to the unsharded kernel with a wet-cell NaN present."""
    ny, nx = 768, 256
    rng = np.random.default_rng(8)
    wet = np.ones((ny, nx)); wet[:2] = 0
    count = _remote_spy(monkeypatch)
    filt = Filter(filter_scale=6.0, dx_min=1.0,
                  grid_type=GridType.REGULAR_WITH_LAND,
                  grid_vars={"wet_mask": wet}, use_pallas=False,
                  exact_nan=True)
    rf = ring_mod.make_ring_scalar_apply(
        filt.operator, filt.filter_spec, _ymesh(8), ("y", "x"),
        exact_nan=True)
    arr = rng.random((ny, nx)); arr[10, 20] = np.nan
    data = jnp.asarray(arr, dtype=jnp.float32)
    got = rf(data)
    assert got is not None and count
    with _unpacked_layout():
        want = make_pallas_scalar_apply(
            filt.operator, filt.filter_spec, exact_nan=True)(data)
    got, want = np.asarray(got), np.asarray(want)
    assert (np.isnan(got) == np.isnan(want)).all()
    fin = np.isfinite(want)
    # window data is identical; interpret-mode XLA may fuse the pre-mask
    # FMAs differently once the remote-copy ops join the program, so this
    # config lands ~1 ulp off rather than bitwise
    np.testing.assert_allclose(got[fin], want[fin], rtol=5e-6, atol=5e-7)
