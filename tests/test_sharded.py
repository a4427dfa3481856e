"""Distributed-execution tests: sharded filter == unsharded filter, allclose.

Runs on 8 virtual CPU devices (conftest sets
--xla_force_host_platform_device_count=8). This is the distributed-testing
story the reference lacks (SURVEY.md §4): the same fixtures, decomposed over
a 2-D (y, x) mesh — including the tripolar north-fold seam across device
boundaries — must reproduce single-device results.
"""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from gcm_filters_tpu import Filter, GridType
from gcm_filters_tpu.models.grids import is_vector_grid


def _mesh(ydevs, xdevs, batch=None):
    devs = np.array(jax.devices()[: ydevs * xdevs * (batch or 1)])
    if batch:
        return Mesh(devs.reshape(batch, ydevs, xdevs), ("b", "y", "x"))
    return Mesh(devs.reshape(ydevs, xdevs), ("y", "x"))


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (8, 1), (1, 8), (2, 2)])
def test_sharded_scalar_matches_unsharded(scalar_grid_data, mesh_shape):
    grid_type, data, grid_vars = scalar_grid_data
    base = Filter(filter_scale=6.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False)
    expected = np.asarray(base.apply(data))

    mesh = _mesh(*mesh_shape)
    filt = Filter(filter_scale=6.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False,
                  mesh=mesh, spatial_axes=("y", "x"))
    got = np.asarray(filt.apply(data))
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)


def test_sharded_tripolar_seam(tripolar_grid_data):
    """Fold seam must be exact when the top row is split across devices."""
    grid_type, data, grid_vars = tripolar_grid_data
    mesh = _mesh(2, 4)
    filt = Filter(filter_scale=4.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False,
                  mesh=mesh, spatial_axes=("y", "x"))
    base = Filter(filter_scale=4.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(filt.apply(data)), np.asarray(base.apply(data)),
        rtol=1e-10, atol=1e-12,
    )


def test_sharded_vector_matches_unsharded(vector_grid_data):
    grid_type, (u, v), grid_vars = vector_grid_data
    base = Filter(filter_scale=6.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False)
    eu, ev = (np.asarray(a) for a in base.apply_to_vector(u, v))

    mesh = _mesh(2, 4)
    filt = Filter(filter_scale=6.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False,
                  mesh=mesh, spatial_axes=("y", "x"))
    gu, gv = (np.asarray(a) for a in filt.apply_to_vector(u, v))
    np.testing.assert_allclose(gu, eu, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(gv, ev, rtol=1e-9, atol=1e-11)


def test_sharded_batched_leading_dims(scalar_grid_data):
    grid_type, data, grid_vars = scalar_grid_data
    batch = np.stack([data, 2 * data + 1, -data])
    base = Filter(filter_scale=4.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False)
    mesh = _mesh(2, 4)
    filt = Filter(filter_scale=4.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False,
                  mesh=mesh, spatial_axes=("y", "x"))
    np.testing.assert_allclose(
        np.asarray(filt.apply(batch)), np.asarray(base.apply(batch)),
        rtol=1e-10, atol=1e-12,
    )


def test_sharded_y_only_and_x_only(scalar_grid_data):
    """Partial decomposition: shard only one spatial axis."""
    grid_type, data, grid_vars = scalar_grid_data
    base = Filter(filter_scale=4.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False)
    expected = np.asarray(base.apply(data))

    devs = np.array(jax.devices()[:4])
    mesh_y = Mesh(devs.reshape(4), ("y",))
    filt_y = Filter(filter_scale=4.0, dx_min=1.0, grid_type=grid_type,
                    grid_vars=grid_vars, use_pallas=False,
                    mesh=mesh_y, spatial_axes=("y", None))
    np.testing.assert_allclose(np.asarray(filt_y.apply(data)), expected,
                               rtol=1e-10, atol=1e-12)

    mesh_x = Mesh(devs.reshape(4), ("x",))
    filt_x = Filter(filter_scale=4.0, dx_min=1.0, grid_type=grid_type,
                    grid_vars=grid_vars, use_pallas=False,
                    mesh=mesh_x, spatial_axes=(None, "x"))
    np.testing.assert_allclose(np.asarray(filt_x.apply(data)), expected,
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("halo_steps", [1, 3, 16])
def test_sharded_halo_round_sizes(tripolar_grid_data, halo_steps):
    """Any steps-per-exchange round size must reproduce unsharded results."""
    grid_type, data, grid_vars = tripolar_grid_data
    base = Filter(filter_scale=6.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False)
    mesh = _mesh(2, 4)
    filt = Filter(filter_scale=6.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False,
                  mesh=mesh, spatial_axes=("y", "x"), halo_steps=halo_steps)
    np.testing.assert_allclose(
        np.asarray(filt.apply(data)), np.asarray(base.apply(data)),
        rtol=1e-10, atol=1e-12,
    )


@pytest.mark.parametrize("halo_steps", [None, 2, 5])
def test_sharded_pallas_local_compute(tripolar_grid_data, halo_steps):
    """Pallas trapezoid kernel as the per-shard local compute (interpret mode)
    must match the unsharded XLA engine exactly, fold seam included, for any
    steps-per-exchange round size."""
    grid_type, data, grid_vars = tripolar_grid_data
    base = Filter(filter_scale=6.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False)
    mesh = _mesh(2, 4)
    filt = Filter(filter_scale=6.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=True,
                  mesh=mesh, spatial_axes=("y", "x"), halo_steps=halo_steps)
    np.testing.assert_allclose(
        np.asarray(filt.apply(data)), np.asarray(base.apply(data)),
        rtol=1e-11, atol=1e-13,
    )
    batch = np.stack([data, 2 * data + 1])
    np.testing.assert_allclose(
        np.asarray(filt.apply(batch)), np.asarray(base.apply(batch)),
        rtol=1e-11, atol=1e-13,
    )


def test_sharded_vector_pallas_local_compute(vector_grid_data):
    """Coupled Pallas passes as the per-shard local compute for both vector
    operators (interpret mode) must match unsharded XLA to roundoff."""
    grid_type, (u, v), grid_vars = vector_grid_data
    base = Filter(filter_scale=6.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False)
    eu, ev = (np.asarray(a) for a in base.apply_to_vector(u, v))
    mesh = _mesh(2, 4)
    filt = Filter(filter_scale=6.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=True,
                  mesh=mesh, spatial_axes=("y", "x"))
    gu, gv = (np.asarray(a) for a in filt.apply_to_vector(u, v))
    np.testing.assert_allclose(gu, eu, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(gv, ev, rtol=1e-9, atol=1e-11)


def test_sharded_batch_axis_mesh(tripolar_grid_data):
    """A third mesh axis sharding the leading batch dim (the dask analogue)
    composes with the 2-D spatial decomposition."""
    grid_type, data, grid_vars = tripolar_grid_data
    batch = np.stack([data, 2 * data + 1, -data, 0.5 * data])
    base = Filter(filter_scale=4.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False)
    mesh = _mesh(2, 2, batch=2)
    filt = Filter(filter_scale=4.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False,
                  mesh=mesh, spatial_axes=("y", "x"), batch_axis="b")
    np.testing.assert_allclose(
        np.asarray(filt.apply(batch)), np.asarray(base.apply(batch)),
        rtol=1e-10, atol=1e-12,
    )


def test_sharded_mixed_dtype_matches_unsharded(scalar_grid_data):
    """float32 fields against float64 grid vars must stay float32 and match
    the unsharded result on both local-compute paths (the operator is cast
    per compute dtype, like the single-device engine)."""
    grid_type, data, grid_vars = scalar_grid_data
    data32 = np.asarray(data, dtype=np.float32)
    base = Filter(filter_scale=4.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False)
    want = np.asarray(base.apply(data32))
    assert want.dtype == np.float32
    mesh = _mesh(2, 4)
    for up in (False, True):
        filt = Filter(filter_scale=4.0, dx_min=1.0, grid_type=grid_type,
                      grid_vars=grid_vars, use_pallas=up,
                      mesh=mesh, spatial_axes=("y", "x"))
        got = np.asarray(filt.apply(data32))
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_distributed_prepared_exts_remove_coefficient_collectives():
    """On a real (sharded-spatial) mesh, the per-shard extended coefficient
    blocks are prepared once and cached; the steady-state apply must then
    contain ONLY the carry halo exchanges — far fewer collective-permutes
    than an apply that re-extends every coefficient in-trace (round-2
    optimization; see benchmarks/README.md)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import gcm_filters_tpu as gf
    from gcm_filters_tpu.engine import _cast_operator

    ny, nx = 96, 192
    rng = np.random.default_rng(0)
    wet = np.ones((ny, nx)); wet[0, :] = 0
    area = 0.9 + 0.2 * rng.random((ny, nx))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("y", "x"))
    filt = gf.Filter(filter_scale=6.0, dx_min=1.0,
                     grid_type=gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
                     grid_vars=dict(area=area, wet_mask=wet),
                     mesh=mesh, spatial_axes=("y", "x"), use_pallas=True)
    fn = filt._scalar_fn()
    x = jnp.asarray(rng.random((ny, nx)).astype(np.float32))
    out = np.asarray(fn(x))  # warms the ext cache and the compiled apply
    assert np.isfinite(out[1:]).all()
    assert fn._ext_cache, "prepared-ext cache unexpectedly empty"

    st = _cast_operator(filt.operator, jnp.float32)
    exts = next(iter(fn._ext_cache.values()))
    hlo = fn._pl_jit["dist"].lower(st, x[None], *exts).compile().as_text()
    n_apply = hlo.count(" collective-permute(")

    # the ext PREPARE itself carries the coefficient exchanges, once ever
    assert n_apply > 0  # carries still exchange halos
    # in-trace coefficient extension added ~3 exchanges x ~5 permutes on
    # this grid; the steady-state apply must be well under that regime
    assert n_apply <= 12, f"apply still carries coefficient collectives: {n_apply}"


def test_sharded_dma_window_local_compute(monkeypatch):
    """The manual-DMA window path as the per-shard local compute: with
    _DMA_WINDOWS forced on and f32 data (the gate requires 4-byte
    elements), sharded Pallas local compute must stay bitwise identical
    to the view path, fold seam included."""
    import gcm_filters_tpu.ops.pallas.cheb_pass as cp

    ny, nx = 256, 256  # 2x2 shards -> 128-row locals: nb>=2, DMA-eligible
    rng = np.random.default_rng(9)
    wet = np.ones((ny, nx)); wet[0] = 0
    area = 0.9 + 0.2 * rng.random((ny, nx))
    data = rng.random((ny, nx)).astype(np.float32)
    mesh = _mesh(2, 2)
    took_dma = []
    real_dma_on = cp._dma_on

    def spy(cfg):
        r = real_dma_on(cfg)
        took_dma.append(r)
        return r

    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(cp, "_DMA_WINDOWS", flag)
        if flag:
            monkeypatch.setattr(cp, "_dma_on", spy)
        filt = Filter(filter_scale=6.0, dx_min=1.0,
                      grid_type=GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
                      grid_vars={"area": area, "wet_mask": wet},
                      use_pallas=True, mesh=mesh, spatial_axes=("y", "x"))
        outs[flag] = np.asarray(filt.apply(data))
        monkeypatch.setattr(cp, "_dma_on", real_dma_on)
    assert any(took_dma), "sharded local compute never took the DMA path"
    np.testing.assert_array_equal(outs[True], outs[False])
    # and against the unsharded XLA engine at f32 tolerance
    monkeypatch.setattr(cp, "_DMA_WINDOWS", False)
    base = Filter(filter_scale=6.0, dx_min=1.0,
                  grid_type=GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
                  grid_vars={"area": area, "wet_mask": wet}, use_pallas=False)
    np.testing.assert_allclose(outs[True], np.asarray(base.apply(data)),
                               rtol=2e-5, atol=2e-6)


def test_sharded_vector_zap_nans_false_matches_unsharded():
    """A C-grid operator with zap_nans=False must propagate NaNs through
    the sharded XLA rounds exactly like the unsharded engine (review
    finding: the sharded lap_fn scrubbed unconditionally, so a NaN that
    poisons a 61-cell neighborhood unsharded left only 1 NaN sharded)."""
    import dataclasses

    from conftest import make_vector_grid_data
    from gcm_filters_tpu.engine import vector_filter_apply
    from gcm_filters_tpu.parallel.sharded import make_sharded_vector_apply

    _, (u, v), grid_vars = make_vector_grid_data(
        GridType.VECTOR_C_GRID, (64, 128))
    filt = Filter(filter_scale=6.0, dx_min=1.0,
                  grid_type=GridType.VECTOR_C_GRID, grid_vars=grid_vars,
                  use_pallas=False)
    op = dataclasses.replace(filt.operator, zap_nans=False)
    u = np.array(u)
    u[10, 20] = np.nan

    wu, wv = (np.asarray(a) for a in vector_filter_apply(
        op, filt.filter_spec, u, v))
    assert np.isnan(wu).sum() > 1  # NaN really spreads in this config

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("y", "x"))
    fn = make_sharded_vector_apply(op, filt.filter_spec, mesh, ("y", "x"),
                                   use_pallas=False)
    fu, fv = (np.asarray(a) for a in fn(u, v))
    assert (np.isnan(fu) == np.isnan(wu)).all()
    assert (np.isnan(fv) == np.isnan(wv)).all()
    m = ~np.isnan(wu)
    np.testing.assert_allclose(fu[m], wu[m], rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(fv[~np.isnan(wv)], wv[~np.isnan(wv)],
                               rtol=1e-11, atol=1e-13)
