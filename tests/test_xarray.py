"""xarray/dask adapter tests, mirroring the reference's Dataset suite
(/root/reference/tests/test_filter.py:172-218). xarray is not installed in
every environment (it is absent from the TPU image), so the whole module
skips unless it imports; CI runs it in a dedicated xarray+dask job."""
import numpy as np
import pytest

xr = pytest.importorskip("xarray")

from gcm_filters_tpu import Filter, FilterShape, GridType


@pytest.fixture()
def dataset():
    rng = np.random.default_rng(0)
    return xr.Dataset(
        data_vars=dict(
            spatial=(("y", "x"), rng.standard_normal((64, 64))),
            temporal=(("time",), rng.standard_normal(10)),
            spatiotemporal=(("time", "y", "x"),
                            rng.standard_normal((10, 64, 64))),
        ),
        coords=dict(
            time=np.linspace(0, 1, 10),
            x=np.linspace(0, 1e6, 64),
            y=np.linspace(0, 1e6, 64),
        ),
    )


@pytest.fixture()
def filt():
    return Filter(filter_scale=4, dx_min=1,
                  filter_shape=FilterShape.GAUSSIAN,
                  grid_type=GridType.REGULAR, use_pallas=False)


def test_dataset_application(dataset, filt):
    out = filt.apply(dataset, ["y", "x"])
    # temporal variables pass through untouched
    xr.testing.assert_allclose(dataset.temporal, out.temporal)
    # spatial variables change
    assert not np.allclose(out.spatial.values, dataset.spatial.values)
    assert not np.allclose(out.spatiotemporal.values,
                           dataset.spatiotemporal.values)
    # the filter acts only over space: spatial means are preserved per time
    xr.testing.assert_allclose(
        dataset.spatiotemporal.mean(dim=["y", "x"]),
        out.spatiotemporal.mean(dim=["y", "x"]),
    )
    # dims/coords survive
    assert out.spatial.dims == ("y", "x")
    assert (out.x == dataset.x).all()


def test_dataset_nothing_filtered_warns(dataset, filt):
    with pytest.warns(UserWarning, match=r".*nothing was filtered.*"):
        filt.apply(dataset, ["foo", "bar"])


def test_dataarray_requires_dims(dataset, filt):
    with pytest.raises(ValueError, match="dims"):
        filt.apply(dataset.spatial)


def test_dataarray_roundtrip_matches_array_path(dataset, filt):
    da = dataset.spatial
    out_xr = filt.apply(da, ["y", "x"]).values
    out_np = np.asarray(filt.apply(da.values))
    np.testing.assert_allclose(out_xr, out_np, rtol=1e-12, atol=1e-14)


def test_dataarray_transposed_dims(dataset, filt):
    """apply_ufunc moves core dims to the end, so a (x, y)-ordered array
    with dims=['y','x'] must equal the canonical order's result."""
    da = dataset.spatial.transpose("x", "y")
    out_t = filt.apply(da, ["y", "x"]).transpose("y", "x").values
    out = filt.apply(dataset.spatial, ["y", "x"]).values
    np.testing.assert_allclose(out_t, out, rtol=1e-12, atol=1e-14)


def test_dataarray_dtype_override(dataset):
    import jax.numpy as jnp

    filt32 = Filter(filter_scale=4, dx_min=1, grid_type=GridType.REGULAR,
                    dtype=jnp.float32, use_pallas=False)
    out = filt32.apply(dataset.spatial, ["y", "x"])
    assert out.dtype == np.float32


def test_dask_lazy_and_chunked(dataset, filt):
    dask = pytest.importorskip("dask")  # noqa: F841

    da = dataset.spatiotemporal.chunk({"time": 2})
    out = filt.apply(da, ["y", "x"])
    # lazy until computed
    assert out.chunks is not None
    computed = out.compute()
    eager = filt.apply(dataset.spatiotemporal, ["y", "x"])
    np.testing.assert_allclose(computed.values, eager.values,
                               rtol=1e-12, atol=1e-14)


def test_vector_dataarrays(filt):
    from conftest import make_vector_grid_data

    grid_type, (du, dv), grid_vars = make_vector_grid_data(
        GridType.VECTOR_C_GRID, shape=(64, 64))
    vf = Filter(filter_scale=3.0, dx_min=1.0, grid_type=grid_type,
                grid_vars=grid_vars, use_pallas=False)
    u = xr.DataArray(du, dims=("y", "x"))
    v = xr.DataArray(dv, dims=("y", "x"))
    fu, fv = vf.apply_to_vector(u, v, ["y", "x"])
    nu, nv = vf.apply_to_vector(du, dv)
    np.testing.assert_allclose(fu.values, np.asarray(nu),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(fv.values, np.asarray(nv),
                               rtol=1e-12, atol=1e-14)
