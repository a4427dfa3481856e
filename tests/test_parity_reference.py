"""Parity tests: our operators and filters vs. the reference, run as an oracle.

These replace the reference's zarr golden-regression suite
(/root/reference/tests/test_kernels_validation.py, test_filter_validation.py):
instead of frozen snapshots we execute the reference implementation in-place
on the identical fixture data (same PCG64 seeds) and require allclose in
float64 — a strictly stronger contract than the float32 snapshots.
"""
import numpy as np
import pytest

from gcm_filters_tpu import Filter, FilterShape, GridType
from gcm_filters_tpu.ops import build_operator


RTOL = 1e-9
ATOL = 1e-11


def _ref_laplacian(reference, grid_type, grid_vars):
    ref_kernels, _ = reference
    cls = ref_kernels.ALL_KERNELS[ref_kernels.GridType[grid_type.name]]
    return cls(**{k: np.copy(v) for k, v in grid_vars.items()})


def _ref_filter_func(reference, grid_type, n_steps, filter_scale, filter_shape,
                     vector=False, transition_width=np.pi):
    ref_kernels, ref_filter = reference
    cls = ref_kernels.ALL_KERNELS[ref_kernels.GridType[grid_type.name]]
    spec = ref_filter._compute_filter_spec(
        filter_scale,
        1.0,
        ref_filter.FilterShape[filter_shape.name],
        transition_width,
        2,
        n_steps,
    )
    if vector:
        return ref_filter._create_filter_func_vec(spec, cls)
    return ref_filter._create_filter_func(spec, cls)


# ---------------------------------------------------------------------------
# Raw Laplacian parity
# ---------------------------------------------------------------------------


def test_scalar_laplacian_matches_reference(scalar_grid_data_with_mom5, reference):
    grid_type, data, grid_vars = scalar_grid_data_with_mom5
    ours = np.asarray(build_operator(grid_type, grid_vars).laplacian(data))
    theirs = _ref_laplacian(reference, grid_type, grid_vars)(data.copy())
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


def test_scalar_laplacian_batched(scalar_grid_data, reference):
    """Leading batch dims must broadcast over the same 2-D stencil."""
    grid_type, data, grid_vars = scalar_grid_data
    batch = np.stack([data, 2.0 * data + 1.0])
    ours = np.asarray(build_operator(grid_type, grid_vars).laplacian(batch))
    ref_lap = _ref_laplacian(reference, grid_type, grid_vars)
    for k in range(2):
        np.testing.assert_allclose(ours[k], ref_lap(batch[k].copy()), rtol=RTOL, atol=ATOL)


def test_vector_laplacian_matches_reference(vector_grid_data, reference):
    grid_type, (u, v), grid_vars = vector_grid_data
    op = build_operator(grid_type, grid_vars)
    ours_u, ours_v = (np.asarray(a) for a in op.laplacian(u, v))
    theirs_u, theirs_v = _ref_laplacian(reference, grid_type, grid_vars)(
        u.copy(), v.copy()
    )
    np.testing.assert_allclose(ours_u, theirs_u, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ours_v, theirs_v, rtol=1e-7, atol=1e-9)


# ---------------------------------------------------------------------------
# Full filter parity (the reference's filter-validation contract)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("filter_shape", [FilterShape.GAUSSIAN, FilterShape.TAPER])
def test_full_filter_matches_reference(scalar_grid_data, reference, filter_shape):
    grid_type, data, grid_vars = scalar_grid_data
    filt = Filter(
        filter_scale=8.0,
        dx_min=1.0,
        filter_shape=filter_shape,
        grid_type=grid_type,
        grid_vars=grid_vars,
        use_pallas=False,
    )
    ours = np.asarray(filt.apply(data))
    ref_fn = _ref_filter_func(
        reference, grid_type, filt.n_steps, 8.0, filter_shape
    )
    # reference filter_func takes grid vars positionally in annotation order
    from gcm_filters_tpu.models.grids import GRID_VAR_NAMES

    grid_args = [np.copy(grid_vars[k]) for k in GRID_VAR_NAMES[grid_type]]
    theirs = ref_fn(data.copy(), *grid_args)
    np.testing.assert_allclose(ours, theirs, rtol=1e-7, atol=1e-9)


def test_full_vector_filter_matches_reference(vector_grid_data, reference):
    grid_type, (u, v), grid_vars = vector_grid_data
    filt = Filter(
        filter_scale=8.0,
        dx_min=1.0,
        grid_type=grid_type,
        grid_vars=grid_vars,
        use_pallas=False,
    )
    ours_u, ours_v = (np.asarray(a) for a in filt.apply_to_vector(u, v))
    from gcm_filters_tpu.models.grids import GRID_VAR_NAMES

    ref_fn = _ref_filter_func(reference, grid_type, filt.n_steps, 8.0,
                              FilterShape.GAUSSIAN, vector=True)
    grid_args = [np.copy(grid_vars[k]) for k in GRID_VAR_NAMES[grid_type]]
    theirs_u, theirs_v = ref_fn(u.copy(), v.copy(), *grid_args)
    np.testing.assert_allclose(ours_u, theirs_u, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(ours_v, theirs_v, rtol=1e-6, atol=1e-8)


def test_filter_spec_matches_reference_across_settings(reference):
    """Sweep spec parameters; coefficients must agree with the reference solver."""
    _, ref_filter = reference
    from gcm_filters_tpu.filter_spec import compute_filter_spec

    for shape in (FilterShape.GAUSSIAN, FilterShape.TAPER):
        for scale, dx, ndim, n in [
            (10.0, 1.0, 2, 11),
            (2.0, 1.0, 1, 6),
            (50.0, 2.0, 2, 30),
            (5.0, 0.5, 3, 12),
        ]:
            ours = compute_filter_spec(scale, dx, shape, np.pi, ndim, n)
            theirs = ref_filter._compute_filter_spec(
                scale, dx, ref_filter.FilterShape[shape.name], np.pi, ndim, n
            )
            assert ours.n_steps == theirs.n_steps
            assert ours.s_max == theirs.s_max
            np.testing.assert_allclose(ours.p, theirs.p, rtol=1e-9, atol=1e-12)
            np.testing.assert_allclose(ours.dx_min_sq, theirs.dx_min_sq)
