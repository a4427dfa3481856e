"""Golden snapshot regression tests.

Mirror of the reference's zarr golden-data contract
(/root/reference/tests/test_kernels_validation.py and
test_filter_validation.py): one raw Laplacian application and one full
Gaussian scale-8 filter per grid type, frozen as float32 snapshots and
compared allclose on every run. Regeneration is env-gated, exactly like the
reference's GCM_FILTERS_OVERWRITE_TEST_DATA:

    GCM_FILTERS_TPU_OVERWRITE_TEST_DATA=1 python -m pytest tests/test_golden_regression.py

Snapshots use .npz (zarr is not a dependency); inputs are the session
fixtures, which reuse the reference suite's PCG64 seeds, so the data
contract carries over. These complement (not replace) the stronger live
oracle tests in test_parity_reference.py: the snapshots also catch drift
when the reference tree is unavailable.
"""
import os
import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from gcm_filters_tpu import Filter, GridType
from gcm_filters_tpu.ops import build_operator

DATA_DIR = pathlib.Path(__file__).parent / "test_data_golden"
OVERWRITE = os.environ.get("GCM_FILTERS_TPU_OVERWRITE_TEST_DATA", "") == "1"


def _check_or_write(name: str, arrays: dict):
    path = DATA_DIR / f"{name}.npz"
    if OVERWRITE:
        DATA_DIR.mkdir(exist_ok=True)
        np.savez_compressed(path, **{k: np.float32(v) for k, v in arrays.items()})
        pytest.skip(f"regenerated {path.name}")
    if not path.exists():
        pytest.fail(
            f"golden snapshot {path.name} is missing -- regenerate explicitly "
            "with GCM_FILTERS_TPU_OVERWRITE_TEST_DATA=1 (a missing snapshot "
            "must never be silently created and compared against itself)"
        )
    saved = np.load(path)
    for k, v in arrays.items():
        np.testing.assert_allclose(
            np.float32(v), saved[k], rtol=1e-5, atol=1e-6,
            err_msg=f"{name}:{k} drifted from golden snapshot",
        )


def test_golden_laplacian(scalar_grid_data_with_mom5):
    grid_type, data, grid_vars = scalar_grid_data_with_mom5
    out = np.asarray(build_operator(grid_type, grid_vars).laplacian(data))
    _check_or_write(f"laplacian_{grid_type.name}", {"lap": out})


def test_golden_laplacian_vector(vector_grid_data):
    grid_type, (u, v), grid_vars = vector_grid_data
    lu, lv = build_operator(grid_type, grid_vars).laplacian(u, v)
    _check_or_write(
        f"laplacian_{grid_type.name}",
        {"lap_u": np.asarray(lu), "lap_v": np.asarray(lv)},
    )


def test_golden_filter(scalar_grid_data):
    grid_type, data, grid_vars = scalar_grid_data
    filt = Filter(filter_scale=8.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False)
    out = np.asarray(filt.apply(data))
    _check_or_write(f"filter_{grid_type.name}", {"filtered": out})


def test_golden_filter_vector(vector_grid_data):
    grid_type, (u, v), grid_vars = vector_grid_data
    filt = Filter(filter_scale=8.0, dx_min=1.0, grid_type=grid_type,
                  grid_vars=grid_vars, use_pallas=False)
    fu, fv = filt.apply_to_vector(u, v)
    _check_or_write(
        f"filter_{grid_type.name}",
        {"filtered_u": np.asarray(fu), "filtered_v": np.asarray(fv)},
    )
