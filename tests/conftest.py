"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Parity tests compare against the reference implementation executed in-place
from /root/reference (as an oracle — no reference code is vendored), using
the reference test suite's exact seeds and fixture constructions
(/root/reference/tests/conftest.py:79-133) so its golden contract carries
over. Sharding tests run on the 8 virtual CPU devices.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from typing import Tuple

import numpy as np
import pytest

from gcm_filters_tpu import GridType
from gcm_filters_tpu.models.grids import GRID_VAR_NAMES

# ---------------------------------------------------------------------------
# Reference oracle loader
# ---------------------------------------------------------------------------

_REF_PATH = "/root/reference/gcm_filters"


def _load_reference():
    """Import the reference package in-place (xarray stubbed if missing)."""
    import importlib
    import sys
    import types

    if "refgcm.kernels" in sys.modules:
        return sys.modules["refgcm.kernels"], sys.modules["refgcm.filter"]

    pkg = types.ModuleType("refgcm")
    pkg.__path__ = [_REF_PATH]
    sys.modules["refgcm"] = pkg
    try:
        import xarray  # noqa: F401
    except ImportError:
        class _StubDataset:  # never instantiated; only isinstance checks
            pass

        class _StubDataArray:
            pass

        xr_stub = types.ModuleType("xarray")
        xr_stub.Dataset = _StubDataset
        xr_stub.DataArray = _StubDataArray
        sys.modules["xarray"] = xr_stub
    kernels = importlib.import_module("refgcm.kernels")
    filt = importlib.import_module("refgcm.filter")
    return kernels, filt


@pytest.fixture(scope="session")
def reference():
    import os

    if not os.path.isdir(_REF_PATH):
        pytest.skip("reference implementation not available at " + _REF_PATH)
    kernels, filt = _load_reference()
    return kernels, filt


# ---------------------------------------------------------------------------
# Grid fixtures — same seeds/constructions as the reference test suite
# ---------------------------------------------------------------------------

scalar_grids = [
    GridType.REGULAR,
    GridType.REGULAR_AREA_WEIGHTED,
    GridType.REGULAR_WITH_LAND,
    GridType.REGULAR_WITH_LAND_AREA_WEIGHTED,
    GridType.IRREGULAR_WITH_LAND,
    GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
    GridType.TRIPOLAR_POP_WITH_LAND,
]
# MOM5 grids are untested in the reference suite; we cover them here too.
mom5_grids = [GridType.MOM5U, GridType.MOM5T]
irregular_grids = [GridType.IRREGULAR_WITH_LAND, GridType.TRIPOLAR_POP_WITH_LAND]
tripolar_grids = [
    GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
    GridType.TRIPOLAR_POP_WITH_LAND,
]
vector_grids = [GridType.VECTOR_C_GRID, GridType.VECTOR_B_GRID]


def make_random_data(shape: Tuple[int, int], seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.random(shape)


def make_mask_data(shape: Tuple[int, int]) -> np.ndarray:
    mask_data = np.ones(shape)
    ny, nx = shape
    mask_data[0, :] = 0  # "Antarctica" land row, required by tripolar kernels
    mask_data[: (ny // 2), : (nx // 2)] = 0  # quarter-domain island
    return mask_data


def make_irregular_grid_data(shape: Tuple[int, int], seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    grid_data = 0.9 + 0.2 * rng.random(shape)  # positive, mean ~1
    return grid_data


def make_irregular_tripole_grid_data(shape: Tuple[int, int], seed: int) -> np.ndarray:
    grid_data = make_irregular_grid_data(shape, seed)
    nx = shape[-1]
    # northern edge metrics must fold onto themselves across the seam
    grid_data[-1, (nx // 2):] = grid_data[-1, : (nx // 2)][::-1]
    return grid_data


def make_scalar_grid_data(grid_type: GridType, shape=(128, 256)):
    data = make_random_data(shape, 100)
    grid_vars = {}
    seed = 0
    for seed, name in enumerate(GRID_VAR_NAMES[grid_type]):
        if name == "wet_mask":
            grid_vars[name] = make_mask_data(shape)
        elif "kappa" in name:
            grid_vars[name] = np.ones(shape)
        else:
            grid_vars[name] = make_irregular_grid_data(shape, seed)
    if grid_type == GridType.TRIPOLAR_POP_WITH_LAND:
        for name in GRID_VAR_NAMES[grid_type]:
            if name in ("dxn", "dyn"):
                seed += 1
                grid_vars[name] = make_irregular_tripole_grid_data(shape, seed)
    return grid_type, data, grid_vars


@pytest.fixture(scope="session", params=scalar_grids)
def scalar_grid_data(request):
    return make_scalar_grid_data(request.param)


@pytest.fixture(scope="session", params=scalar_grids + mom5_grids)
def scalar_grid_data_with_mom5(request):
    return make_scalar_grid_data(request.param)


@pytest.fixture(scope="session", params=irregular_grids)
def irregular_scalar_grid_data(request):
    return make_scalar_grid_data(request.param)


@pytest.fixture(scope="session", params=tripolar_grids)
def tripolar_grid_data(request):
    # Uniform metrics / regular-grid assumptions, as in the reference's
    # tripolar exchange tests.
    grid_type = request.param
    shape = (128, 256)
    data = make_random_data(shape, 30)
    grid_vars = {}
    for name in GRID_VAR_NAMES[grid_type]:
        if name == "wet_mask":
            grid_vars[name] = make_mask_data(shape)
        else:
            grid_vars[name] = np.ones(shape)
    return grid_type, data, grid_vars


def make_spherical_geometry(shape=(128, 256)):
    """NeverWorld2-like spherical C-grid lat/lon (reference conftest.py:180-213)."""
    ny, nx = shape
    lat_min, lat_max = -70, 70
    latCu = np.linspace(
        lat_min + 0.5 * (lat_max - lat_min) / ny,
        lat_max - 0.5 * (lat_max - lat_min) / ny,
        ny,
    )
    latCv = np.linspace(lat_min + (lat_max - lat_min) / ny, lat_max, ny)
    lon_min, lon_max = 0, 60
    lonCu = np.linspace(lon_min + (lon_max - lon_min) / nx, lon_max, nx)
    lonCv = np.linspace(
        lon_min + 0.5 * (lon_max - lon_min) / nx,
        lon_max - 0.5 * (lon_max - lon_min) / nx,
        nx,
    )
    geolonCu, geolatCu = np.meshgrid(lonCu, latCu)
    geolonCv, geolatCv = np.meshgrid(lonCv, latCv)
    return geolonCu, geolatCu, geolonCv, geolatCv


def make_vector_grid_data(grid_type: GridType, shape=(128, 256)):
    geolonCu, geolatCu, geolonCv, geolatCv = make_spherical_geometry(shape)
    ny, nx = shape
    R = 6378000.0

    grid_vars = {}
    dy = None
    for name in GRID_VAR_NAMES[grid_type]:
        if name in ("dxCu", "dxT", "HUS", "HTE"):
            grid_vars[name] = R * np.cos(geolatCu / 360 * 2 * np.pi)
            dy = np.max(grid_vars[name]) * np.ones((ny, nx))
        if name in ("dxCv", "dxBu", "DXU", "HUW", "HTN"):
            grid_vars[name] = R * np.cos(geolatCv / 360 * 2 * np.pi)
    for name in GRID_VAR_NAMES[grid_type]:
        if name in ("dyCu", "dyCv", "dyBu", "dyT", "DYU"):
            grid_vars[name] = dy
    for name in GRID_VAR_NAMES[grid_type]:
        if name == "area_u":
            grid_vars[name] = grid_vars["dxCu"] * grid_vars["dyCu"]
        elif name == "area_v":
            grid_vars[name] = grid_vars["dxCv"] * grid_vars["dyCv"]
        elif name == "UAREA":
            grid_vars[name] = grid_vars["DXU"] * grid_vars["DYU"]
        elif name == "TAREA":
            grid_vars[name] = grid_vars["HTE"] * grid_vars["DYU"]
    for name in GRID_VAR_NAMES[grid_type]:
        if name in ("kappa_iso", "kappa_aniso"):
            grid_vars[name] = np.ones((ny, nx))
    mask_data = np.ones((ny, nx))
    mask_data[: (ny // 2), : (nx // 2)] = 0
    for name in GRID_VAR_NAMES[grid_type]:
        if name in ("wet_mask_t", "wet_mask_q"):
            grid_vars[name] = mask_data

    data_u = make_random_data((ny, nx), 42)
    data_v = make_random_data((ny, nx), 43)
    return grid_type, (data_u, data_v), grid_vars


@pytest.fixture(scope="session", params=vector_grids)
def vector_grid_data(request):
    return make_vector_grid_data(request.param)


@pytest.fixture(scope="session")
def spherical_geometry():
    return make_spherical_geometry()
