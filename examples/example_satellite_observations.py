"""Filtering gridded satellite observations: eddy/mean flow decomposition.

The TPU-native analogue of the reference's example_satellite_observations
notebook (reference docs/examples/example_satellite_observations.ipynb):
gridded surface-velocity products (e.g. OSCAR) come as lat/lon fields with
land gaps and NaNs. Spatial filtering splits the kinetic energy into mean
and eddy parts:

    KE  = (u^2 + v^2) / 2
    MKE = (u_bar^2 + v_bar^2) / 2          (energy of the large-scale flow)
    EKE = KE_bar - MKE                     (energy carried by the eddies)

This example synthesizes an OSCAR-like field (no network access here: a
large-scale gyre + mesoscale eddies on a 1/4-degree lat/lon grid with
continents and NaN data gaps) and shows the full workflow:

  1. build the latitude-dependent metric arrays from the lat/lon grid,
  2. filter through land/NaN gaps with IRREGULAR_WITH_LAND (fixed scale,
     in meters!) — NaN observations are treated as missing, land stays land,
  3. batch over a time axis in one call (the dask-parallelism analogue),
  4. compute the MKE / EKE maps.

Run: python examples/example_satellite_observations.py   (any backend)
"""
import numpy as np

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import gcm_filters_tpu as gf

R_EARTH = 6.371e6  # m


def synthesize_observations(nlat, nlon, nt, rng):
    """An OSCAR-like surface velocity product: gyres + eddies + gaps."""
    lat = np.linspace(-60, 60, nlat)
    lon = np.linspace(0, 360, nlon, endpoint=False)
    LON, LAT = np.meshgrid(lon, lat)

    # large-scale double gyre + mesoscale eddy field, drifting in time
    u = np.empty((nt, nlat, nlon))
    v = np.empty((nt, nlat, nlon))
    for t in range(nt):
        ph = 2 * np.pi * t / nt
        u[t] = 0.4 * np.sin(2 * np.pi * LAT / 60) \
            + 0.15 * np.sin(18 * np.pi * LON / 360 + ph) \
            * np.cos(10 * np.pi * LAT / 60)
        v[t] = 0.1 * np.cos(2 * np.pi * LON / 360) \
            + 0.15 * np.cos(16 * np.pi * LON / 360 - ph) \
            * np.sin(12 * np.pi * LAT / 60)
    u += 0.02 * rng.standard_normal(u.shape)
    v += 0.02 * rng.standard_normal(v.shape)

    # continents + a few swath-like NaN data gaps
    wet = np.ones((nlat, nlon))
    wet[:, : nlon // 8] = 0
    wet[nlat // 2 :, 3 * nlon // 8 : nlon // 2] = 0
    u[:, wet == 0] = np.nan
    v[:, wet == 0] = np.nan
    gap = rng.random((nlat, nlon)) < 0.01
    u[:, gap] = np.nan
    v[:, gap] = np.nan
    return lat, lon, u, v, wet


def metrics_from_latlon(lat, lon):
    """Cell spacings/areas of a regular lat/lon grid, in meters: dx shrinks
    with cos(latitude) — exactly the anisotropy IRREGULAR_WITH_LAND's
    flux-form metric arrays express."""
    nlat, nlon = len(lat), len(lon)
    dlat = np.deg2rad(lat[1] - lat[0])
    dlon = np.deg2rad(lon[1] - lon[0])
    coslat = np.cos(np.deg2rad(lat))[:, None] * np.ones((1, nlon))
    dx = R_EARTH * coslat * dlon   # zonal spacing (m)
    dy = R_EARTH * dlat * np.ones((nlat, nlon))
    area = dx * dy
    return dx, dy, area


def main():
    rng = np.random.default_rng(42)
    nlat, nlon, nt = 240, 720, 4
    lat, lon, u, v, wet = synthesize_observations(nlat, nlon, nt, rng)
    dx, dy, area = metrics_from_latlon(lat, lon)

    # Fixed-SCALE filter at 600 km: filter_scale and dx_min in meters.
    # NaN gaps are ingested as missing data (NaN -> 0 with no-flux walls at
    # land); kappa == 1 everywhere keeps the scale isotropic in physical
    # space even though dx varies with latitude.
    filt = gf.Filter(
        filter_scale=600e3,
        dx_min=float(dx.min()),
        grid_type=gf.GridType.IRREGULAR_WITH_LAND,
        grid_vars={
            "wet_mask": wet,
            "dxw": dx, "dyw": dy, "dxs": dx, "dys": dy,
            "area": area,
            "kappa_w": np.ones_like(dx), "kappa_s": np.ones_like(dx),
        },
    )
    print(f"600 km Gaussian on a 1/4-degree grid: n_steps = {filt.n_steps}")

    # One call filters the whole (time, lat, lon) stack — leading dims batch.
    ke = 0.5 * (np.nan_to_num(u) ** 2 + np.nan_to_num(v) ** 2)
    u_bar = np.asarray(filt.apply(np.nan_to_num(u) * wet))
    v_bar = np.asarray(filt.apply(np.nan_to_num(v) * wet))
    ke_bar = np.asarray(filt.apply(ke * wet))

    mke = 0.5 * (u_bar**2 + v_bar**2)
    eke = ke_bar - mke

    ocean = wet == 1
    print(f"mean KE : {ke[:, ocean].mean():.4f} m^2/s^2")
    print(f"mean MKE: {mke[:, ocean].mean():.4f} m^2/s^2 (large-scale flow)")
    print(f"mean EKE: {eke[:, ocean].mean():.4f} m^2/s^2 (eddies)")
    assert eke[:, ocean].mean() > 0, "eddy energy must be positive on average"
    # the filter removed the mesoscale: MKE < KE strictly
    assert mke[:, ocean].mean() < ke[:, ocean].mean()
    print("decomposition consistent: MKE + EKE == filtered KE (by construction)")


if __name__ == "__main__":
    main()
