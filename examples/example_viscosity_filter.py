"""Vector (viscosity) filtering of a velocity field on a spherical C-grid.

The TPU-native analogue of the reference's viscosity-filter example: filtering
(u, v) with the Griffies & Hallberg C-grid operator preserves solid-body
rotation exactly — the invariant that distinguishes a *vector* filter from
filtering the two components independently (reference tests/test_filter.py:256-291).

Run: python examples/example_viscosity_filter.py   (any backend)
"""
import numpy as np

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import gcm_filters_tpu as gf


def spherical_c_grid(ny=128, nx=256, lat_max=70.0, lon_max=60.0):
    """NeverWorld2-like spherical sector C-grid metric arrays (meters)."""
    R = 6378000.0
    latCu = np.linspace(-lat_max + lat_max / ny, lat_max - lat_max / ny, ny)
    latCv = np.linspace(-lat_max + 2 * lat_max / ny, lat_max, ny)
    geolatCu = np.meshgrid(np.linspace(0, lon_max, nx), latCu)[1]
    geolatCv = np.meshgrid(np.linspace(0, lon_max, nx), latCv)[1]

    dxCu = R * np.cos(np.deg2rad(geolatCu))
    dxCv = R * np.cos(np.deg2rad(geolatCv))
    dy = np.full((ny, nx), dxCu.max())
    ones = np.ones((ny, nx))
    gv = dict(
        wet_mask_t=ones, wet_mask_q=ones,
        dxT=dxCu, dyT=dy, dxCu=dxCu, dyCu=dy, dxCv=dxCv, dyCv=dy,
        dxBu=dxCv, dyBu=dy,
        area_u=dxCu * dy, area_v=dxCv * dy,
        kappa_iso=ones, kappa_aniso=ones,
    )
    return gv, geolatCu, float(dxCu.min())


def main():
    ny, nx = 128, 256
    gv, geolat, dx_min = spherical_c_grid(ny, nx)

    filt = gf.Filter(
        filter_scale=4 * dx_min,  # filter at 4x the smallest grid spacing
        dx_min=dx_min,
        grid_type=gf.GridType.VECTOR_C_GRID,
        grid_vars=gv,
    )
    print(f"n_steps = {filt.n_steps}")

    # Solid-body rotation: u = cos(lat), v = 0 — in the operator's null space.
    u_sb = np.cos(np.deg2rad(geolat))
    v_sb = np.zeros((ny, nx))
    fu, fv = (np.asarray(a) for a in filt.apply_to_vector(u_sb, v_sb))
    print("solid-body u max deviation:", np.abs(fu - u_sb).max())
    print("solid-body v max deviation:", np.abs(fv).max())

    # A noisy eddying field is smoothed.
    rng = np.random.default_rng(3)
    u = u_sb + 0.5 * rng.standard_normal((ny, nx))
    v = 0.5 * rng.standard_normal((ny, nx))
    fu, fv = (np.asarray(a) for a in filt.apply_to_vector(u, v))
    print(f"u variance {u.var():.3f} -> {fu.var():.3f}; "
          f"v variance {v.var():.3f} -> {fv.var():.3f}")


if __name__ == "__main__":
    main()
