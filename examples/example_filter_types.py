"""Filter types walkthrough: fixed scale, fixed factor, shape, anisotropy.

The TPU-native analogue of the reference's example_filter_types notebook
(reference docs/examples/example_filter_types.ipynb): demonstrates how the
same API covers the four filtering regimes and what they cost in n_steps.

Run: python examples/example_filter_types.py   (any backend)
"""
import numpy as np

import jax

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import gcm_filters_tpu as gf


def main():
    ny, nx = 256, 512
    rng = np.random.default_rng(7)
    data = rng.standard_normal((ny, nx))
    wet = np.ones((ny, nx))
    wet[0, :] = 0

    # 1. Fixed *scale* on an irregular grid: filter_scale in physical units,
    #    metric arrays describe the (here: gently varying) cell geometry.
    dx = 1.0 + 0.1 * np.cos(np.linspace(0, 2 * np.pi, nx))[None, :].repeat(ny, 0)
    dy = np.ones_like(dx)
    fixed_scale = gf.Filter(
        filter_scale=8.0,
        dx_min=float(dx.min()),
        grid_type=gf.GridType.IRREGULAR_WITH_LAND,
        grid_vars=dict(wet_mask=wet, dxw=dx, dyw=dy, dxs=dx, dys=dy,
                       area=dx * dy, kappa_w=np.ones_like(dx),
                       kappa_s=np.ones_like(dx)),
    )

    # 2. Simple fixed *factor*: coarsen by 8x via area weighting (dx_min=1).
    fixed_factor = gf.Filter(
        filter_scale=8.0,
        dx_min=1.0,
        grid_type=gf.GridType.REGULAR_WITH_LAND_AREA_WEIGHTED,
        grid_vars=dict(area=dx * dy, wet_mask=wet),
    )

    # 3. Taper shape: sharper spectral cutoff, ~3x the steps.
    taper = gf.Filter(
        filter_scale=8.0, dx_min=1.0,
        filter_shape=gf.FilterShape.TAPER,
        grid_type=gf.GridType.REGULAR,
    )

    # 4. Anisotropic: kappa_w < 1 shrinks the zonal filter scale only.
    aniso = gf.Filter(
        filter_scale=8.0,
        dx_min=float(dx.min()),
        grid_type=gf.GridType.IRREGULAR_WITH_LAND,
        grid_vars=dict(wet_mask=wet, dxw=dx, dyw=dy, dxs=dx, dys=dy,
                       area=dx * dy, kappa_w=0.25 * np.ones_like(dx),
                       kappa_s=np.ones_like(dx)),
    )

    for name, filt in [("fixed scale", fixed_scale),
                       ("fixed factor", fixed_factor),
                       ("taper", taper),
                       ("anisotropic", aniso)]:
        out = np.asarray(filt.apply(data))
        print(f"{name:13s} n_steps={filt.n_steps:3d} "
              f"var {data.var():.3f} -> {np.nanvar(out):.4f}")


if __name__ == "__main__":
    main()
