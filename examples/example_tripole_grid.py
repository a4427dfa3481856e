"""Tripolar-grid walkthrough: filtering across the Arctic seam.

The TPU-native analogue of the reference's example_tripole_grid notebook
(reference docs/examples/example_tripole_grid.ipynb): global ocean models
(POP, MOM, NEMO) avoid the north-pole coordinate singularity with a TRIPOLAR
grid whose top row folds onto itself — column i of the last row is physically
adjacent to column nx-1-i. Filtering must carry information across that seam
or the Arctic gets artificial boundaries.

Shows:
  1. the two tripolar grid types (simple fixed-factor vs POP flux-form),
  2. the fold-consistency validation the constructor enforces,
  3. seam symmetry: a spike on the top row diffuses symmetrically across
     the fold (the invariant tests/test_kernels_properties.py pins),
  4. the same filter sharded over a device mesh, where the fold becomes a
     reversed pairing permute between top-row devices.

Run: python examples/example_tripole_grid.py   (any backend; CPU fine)
"""
import numpy as np

import jax

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import gcm_filters_tpu as gf


def make_tripolar_grid(ny, nx, rng):
    """An idealized tripolar T-grid: Antarctica land row at j=0 (required —
    the fold means there is no southern wraparound), an idealized continent,
    and northern metric rows that FOLD onto themselves: the physical edge
    shared by columns i and nx-1-i must have one length, so the top dxn/dyn
    rows must satisfy row == row[::-1] (reference kernels.py:545-562)."""
    wet = np.ones((ny, nx))
    wet[0, :] = 0                      # Antarctica
    wet[ny // 3 : ny // 2, : nx // 4] = 0  # a continent

    def folding_metric(seed):
        m = 0.9 + 0.2 * rng.random((ny, nx))
        m[-1, :] = 0.5 * (m[-1, :] + m[-1, ::-1])  # make the top row fold
        return m

    dxe, dye = folding_metric(1), folding_metric(2)
    dxn, dyn = folding_metric(3), folding_metric(4)
    tarea = dxe * dye
    return wet, dxe, dye, dxn, dyn, tarea


def main():
    ny, nx = 128, 256
    rng = np.random.default_rng(11)
    wet, dxe, dye, dxn, dyn, tarea = make_tripolar_grid(ny, nx, rng)

    # --- 1. simple fixed-factor tripolar (area-weighted 5-point) ----------
    simple = gf.Filter(
        filter_scale=8.0, dx_min=1.0,
        grid_type=gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
        grid_vars={"area": tarea, "wet_mask": wet},
    )

    # --- POP flux-form tripolar (full metric terms) ------------------------
    pop = gf.Filter(
        filter_scale=8.0, dx_min=1.0,
        grid_type=gf.GridType.TRIPOLAR_POP_WITH_LAND,
        grid_vars={"wet_mask": wet, "dxe": dxe, "dye": dye,
                   "dxn": dxn, "dyn": dyn, "tarea": tarea},
    )

    # --- 2. the constructor validates the fold ----------------------------
    bad_dxn = dxn.copy()
    bad_dxn[-1, 0] += 1.0  # top row no longer folds onto itself
    try:
        gf.Filter(filter_scale=8.0, dx_min=1.0,
                  grid_type=gf.GridType.TRIPOLAR_POP_WITH_LAND,
                  grid_vars={"wet_mask": wet, "dxe": dxe, "dye": dye,
                             "dxn": bad_dxn, "dyn": dyn, "tarea": tarea})
    except AssertionError as e:
        print("fold validation works:", str(e)[:60], "...")

    # --- 3. seam symmetry --------------------------------------------------
    spike = np.zeros((ny, nx))
    spike[-1, nx // 4] = 1.0  # on the seam row
    for name, filt in [("simple", simple), ("pop", pop)]:
        sm = np.asarray(filt.apply(spike))
        mass_in = (spike * tarea * wet).sum()
        mass_out = (sm * tarea * wet).sum()
        print(f"{name:>7}: mass conserved to "
              f"{abs(mass_out - mass_in) / mass_in:.2e}, "
              f"spike spread across seam: "
              f"{sm[-2, nx - 1 - nx // 4]:.3e} (mirror cell is nonzero)")
        assert sm[-2, nx - 1 - nx // 4] > 0  # info crossed the fold

    # --- 4. sharded: the fold as communication ----------------------------
    if len(jax.devices()) >= 4:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("y", "x"))
        sharded = gf.Filter(
            filter_scale=8.0, dx_min=1.0,
            grid_type=gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
            grid_vars={"area": tarea, "wet_mask": wet},
            mesh=mesh, spatial_axes=("y", "x"),
        )
        data = rng.random((ny, nx))
        a = np.asarray(simple.apply(data))
        b = np.asarray(sharded.apply(data))
        print(f"sharded == unsharded across the fold seam: "
              f"max err {np.max(np.abs(a - b)):.2e}")
    else:
        print("(fewer than 4 devices; skipping the sharded fold demo)")


if __name__ == "__main__":
    main()
