"""Render the figures for docs/tutorial.md.

The reference ships executed notebooks whose plots show what filtering
*does* (reference docs/examples/*.ipynb); this repo's CI-executed examples
are scripts, so the rendered-figure walkthrough lives here: one
deterministic script that regenerates every docs/img/tutorial_*.png from
synthetic data on any backend (CPU is fine — figures are small domains).

Color follows the data's job: perceptually-uniform sequential (viridis)
for magnitude fields, a two-hue diverging map centered on zero (RdBu_r)
for signed fields, and line plots that keep plot_shape's own
legend-consistent series colors. No rainbow maps, one y-axis per plot.

Run: python examples/render_tutorial_figures.py   (writes docs/img/)
"""
import os
import sys

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.colors import TwoSlopeNorm

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gcm_filters_tpu as gf

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "img")

GRID_KW = dict(color="0.85", linewidth=0.6)


def _style(ax):
    ax.grid(True, **GRID_KW)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)


def synth_eddy_field(ny, nx, rng, n_eddies=160, seam_blob=False,
                     jet=True):
    """Large-scale jet + mesoscale eddies on a unit grid."""
    y, x = np.mgrid[0:ny, 0:nx].astype(float)
    field = 1.5 * np.tanh((y - ny / 2) / (ny / 8)) if jet else \
        np.zeros((ny, nx))
    for _ in range(n_eddies):
        cy, cx = rng.uniform(0, ny), rng.uniform(0, nx)
        r = rng.uniform(3.0, 9.0)
        amp = rng.normal(0, 0.8)
        d2 = (y - cy) ** 2 + np.minimum(
            (x - cx) ** 2, (nx - np.abs(x - cx)) ** 2)
        field += amp * np.exp(-d2 / (2 * r * r))
    if seam_blob:
        # one eddy pinned across the tripolar fold (the top row) to make
        # seam continuity visible
        d2 = (y - (ny - 1)) ** 2 + (x - nx * 0.3) ** 2
        field += 2.5 * np.exp(-d2 / (2 * 36.0))
    return field


def fig_before_after():
    """Basic use: land-masked field, before / after / anomaly."""
    ny, nx = 256, 384
    rng = np.random.default_rng(11)
    data = synth_eddy_field(ny, nx, rng)
    wet = np.ones((ny, nx))
    wet[:, 150:170] = 0  # a meridional land bar
    wet[40:90, 210:300] = 0  # an island
    data = np.where(wet == 1, data, np.nan)

    filt = gf.Filter(
        filter_scale=24.0, dx_min=1.0,
        grid_type=gf.GridType.REGULAR_WITH_LAND,
        grid_vars={"wet_mask": wet},
    )
    filtered = np.asarray(filt.apply(np.nan_to_num(data)))
    filtered = np.where(wet == 1, filtered, np.nan)

    lim = np.nanmax(np.abs(data))
    norm = TwoSlopeNorm(vcenter=0.0, vmin=-lim, vmax=lim)
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.4), constrained_layout=True)
    panels = [
        ("unfiltered tracer", data),
        ("filtered (scale = 24 cells)", filtered),
        ("removed eddies (difference)", data - filtered),
    ]
    for ax, (title, f) in zip(axes, panels):
        im = ax.pcolormesh(f, cmap="RdBu_r", norm=norm, rasterized=True)
        ax.set_title(title, fontsize=10)
        ax.set_xticks([])
        ax.set_yticks([])
        ax.set_facecolor("0.6")  # land shows as neutral gray under NaN
    fig.colorbar(im, ax=axes, shrink=0.85, label="tracer anomaly")
    fig.savefig(os.path.join(OUT, "tutorial_before_after.png"), dpi=110)
    plt.close(fig)


def fig_filter_shapes():
    """The two filter shapes' target vs achieved transfer functions."""
    fig, axes = plt.subplots(1, 2, figsize=(10, 3.6), constrained_layout=True)
    for ax, shape in (
        (axes[0], gf.FilterShape.GAUSSIAN),
        (axes[1], gf.FilterShape.TAPER),
    ):
        filt = gf.Filter(
            filter_scale=8.0, dx_min=1.0, filter_shape=shape,
            grid_type=gf.GridType.REGULAR, grid_vars={},
        )
        filt.plot_shape(ax=ax)
        ax.set_title(f"{shape.name.title()} (n_steps = {filt.n_steps})",
                     fontsize=10)
        _style(ax)
    fig.savefig(os.path.join(OUT, "tutorial_shapes.png"), dpi=110)
    plt.close(fig)


def fig_tripolar_seam():
    """Continuity across the tripolar fold: an eddy straddling the seam."""
    ny, nx = 192, 256
    rng = np.random.default_rng(5)
    data = synth_eddy_field(ny, nx, rng, n_eddies=90, seam_blob=True,
                            jet=False)
    wet = np.ones((ny, nx))
    wet[0, :] = 0  # Antarctica row, required by the tripolar grids
    data = data * wet

    filt = gf.Filter(
        filter_scale=16.0, dx_min=1.0,
        grid_type=gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
        grid_vars={"wet_mask": wet, "area": np.ones((ny, nx))},
    )
    filtered = np.asarray(filt.apply(data))

    # fold view: the physical Arctic neighborhood is the top rows glued to
    # their x-reversed selves — a filter that respects the fold leaves no
    # crease along the glue line
    def fold_view(f, rows=48):
        top = f[-rows:]
        return np.concatenate([top, top[::-1, ::-1]], axis=0)

    lim = np.nanmax(np.abs(filtered[-48:]))
    norm = TwoSlopeNorm(vcenter=0.0, vmin=-lim, vmax=lim)
    fig, axes = plt.subplots(1, 2, figsize=(10, 3.6), constrained_layout=True)
    for ax, (title, f) in zip(axes, (
        ("unfiltered, unfolded seam view", fold_view(data)),
        ("filtered: no crease at the fold", fold_view(filtered)),
    )):
        im = ax.pcolormesh(f, cmap="RdBu_r", norm=norm, rasterized=True)
        ax.axhline(48, color="k", linewidth=1.0, linestyle=":")
        ax.set_title(title, fontsize=10)
        ax.set_xticks([])
        ax.set_yticks([])
    fig.colorbar(im, ax=axes, shrink=0.85, label="tracer anomaly")
    fig.savefig(os.path.join(OUT, "tutorial_tripolar_seam.png"), dpi=110)
    plt.close(fig)


def fig_eke():
    """Eddy/mean decomposition: a fixed 600 km scale on a lat/lon grid."""
    from example_satellite_observations import (
        metrics_from_latlon, synthesize_observations)

    rng = np.random.default_rng(3)
    lat, lon, u, v, wet = synthesize_observations(180, 360, 1, rng)
    u, v = u[0], v[0]
    dx, dy, area = metrics_from_latlon(lat, lon)

    filt = gf.Filter(
        filter_scale=600e3, dx_min=float(dx.min()),
        grid_type=gf.GridType.IRREGULAR_WITH_LAND,
        grid_vars={
            "wet_mask": wet,
            "dxw": dx, "dyw": dy, "dxs": dx, "dys": dy, "area": area,
            "kappa_w": np.ones_like(dx), "kappa_s": np.ones_like(dx),
        },
    )
    ub = np.asarray(filt.apply(np.nan_to_num(u) * wet))
    vb = np.asarray(filt.apply(np.nan_to_num(v) * wet))
    ke = 0.5 * (np.nan_to_num(u) ** 2 + np.nan_to_num(v) ** 2)
    mke = 0.5 * (ub**2 + vb**2)
    keb = np.asarray(filt.apply(ke * wet))
    eke = np.maximum(keb - mke, 0.0)

    mask = wet == 1
    fig, axes = plt.subplots(1, 2, figsize=(11, 3.2), constrained_layout=True)
    for ax, (title, f) in zip(axes, (
        ("mean kinetic energy (filtered flow)", mke),
        ("eddy kinetic energy (residual)", eke),
    )):
        shown = np.where(mask, f, np.nan)
        im = ax.pcolormesh(lon, lat, shown, cmap="viridis", rasterized=True,
                           vmin=0.0, vmax=np.nanpercentile(shown, 99))
        ax.set_facecolor("0.6")
        ax.set_xlabel("longitude")
        ax.set_ylabel("latitude")
        ax.set_title(title, fontsize=10)
        fig.colorbar(im, ax=ax, shrink=0.9, label="m$^2$ s$^{-2}$")
    fig.savefig(os.path.join(OUT, "tutorial_eke.png"), dpi=110)
    plt.close(fig)


def main():
    os.makedirs(OUT, exist_ok=True)
    fig_before_after()
    print("tutorial_before_after.png")
    fig_filter_shapes()
    print("tutorial_shapes.png")
    fig_tripolar_seam()
    print("tutorial_tripolar_seam.png")
    fig_eke()
    print("tutorial_eke.png")


if __name__ == "__main__":
    main()
