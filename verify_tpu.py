"""On-chip numerical correctness gate for the compiled Pallas kernels.

Every exactness test in tests/ runs Pallas with interpret=True on CPU; this
script closes the remaining hole (a Mosaic miscompile or chip-specific
numeric divergence in the production path would otherwise ship undetected).
It runs on the REAL TPU for every grid type and asserts, at float32
tolerance:

  1. compiled Pallas pass  ==  on-chip XLA engine      (same chip, same dtype)
  2. compiled Pallas pass  ==  CPU float64 golden      (cross-platform)
  3. on-chip XLA engine    ==  CPU float64 golden      (isolates XLA:TPU)
  4. one sharded-on-a-1x1-mesh case (scalar + vector)  ==  golden

plus an odd-shape (pad-to-block) scalar case. Fallback telemetry is checked
so a silent Pallas->XLA pin cannot make comparison (1) vacuous.

Production-config coverage (round-3 VERDICT item #4): the 256x512 gate
selects different compiled artifacts than the 2400x3600 workloads the
benchmarks advertise, so `_prod_cases()` additionally verifies, at full
production shape, the exact configs the numbers are claimed for:

  - the headline scalar tripolar Gaussian factor-10 (single-pass br=48,
    const-embedded extended coefficients),
  - the Taper n_steps=39 multi-pass split,
  - both vector operators (C-grid tap kernel, B-grid coupled kernel),
  - IRREGULAR_WITH_LAND, whose ~330 MB of extended coefficient blocks
    exceed _CONST_EMBED_LIMIT and exercise the runtime-argument path.

Inputs are regenerated deterministically on both sides (seeded); only the
f32-cast float64 goldens are stored (.verify_golden_prod.npz). Comparisons
upload the golden and reduce ON CHIP (scalar readbacks only - a 35 MB
download through the tunnel is slow, an upload is paid once per case).

Two phases (one command each):

  python verify_tpu.py --golden     # CPU+f64 subprocess: inputs + goldens -> .verify_golden.npz
  python verify_tpu.py              # on the chip: runs both phases (spawns the golden
                                    # subprocess if the npz is missing), writes VERIFY_TPU.json
  ... --quick                       # skip the 2400x3600 production cases
  ... --golden-prod                 # (subprocess) production goldens only
  ... --dma                         # force _DMA_WINDOWS=True (gate the
                                    # manual-DMA kernels before a default
                                    # flip) -> VERIFY_TPU_DMA.json

Tunnel notes: inputs/results are ~0.5 MB f32 each — full transfers at this
size are fine through axon; only timing-sensitive work must avoid them.

Contract mirrored from the reference's golden-regression suite
(/root/reference/tests/test_filter_validation.py:87-93): same construction
style, reproducible seeds, allclose gating.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), ".verify_golden.npz")
GOLDEN_PROD_PATH = os.path.join(
    os.path.dirname(__file__), ".verify_golden_prod.npz")
OUT_PATH = os.path.join(os.path.dirname(__file__), "VERIFY_TPU.json")

NY, NX = 256, 512
ODD_NY, ODD_NX = 250, 512  # exercises the pad-to-block rounds path
FILTER_KW = dict(filter_scale=8.0)  # dx_min per grid below
TOL = 1e-5  # normalized max |err| gate, per VERDICT round-1 contract



def _fallback_keys() -> dict:
    """Split the telemetry counters into gate semantics: ``fell_back`` =
    the Pallas kernel was PINNED to the XLA engine (the row no longer
    tests a Pallas artifact -> FAIL); ``replanned`` = the one tightened-
    budget replan fired but a Pallas kernel still ran (informational —
    the numerics below DID gate that kernel)."""
    from gcm_filters_tpu.utils import telemetry

    counts = telemetry.fallback_counts()
    out = {"fell_back": bool(counts.get("pallas_compile_fallback"))}
    if counts.get("pallas_replan_retry"):
        out["replanned"] = True
    return out

def _cases():
    """(name, grid_type, shape) for every grid type + the odd-shape case."""
    from gcm_filters_tpu import GridType as G

    scalar = [
        G.REGULAR,
        G.REGULAR_AREA_WEIGHTED,
        G.REGULAR_WITH_LAND,
        G.REGULAR_WITH_LAND_AREA_WEIGHTED,
        G.IRREGULAR_WITH_LAND,
        G.MOM5U,
        G.MOM5T,
        G.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
        G.TRIPOLAR_POP_WITH_LAND,
    ]
    cases = [(g.name, g, (NY, NX)) for g in scalar]
    cases.append(("REGULAR_WITH_LAND_odd_shape", G.REGULAR_WITH_LAND,
                  (ODD_NY, ODD_NX)))
    cases += [(g.name, g, (NY, NX))
              for g in (G.VECTOR_C_GRID, G.VECTOR_B_GRID)]
    # vector odd shapes (VERDICT r3 item #7): odd width selects the coupled
    # kernels' lane-extension (tail-wrap) artifact on chip; odd ny has no
    # plannable block split, gating the vector XLA fallback numerics
    cases.append(("VECTOR_C_GRID_odd_width", G.VECTOR_C_GRID, (NY, 500)))
    cases.append(("VECTOR_B_GRID_odd_shape", G.VECTOR_B_GRID, (ODD_NY, 500)))
    return cases


def _filter_kw():
    # dx_min=1.0 satisfies every grid incl. the area-weighted fixed-factor
    # family (which REQUIRES 1.0)
    return dict(FILTER_KW, dx_min=1.0)


def _make_vector_inputs(grid_type, shape):
    """Deterministic vector-grid inputs with O(1) metrics.

    The test-suite spherical geometry has ~6e6 m spacings, which makes the
    dimensional Laplacian term ~1e-13 of the field — below f32 resolution,
    so a chip-level f32 comparison would be numerically vacuous. Here the
    metrics are unit-scale (like the scalar irregular grids) so the
    operator genuinely shapes the output at f32-visible magnitude.
    """
    from gcm_filters_tpu.models.grids import GRID_VAR_NAMES

    ny, nx = shape
    rng = np.random.default_rng(123)
    grid_vars = {}
    for name in GRID_VAR_NAMES[grid_type]:
        if name in ("wet_mask_t", "wet_mask_q"):
            m = np.ones((ny, nx))
            m[: ny // 4, : nx // 4] = 0
            grid_vars[name] = m
        elif "kappa" in name:
            grid_vars[name] = np.ones((ny, nx))
        elif "AREA" in name or "area" in name.lower():
            grid_vars[name] = 0.9 + 0.2 * rng.random((ny, nx))
        else:
            grid_vars[name] = 0.9 + 0.2 * rng.random((ny, nx))
    u = rng.random((ny, nx))
    v = rng.random((ny, nx))
    return (u, v), grid_vars


PROD_NY, PROD_NX = 2400, 3600


def _prod_cases():
    """Production-shape cases: (name, grid_type, filter_kwargs).

    These select exactly the compiled artifacts the benchmarks run
    (benchmarks/bench_suite.py configs at 2400x3600): the single-pass br=48
    scalar + const-embed path, the Taper multi-pass split, the two vector
    kernels, and the >_CONST_EMBED_LIMIT runtime-argument path (IRREGULAR
    streams ~6 extended coefficient arrays at ~55 MB each).
    """
    from gcm_filters_tpu import FilterShape, GridType as G

    return [
        ("prod_tripolar_gaussian",
         G.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
         dict(filter_scale=10.0, dx_min=1.0)),
        ("prod_tripolar_taper39",
         G.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
         dict(filter_scale=10.0, dx_min=1.0,
              filter_shape=FilterShape.TAPER)),
        ("prod_irregular_runtime_args", G.IRREGULAR_WITH_LAND,
         dict(filter_scale=10.0, dx_min=1.0)),
        ("prod_vector_c", G.VECTOR_C_GRID,
         dict(filter_scale=10.0, dx_min=1.0)),
        ("prod_vector_b", G.VECTOR_B_GRID,
         dict(filter_scale=10.0, dx_min=1.0)),
    ]


def _make_prod_scalar_inputs(grid_type):
    """Deterministic 2400x3600 scalar inputs (the bench.py construction for
    the tripolar headline; unit-scale irregular metrics like the test
    fixtures). f32-valued so chip and golden phases consume identical bits."""
    from gcm_filters_tpu.models.grids import GRID_VAR_NAMES

    ny, nx = PROD_NY, PROD_NX
    rng = np.random.default_rng(42)
    wet = np.ones((ny, nx))
    wet[0, :] = 0  # Antarctica
    wet[: ny // 6, : nx // 5] = 0  # idealized continent
    area = (0.9 + 0.2 * rng.random((ny, nx))).astype(np.float32)
    grid_vars = {}
    for name in GRID_VAR_NAMES[grid_type]:
        if name == "wet_mask":
            grid_vars[name] = wet
        elif name == "area":
            grid_vars[name] = area.astype(np.float64)
        elif "kappa" in name:
            grid_vars[name] = np.ones((ny, nx))
        else:  # dxw/dyw/dxs/dys metrics
            grid_vars[name] = (
                0.9 + 0.2 * rng.random((ny, nx))
            ).astype(np.float32).astype(np.float64)
    data = rng.random((ny, nx)).astype(np.float32)
    return data, grid_vars


def _make_prod_inputs(name, grid_type):
    from gcm_filters_tpu.models.grids import is_vector_grid

    if is_vector_grid(grid_type):
        (u, v), gv = _make_vector_inputs(grid_type, (PROD_NY, PROD_NX))
        # snap fields AND metrics to f32-representable values so the chip
        # phase (dtype=f32) and the f64 golden consume identical bits —
        # mirrors _make_prod_scalar_inputs (review finding: raw f64 inputs
        # added input-cast noise amplified over n_steps to the comparison)
        snap = lambda a: np.asarray(a, np.float32).astype(np.float64)
        return (snap(u), snap(v)), {k: snap(a) for k, a in gv.items()}
    return _make_prod_scalar_inputs(grid_type)


def phase_golden_prod():
    """CPU float64 goldens for the production cases -> GOLDEN_PROD_PATH.

    Only the f32-cast goldens are stored (inputs regenerate from seeds);
    the f32 cast costs ~1e-7 relative against the 1e-5 gate.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from gcm_filters_tpu import Filter
    from gcm_filters_tpu.models.grids import is_vector_grid

    store = {}
    for name, grid_type, kw in _prod_cases():
        if is_vector_grid(grid_type):
            (u, v), grid_vars = _make_prod_inputs(name, grid_type)
            filt = Filter(grid_type=grid_type, grid_vars=grid_vars,
                          use_pallas=False, **kw)
            gu, gv = filt.apply_to_vector(u.astype(np.float64),
                                          v.astype(np.float64))
            store[f"{name}/golden_u"] = np.asarray(gu, np.float32)
            store[f"{name}/golden_v"] = np.asarray(gv, np.float32)
        else:
            data, grid_vars = _make_prod_inputs(name, grid_type)
            filt = Filter(grid_type=grid_type, grid_vars=grid_vars,
                          use_pallas=False, **kw)
            golden = filt.apply(data.astype(np.float64))
            store[f"{name}/golden"] = np.asarray(golden, np.float32)
        store[f"{name}/n_steps"] = np.int64(filt.n_steps)
        print(f"  golden {name}: n_steps={filt.n_steps}", flush=True)
    np.savez(GOLDEN_PROD_PATH, **store)
    print(f"production golden phase -> {GOLDEN_PROD_PATH}")


def phase_golden():
    """CPU float64 phase: build deterministic inputs (f32-valued, so the
    chip consumes bit-identical data) and XLA-engine f64 goldens."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    import conftest  # reference-seeded grid constructions

    from gcm_filters_tpu import Filter
    from gcm_filters_tpu.models.grids import is_vector_grid

    store = {}
    for name, grid_type, shape in _cases():
        if is_vector_grid(grid_type):
            (u, v), grid_vars = _make_vector_inputs(grid_type, shape)
            u32 = u.astype(np.float32)
            v32 = v.astype(np.float32)
            filt = Filter(grid_type=grid_type, grid_vars=grid_vars,
                          use_pallas=False, **_filter_kw())
            gu, gv = filt.apply_to_vector(u32.astype(np.float64),
                                          v32.astype(np.float64))
            store[f"{name}/u"] = u32
            store[f"{name}/v"] = v32
            store[f"{name}/golden_u"] = np.asarray(gu)
            store[f"{name}/golden_v"] = np.asarray(gv)
        else:
            _, data, grid_vars = conftest.make_scalar_grid_data(
                grid_type, shape)
            d32 = data.astype(np.float32)
            filt = Filter(grid_type=grid_type, grid_vars=grid_vars,
                          use_pallas=False, **_filter_kw())
            golden = filt.apply(d32.astype(np.float64))
            store[f"{name}/x"] = d32
            store[f"{name}/golden"] = np.asarray(golden)
        for k, v in grid_vars.items():
            store[f"{name}/gv/{k}"] = np.asarray(v)
        store[f"{name}/n_steps"] = np.int64(filt.n_steps)
    np.savez_compressed(GOLDEN_PATH, **store)
    print(f"golden phase: {len(_cases())} cases -> {GOLDEN_PATH}")


def _norm_max_err(got, want):
    scale = float(np.max(np.abs(want))) or 1.0
    return float(np.max(np.abs(np.asarray(got, np.float64) - want))) / scale


def phase_tpu(quick=False, dma=False):
    import jax
    import jax.numpy as jnp

    from gcm_filters_tpu import Filter
    from gcm_filters_tpu.models.grids import is_vector_grid
    from gcm_filters_tpu.utils import telemetry

    out_path = OUT_PATH
    if dma:
        # gate the manual-DMA window kernels (benchmarks/sweep_dma.py's
        # subject) with the same case set before any default flip
        import gcm_filters_tpu.ops.pallas.cheb_pass as _cp

        _cp._DMA_WINDOWS = True
        out_path = OUT_PATH.replace(".json", "_DMA.json")

    platform = jax.devices()[0].platform
    z = np.load(GOLDEN_PATH)
    results = {}
    ok_all = True

    def record(name, entry):
        nonlocal ok_all
        entry["pass"] = all(
            v < TOL for k, v in entry.items()
            if isinstance(v, float)
        ) and not entry.get("fell_back", False)
        ok_all &= entry["pass"]
        results[name] = entry
        status = "ok " if entry["pass"] else "FAIL"
        errs = {k: f"{v:.2e}" for k, v in entry.items() if isinstance(v, float)}
        print(f"  {status} {name}: {errs}"
              + ("  [FELL BACK TO XLA]" if entry.get("fell_back") else "")
              + ("  [replanned]" if entry.get("replanned") else ""))

    for name, grid_type, shape in _cases():
        grid_vars = {
            k.split("/", 2)[2]: z[k]
            for k in z.files if k.startswith(f"{name}/gv/")
        }
        kw = _filter_kw()
        telemetry.reset_fallback_counts()
        if is_vector_grid(grid_type):
            u = jnp.asarray(z[f"{name}/u"])
            v = jnp.asarray(z[f"{name}/v"])
            f_pl = Filter(grid_type=grid_type, grid_vars=grid_vars,
                          dtype=jnp.float32, use_pallas=True, **kw)
            f_xla = Filter(grid_type=grid_type, grid_vars=grid_vars,
                           dtype=jnp.float32, use_pallas=False, **kw)
            pu, pv = f_pl.apply_to_vector(u, v)
            xu, xv = f_xla.apply_to_vector(u, v)
            # on-chip comparison first (scalar readback), then one transfer
            on_chip = float(jnp.max(jnp.maximum(jnp.abs(pu - xu),
                                                jnp.abs(pv - xv))))
            gu, gv_ = z[f"{name}/golden_u"], z[f"{name}/golden_v"]
            scale = float(max(np.max(np.abs(gu)), np.max(np.abs(gv_)))) or 1.0
            record(name, {
                "pallas_vs_xla_onchip": on_chip / scale,
                "pallas_vs_f64_golden": max(_norm_max_err(pu, gu),
                                            _norm_max_err(pv, gv_)),
                "xla_vs_f64_golden": max(_norm_max_err(xu, gu),
                                         _norm_max_err(xv, gv_)),
                **_fallback_keys(),
            })
        else:
            x = jnp.asarray(z[f"{name}/x"])
            f_pl = Filter(grid_type=grid_type, grid_vars=grid_vars,
                          dtype=jnp.float32, use_pallas=True, **kw)
            f_xla = Filter(grid_type=grid_type, grid_vars=grid_vars,
                           dtype=jnp.float32, use_pallas=False, **kw)
            p = f_pl.apply(x)
            q = f_xla.apply(x)
            on_chip = float(jnp.nanmax(jnp.abs(p - q)))
            golden = z[f"{name}/golden"]
            wet = grid_vars.get("wet_mask")
            if wet is not None:
                # land NaN conventions may differ between builds; gate wet cells
                m = np.asarray(wet) > 0
            else:
                m = np.ones(golden.shape, bool)
            scale = float(np.max(np.abs(golden[m]))) or 1.0
            p_h, q_h = np.asarray(p), np.asarray(q)
            record(name, {
                "pallas_vs_xla_onchip": on_chip / scale,
                "pallas_vs_f64_golden":
                    float(np.max(np.abs(p_h[m] - golden[m]))) / scale,
                "xla_vs_f64_golden":
                    float(np.max(np.abs(q_h[m] - golden[m]))) / scale,
                **_fallback_keys(),
            })

    # sharded-on-a-1x1-mesh gate: the shard_map + local-Pallas production
    # path, on the real chip, vs the same goldens
    from jax.sharding import Mesh
    from gcm_filters_tpu import GridType as G

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
    telemetry.reset_fallback_counts()
    name = "TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED"
    grid_vars = {k.split("/", 2)[2]: z[k]
                 for k in z.files if k.startswith(f"{name}/gv/")}
    fs = Filter(grid_type=G.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
                grid_vars=grid_vars, dtype=jnp.float32, mesh=mesh,
                spatial_axes=("y", "x"), **_filter_kw())
    out = np.asarray(fs.apply(jnp.asarray(z[f"{name}/x"])))
    golden = z[f"{name}/golden"]
    m = np.asarray(grid_vars["wet_mask"]) > 0
    scale = float(np.max(np.abs(golden[m]))) or 1.0
    record("sharded_1x1_scalar", {
        "sharded_vs_f64_golden":
            float(np.max(np.abs(out[m] - golden[m]))) / scale,
        **_fallback_keys(),
    })

    name = "VECTOR_B_GRID"
    grid_vars = {k.split("/", 2)[2]: z[k]
                 for k in z.files if k.startswith(f"{name}/gv/")}
    telemetry.reset_fallback_counts()
    fv = Filter(grid_type=G.VECTOR_B_GRID, grid_vars=grid_vars,
                dtype=jnp.float32, mesh=mesh, spatial_axes=("y", "x"),
                **_filter_kw())
    su, sv = fv.apply_to_vector(jnp.asarray(z[f"{name}/u"]),
                                jnp.asarray(z[f"{name}/v"]))
    gu, gv_ = z[f"{name}/golden_u"], z[f"{name}/golden_v"]
    record("sharded_1x1_vector", {
        "sharded_vs_f64_golden": max(_norm_max_err(su, gu),
                                     _norm_max_err(sv, gv_)),
        **_fallback_keys(),
    })

    # ---- production-shape cases (2400x3600): the exact compiled artifacts
    # the benchmarks advertise, vs f32-cast f64 goldens, reduced on-chip.
    if not quick:
        from gcm_filters_tpu.models.grids import is_vector_grid

        zp = np.load(GOLDEN_PROD_PATH)
        for name, grid_type, kw in _prod_cases():
            telemetry.reset_fallback_counts()
            try:
                entry = {}
                if is_vector_grid(grid_type):
                    (u, v), grid_vars = _make_prod_inputs(name, grid_type)
                    f_pl = Filter(grid_type=grid_type, grid_vars=grid_vars,
                                  dtype=jnp.float32, use_pallas=True, **kw)
                    assert f_pl.n_steps == int(zp[f"{name}/n_steps"])
                    pu, pv = f_pl.apply_to_vector(jnp.asarray(u),
                                                  jnp.asarray(v))
                    gu = jnp.asarray(zp[f"{name}/golden_u"])
                    gv_ = jnp.asarray(zp[f"{name}/golden_v"])
                    scale = float(jnp.maximum(jnp.max(jnp.abs(gu)),
                                              jnp.max(jnp.abs(gv_)))) or 1.0
                    err = float(jnp.maximum(jnp.max(jnp.abs(pu - gu)),
                                            jnp.max(jnp.abs(pv - gv_))))
                    entry["pallas_vs_f64_golden"] = err / scale
                else:
                    data, grid_vars = _make_prod_inputs(name, grid_type)
                    f_pl = Filter(grid_type=grid_type, grid_vars=grid_vars,
                                  dtype=jnp.float32, use_pallas=True, **kw)
                    assert f_pl.n_steps == int(zp[f"{name}/n_steps"])
                    p = f_pl.apply(jnp.asarray(data))
                    g = jnp.asarray(zp[f"{name}/golden"])
                    wet = grid_vars.get("wet_mask")
                    m = (jnp.asarray(np.asarray(wet) > 0) if wet is not None
                         else jnp.ones(g.shape, bool))
                    scale = float(jnp.max(jnp.where(m, jnp.abs(g), 0))) or 1.0
                    err = float(jnp.max(jnp.where(m, jnp.abs(p - g), 0)))
                    entry["pallas_vs_f64_golden"] = err / scale
                entry["n_steps"] = int(zp[f"{name}/n_steps"])
                entry.update(_fallback_keys())
                record(name, entry)
            except Exception as e:  # compile/transport failure is a FAIL row
                ok_all = False
                results[name] = {"pass": False, "error": repr(e)[:300]}
                print(f"  FAIL {name}: {e!r}")

    report = {
        "platform": platform,
        "tolerance": TOL,
        "shape": [NY, NX],
        "prod_shape": None if quick else [PROD_NY, PROD_NX],
        "ok": ok_all,
        "cases": results,
    }
    if dma:
        report["dma_windows"] = True
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"{'OK' if ok_all else 'FAILED'}: {len(results)} cases "
          f"on {platform} -> {out_path}")
    return 0 if ok_all else 1


def main():
    if "--golden" in sys.argv:
        phase_golden()
        return 0
    if "--golden-prod" in sys.argv:
        phase_golden_prod()
        return 0
    quick = "--quick" in sys.argv
    if not os.path.exists(GOLDEN_PATH):
        print("golden file missing; computing on CPU (subprocess)...")
        subprocess.run([sys.executable, __file__, "--golden"], check=True)
    if not quick and not os.path.exists(GOLDEN_PROD_PATH):
        print("production golden file missing; computing on CPU "
              "(subprocess, several minutes)...")
        subprocess.run([sys.executable, __file__, "--golden-prod"],
                       check=True)
    return phase_tpu(quick=quick, dma="--dma" in sys.argv)


if __name__ == "__main__":
    sys.exit(main())
