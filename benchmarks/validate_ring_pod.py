"""Ring halo-exchange validation + A/B for a real multi-chip TPU slice.

This environment tunnels ONE chip, so the in-kernel ring path
(parallel/ring.py) ships pod-ready but off-by-default on real TPU
(`_RING` auto = off; interpret-mode and cross-process validation only —
see tests/test_ring.py, tests/test_multihost.py). The moment a multi-chip
slice is reachable, this script is the one-command gate:

  1. numerical: ring result vs the single-device Pallas kernel (bitwise
     expected) and vs the round-based sharded engine, on a y-only mesh;
  2. perf A/B: chained sharded applies, ring vs round-based, same mesh.

Run on the pod:  GCM_FILTERS_TPU_RING=1 python benchmarks/validate_ring_pod.py
Writes benchmarks/ring_pod.json. If it passes and wins, flip ring.py's
`_RING` auto-default for TPU and record the numbers in README.md.
"""
import json
import os
import sys

import numpy as np

if "--small" in sys.argv:
    # CPU smoke: the env-prefix form does NOT override the axon plugin —
    # force the backend in-process before any JAX use (CLAUDE.md), with
    # 8 virtual devices
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax

if "--small" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import gcm_filters_tpu as gf
import gcm_filters_tpu.parallel.ring as ring_mod


from bench import _timed_chain as chain  # one timing protocol everywhere


def main():
    devs = jax.devices()
    n = len(devs)
    if n < 2:
        print(json.dumps({"error": f"need >=2 devices, found {n}"}))
        return 1
    mesh = Mesh(np.array(devs).reshape(n, 1), ("y", "x"))
    # ring eligibility needs the per-shard rows ly = ny/n to admit an
    # 8-multiple block height with >= 2 blocks (2400/8 = 300 does NOT: no
    # 8-multiple divides 300) — fall back to a tiling-friendly height
    # close to the headline's
    if "--small" in sys.argv:
        # CPU smoke: interpret-mode compute at production size exceeds
        # XLA:CPU's 40 s collective-rendezvous timeout
        candidates, nx = [96 * n], 256
    else:
        candidates = [2400] if 2400 % n == 0 else []
        candidates.append(480 * n if 480 * n <= 3840 else 96 * n)
        nx = 3600
    rng = np.random.default_rng(42)
    out = {"devices": n}
    sharding = NamedSharding(mesh, P("y", "x"))
    got = None
    for ny in candidates:
        wet = np.ones((ny, nx)); wet[0, :] = 0
        kw = dict(
            filter_scale=10.0, dx_min=1.0,
            grid_type=gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
            grid_vars={"area": 0.9 + 0.2 * rng.random((ny, nx)),
                       "wet_mask": wet},
            dtype=jnp.float32)
        data = rng.random((ny, nx)).astype(np.float32)
        xs = jax.device_put(jnp.asarray(data), sharding)
        filt = gf.Filter(**kw, mesh=mesh, spatial_axes=("y", "x"),
                         use_pallas=True)
        rf = ring_mod.make_ring_scalar_apply(
            filt.operator, filt.filter_spec, mesh, ("y", "x"))
        res = rf(xs) if rf is not None else None
        if res is not None:
            got = np.asarray(res)
            break
    out["shape"] = [ny, nx]
    if got is None:
        out["error"] = "ring ineligible for every candidate shape"
        print(json.dumps(out)); return 1

    # 1. numerical gate — the unsharded reference must use the ring
    # kernels' UNPACKED coefficient layout for the bitwise claim (the
    # packed production layout is value-identical but FMA-contracts
    # differently at the last bit; see tests/test_ring._unpacked_layout)
    import gcm_filters_tpu.ops.pallas.cheb_pass as cpm

    cpm._PACK_COEF = False
    try:
        base = gf.Filter(**kw, use_pallas=True)
        want = np.asarray(base.apply(data))
    finally:
        cpm._PACK_COEF = True
    fin = np.isfinite(want)
    out["max_abs_err_vs_unsharded_pallas"] = float(
        np.max(np.abs(got[fin] - want[fin])))
    out["bitwise"] = bool((got[fin] == want[fin]).all())

    # round-based comparison on the same mesh (force ring off)
    ring_mod._RING = False
    filt_rounds = gf.Filter(**kw, mesh=mesh, spatial_axes=("y", "x"),
                            use_pallas=True)
    got_r = np.asarray(filt_rounds.apply(xs))
    out["max_abs_err_vs_rounds"] = float(np.max(np.abs(got[fin] - got_r[fin])))
    ring_mod._RING = True

    # 2. perf A/B (chained applies; see bench.py for the timing protocol)
    n_chain = 3 if "--small" in sys.argv else 201
    ring_apply = lambda x: rf(x)
    ring_apply(xs)  # warm
    t1 = chain(ring_apply, xs, 1)
    tn = chain(ring_apply, xs, n_chain)
    out["ms_ring"] = round((tn - t1) / (n_chain - 1) * 1e3, 3)
    rounds_fn = filt_rounds._scalar_fn()
    rounds_fn(xs)
    t1 = chain(rounds_fn, xs, 1)
    tn = chain(rounds_fn, xs, n_chain)
    out["ms_rounds"] = round((tn - t1) / (n_chain - 1) * 1e3, 3)
    out["speedup_ring_vs_rounds"] = round(out["ms_rounds"] / out["ms_ring"], 3)

    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "ring_pod.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    return 0 if out["max_abs_err_vs_unsharded_pallas"] < 1e-5 else 1


if __name__ == "__main__":
    sys.exit(main())
