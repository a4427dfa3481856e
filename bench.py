"""Headline benchmark: the reference's GPU-tutorial workload, TPU-native.

Workload (BASELINE.md row 1-2): 0.1-degree POP-style tripolar SST field,
2400x3600 float32, TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED grid, Gaussian
fixed factor 10 (auto n_steps = 11). Reference wall times: 5.21 s CPU /
4.5 s GPU, i.e. ~18M / ~21M grid-point-steps per second.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "grid-point-steps/s", "vs_baseline": N}
where vs_baseline is relative to the reference's better (GPU) number.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


BASELINE_GPS = 2400 * 3600 * 11 / 4.5  # reference GPU throughput ~21.1M


def build_filter(ny=2400, nx=3600, use_pallas=None):
    from gcm_filters_tpu import Filter, GridType

    rng = np.random.default_rng(42)
    wet = np.ones((ny, nx), np.float64)
    wet[0, :] = 0  # Antarctica
    wet[: ny // 6, : nx // 5] = 0  # an idealized continent
    area = 0.9 + 0.2 * rng.random((ny, nx))

    filt = Filter(
        filter_scale=10.0,
        dx_min=1.0,
        grid_type=GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
        grid_vars={"area": area, "wet_mask": wet},
        dtype=jnp.float32,
        use_pallas=use_pallas,
    )
    data = rng.random((ny, nx)).astype(np.float32)
    return filt, data


def _timed_chain(fn, x, n):
    """Time n chained filter applications ending in a 4-byte readback.

    Chaining + scalar readback defeats async dispatch (on the tunneled axon
    backend, block_until_ready returns before execution finishes, and full
    array transfers are network-bound — so neither is usable for timing).
    """
    t0 = time.perf_counter()
    y = x
    for _ in range(n):
        y = fn(y)
    float(jnp.nanmean(y[1:]))  # forces completion; row 0 is land (NaN-free anyway)
    return time.perf_counter() - t0


def main():
    ny, nx = 2400, 3600
    filt, data = build_filter(ny, nx)
    fn = filt._scalar_fn()
    x = jnp.asarray(data)

    # Protocol (hardened round 3): a single chained measurement must contain
    # >=0.5 s of device work so tunnel round-trip jitter (+-10-20 ms) is <5%
    # of the signal; 5 repeats of (1-chain, N-chain) pairs differenced to
    # cancel dispatch+readback overhead; report both min (best sustained) and
    # median (typical capture) so one driver run is trustworthy to ~2-3%.
    n_chain, repeats = 601, 5
    _timed_chain(fn, x, 1)  # warmup / compile
    pairs = []
    for _ in range(repeats):
        t1 = _timed_chain(fn, x, 1)
        tn = _timed_chain(fn, x, n_chain)
        pairs.append((tn - t1) / (n_chain - 1))
    dt_min = min(pairs)
    dt_med = sorted(pairs)[len(pairs) // 2]

    work = ny * nx * filt.n_steps
    gps = work / dt_min
    print(
        json.dumps(
            {
                "metric": "tripolar_gaussian_fac10_2400x3600_f32_gridpoint_steps_per_s",
                "value": round(gps),
                "unit": "grid-point-steps/s",
                "vs_baseline": round(gps / BASELINE_GPS, 2),
                "value_median": round(work / dt_med),
                "repeats": repeats,
                "chain": n_chain,
            }
        )
    )


if __name__ == "__main__":
    main()
