"""True multi-process distributed execution test.

Spawns two OS processes, each with 4 virtual CPU devices, connected through
jax.distributed (gloo collectives over TCP — the functional analogue of
multi-host DCN on a TPU pod). A 2x4 global mesh shards the domain across the
process boundary — including the tripolar fold seam — and results must match
single-process unsharded execution to roundoff for both local-compute paths
and the vector operator. This is the multi-host story the reference lacks
entirely (SURVEY.md §2.3), exercised for real rather than only on a
single-process virtual mesh.
"""
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=%%d" %% (8 // nproc)
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(f"localhost:{port}", nproc, pid)
    sys.path.insert(0, %(repo)r)
    import numpy as np, warnings
    warnings.filterwarnings("ignore")
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
    from jax.experimental import multihost_utils
    import gcm_filters_tpu as gf

    assert jax.device_count() == 8 and jax.process_count() == nproc

    ny, nx = 64, 128
    rng = np.random.default_rng(0)
    wet = np.ones((ny, nx)); wet[0] = 0
    area = 0.9 + 0.2 * rng.random((ny, nx))
    data = rng.random((ny, nx))
    u = rng.random((ny, nx)); v = rng.random((ny, nx))
    m = 0.9 + 0.2 * rng.random((ny, nx))

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("y", "x"))
    sharding = NamedSharding(mesh, P("y", "x"))
    mk = lambda a: jax.make_array_from_callback(a.shape, sharding,
                                                lambda idx: a[idx])
    kw = dict(filter_scale=6.0, dx_min=1.0,
              grid_type=gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
              grid_vars={"area": area, "wet_mask": wet})
    for up in (False, True):
        filt = gf.Filter(**kw, mesh=mesh, spatial_axes=("y", "x"),
                         use_pallas=up)
        full = multihost_utils.process_allgather(filt.apply(mk(data)),
                                                 tiled=True)
        if pid == 0:
            want = np.asarray(gf.Filter(**kw).apply(data))
            err = float(np.abs(np.asarray(full) - want).max())
            print(f"SCALAR_PALLAS{up}_MAXERR {err}", flush=True)

    bgv = dict(DXU=m, DYU=1 + 0.1 * m, HUS=m, HUW=m, HTE=1 + 0.05 * m,
               HTN=m, UAREA=m * m, TAREA=m * m)
    vkw = dict(filter_scale=6.0, dx_min=1.0,
               grid_type=gf.GridType.VECTOR_B_GRID, grid_vars=bgv)
    vfilt = gf.Filter(**vkw, mesh=mesh, spatial_axes=("y", "x"))
    fu, fv = vfilt.apply_to_vector(mk(u), mk(v))
    fu = multihost_utils.process_allgather(fu, tiled=True)
    fv = multihost_utils.process_allgather(fv, tiled=True)
    if pid == 0:
        base = gf.Filter(**vkw)
        wu, wv = (np.asarray(a) for a in base.apply_to_vector(u, v))
        err = float(max(np.abs(np.asarray(fu) - wu).max(),
                        np.abs(np.asarray(fv) - wv).max()))
        print(f"VECTOR_MAXERR {err}", flush=True)
    """
)


@pytest.mark.parametrize("nproc,port", [(2, "29531"), (4, "29532")])
def test_multi_process_distributed_matches_unsharded(tmp_path, nproc, port):
    """nproc=2: the y axis crosses the process boundary. nproc=4 (2 devices
    per process): the mesh's x axis — and with it the tripolar fold's
    reversed pairing permute — crosses process boundaries too."""
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER % {"repo": repo})
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(nproc), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(nproc)
    ]
    try:
        outs = [p.communicate(timeout=420)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out")
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    out0 = outs[0]
    errs = {
        line.split()[0]: float(line.split()[1])
        for line in out0.splitlines()
        if "_MAXERR" in line
    }
    assert set(errs) == {"SCALAR_PALLASFalse_MAXERR", "SCALAR_PALLASTrue_MAXERR",
                         "VECTOR_MAXERR"}, out0[-3000:]
    for name, err in errs.items():
        assert err < 1e-11, (name, err)


_RING_WORKER = textwrap.dedent(
    """
    import os, sys
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=%%d" %% (8 // nproc)
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(f"localhost:{port}", nproc, pid)
    sys.path.insert(0, %(repo)r)
    import numpy as np, warnings
    warnings.filterwarnings("ignore")
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
    from jax.experimental import multihost_utils
    import gcm_filters_tpu as gf
    import gcm_filters_tpu.parallel.ring as ring_mod

    assert jax.device_count() == 8 and jax.process_count() == nproc

    ny, nx = 256, 128
    rng = np.random.default_rng(0)
    wet = np.ones((ny, nx)); wet[0] = 0
    area = 0.9 + 0.2 * rng.random((ny, nx))
    data = rng.random((ny, nx)).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("y", "x"))
    sharding = NamedSharding(mesh, P("y", "x"))
    mk = lambda a: jax.make_array_from_callback(a.shape, sharding,
                                                lambda idx: a[idx])
    kw = dict(filter_scale=6.0, dx_min=1.0,
              grid_type=gf.GridType.TRIPOLAR_REGULAR_WITH_LAND_AREA_WEIGHTED,
              grid_vars={"area": area, "wet_mask": wet})
    filt = gf.Filter(**kw)
    rf = ring_mod.make_ring_scalar_apply(
        filt.operator, filt.filter_spec, mesh, ("y", "x"))
    assert rf is not None
    out = rf(mk(data))
    assert out is not None, "ring shape-ineligible"
    full = multihost_utils.process_allgather(out, tiled=True)
    if pid == 0:
        from gcm_filters_tpu.ops.pallas import make_pallas_scalar_apply
        import gcm_filters_tpu.ops.pallas.cheb_pass as cpm
        cpm._PACK_COEF = False  # layout-match the (unpacked) ring kernels
        want = np.asarray(make_pallas_scalar_apply(
            filt.operator, filt.filter_spec)(np.asarray(data)))
        err = float(np.abs(np.asarray(full) - want).max())
        print(f"RING_MAXERR {err}", flush=True)
    """
)


def test_multi_process_ring_halo_exchange_bitwise(tmp_path):
    """The in-kernel ring halo exchange crosses a REAL process boundary:
    8 devices over 2 OS processes (gloo/TCP) on a y-only mesh, tripolar
    fold included. The remote halo copies' interpret-mode discharge rides
    the same distributed collectives, and the result must stay BITWISE
    equal to the unsharded Pallas kernel — the strongest cross-host claim
    the round-based engine's roundoff tests cannot make."""
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    worker = tmp_path / "ring_worker.py"
    worker.write_text(_RING_WORKER % {"repo": repo})
    nproc, port = 2, "29533"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(nproc), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(nproc)
    ]
    try:
        outs = [p.communicate(timeout=420)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("ring multi-process workers timed out")
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    errs = [float(line.split()[1]) for line in outs[0].splitlines()
            if "RING_MAXERR" in line]
    assert errs, outs[0][-3000:]
    assert errs[0] == 0.0, errs
