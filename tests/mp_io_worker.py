"""Worker for the genuine multi-process distributed-IO test.

Launched (twice) by tests/test_multiprocess_io.py. Each process owns 4 local
CPU devices of a global 8-device mesh (gloo collectives), mirroring a 2-host
TPU pod slice: no process can address the other's shards, so the per-process
tile write / overlap-read reload paths are exercised for real — unlike the
single-process 8-device tests, where every shard is addressable everywhere.

Reference counterpart: per-PE fileset IO + mppnccombine
(src/shared/mpp/mpp_io.F90; postprocessing/mppnccombine.c).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    .replace("--xla_force_host_platform_device_count=8", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

PID = int(sys.argv[1])
PORT = sys.argv[2]
WORKDIR = sys.argv[3]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    f"localhost:{PORT}", num_processes=2, process_id=PID,
    local_device_ids=list(range(4)),
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from isca_tpu.parallel.mesh import make_mesh, shard_pytree  # noqa: E402
from isca_tpu.io import distributed as dio  # noqa: E402


def main():
    assert jax.process_count() == 2
    assert jax.local_device_count() == 4
    mesh = make_mesh(8)

    # A restart-shaped pytree: lat-sharded grid fields (both leapfrog
    # levels), an m-sharded complex spectral field, and a replicated scalar.
    rng = np.random.default_rng(7)
    L, nlat, nlon, M = 3, 8, 16, 48
    host = {
        "tg_prev": rng.standard_normal((L, nlat, nlon)),
        "tg_curr": rng.standard_normal((L, nlat, nlon)),
        "ts_curr": (rng.standard_normal((L, M, 20))
                    + 1j * rng.standard_normal((L, M, 20))),
        "time_seconds": np.float64(86400.0),
    }
    state = jax.tree_util.tree_map(jnp.asarray, host)
    state = shard_pytree(mesh, state, nlat=nlat)

    # grid fields must be lat-sharded, spectral m-sharded, scalar replicated
    assert len(state["tg_curr"].sharding.device_set) == 8
    assert len(state["ts_curr"].sharding.device_set) == 8
    assert not state["tg_curr"].is_fully_replicated
    assert not state["ts_curr"].is_fully_replicated
    assert state["time_seconds"].is_fully_replicated

    tiledir = os.path.join(WORKDIR, "tiles")
    dio.save_restart_sharded(tiledir, state)
    multihost_utils.sync_global_devices("tiles_written")

    # this process's tile must contain ONLY its local lat rows
    tile = np.load(os.path.join(tiledir, f"tile{PID:04d}.npz"),
                   allow_pickle=False)
    import json
    index = json.loads(str(tile["_index"]))
    my_rows = sorted(
        s["slices"][1][0]
        for e in index if e["path"] == "['tg_curr']"
        for s in e["shards"]
    )
    other = np.load(os.path.join(tiledir, f"tile{1 - PID:04d}.npz"),
                    allow_pickle=False)
    other_rows = sorted(
        s["slices"][1][0]
        for e in json.loads(str(other["_index"])) if e["path"] == "['tg_curr']"
        for s in e["shards"]
    )
    assert len(my_rows) == 4 and len(other_rows) == 4
    assert not set(my_rows) & set(other_rows), (my_rows, other_rows)
    assert sorted(my_rows + other_rows) == list(range(nlat))

    # reload: each process reads only tiles overlapping its shards; round
    # trip must be bit-exact on every local shard
    loaded = dio.load_restart_sharded(tiledir, state)
    for key in host:
        a, b = state[key], loaded[key]
        for sa, sb in zip(a.addressable_shards, b.addressable_shards):
            np.testing.assert_array_equal(np.asarray(sa.data),
                                          np.asarray(sb.data))

    # a global reduction over the reloaded state must match the host value
    total = float(jax.jit(lambda s: s["tg_curr"].sum())(loaded))
    np.testing.assert_allclose(total, host["tg_curr"].sum(), rtol=1e-12)

    multihost_utils.sync_global_devices("verified")
    if PID == 0:
        out = os.path.join(WORKDIR, "combined.npz")
        dio.combine_restart_tiles(tiledir, out)
        data = np.load(out, allow_pickle=False)
        import json as _json
        paths = _json.loads(str(data["_paths"]))
        for i, p in enumerate(paths):
            key = p.strip("[]'\"").replace("']['", "/")
            np.testing.assert_array_equal(data[f"leaf_{i}"], host[key])

    # diagnostics tiles: sharded field + replicated field, one record
    w = dio.DiagTileWriter(os.path.join(WORKDIR, "diag"))
    w.write(0, {"temp": state["tg_curr"], "solar": state["time_seconds"]})
    multihost_utils.sync_global_devices("diag_written")
    if PID == 0:
        fields = dio.combine_diag_tiles(os.path.join(WORKDIR, "diag"), 0)
        np.testing.assert_array_equal(fields["temp"], host["tg_curr"])
        np.testing.assert_allclose(float(fields["solar"]), 86400.0)

    print(f"MP_IO_WORKER_{PID}_OK", flush=True)


if __name__ == "__main__":
    main()
