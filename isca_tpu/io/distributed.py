"""Distributed (multi-host) restart and diagnostics IO.

Reference counterpart: per-PE netCDF filesets + offline combine
(`src/shared/mpp/mpp_io.F90` fileset_write/threading_write;
`postprocessing/mppnccombine.c`, invoked per run segment by
`experiment.py:304-327`).

TPU-native design: under a `jax.sharding.Mesh`, each *process* owns the
shards living on its addressable devices (`jax.Array.addressable_shards`).

* `save_restart_sharded(dir, state)` — every process writes ONE
  `tile{proc:04d}.npz` containing only its local shard blocks plus an index
  (leaf paths, global shapes, per-shard slices). No cross-host gather; no
  host ever materializes the global state. Both leapfrog time levels ride
  along, exactly as the reference requires for restart continuity.
* `load_restart_sharded(dir, like)` — rebuilds sharded `jax.Array`s with
  `jax.make_array_from_single_device_arrays`, each process reading only the
  tiles that overlap its addressable shards. Bit-exact round trip.
* `combine_restart_tiles(dir)` — offline merge of a tile set into the
  single-file layout of `io.restart` (the mppnccombine equivalent), using
  the native `fastio.combine_tiles` kernel for the data movement.
* `DiagTileWriter` / `combine_diag_tiles` — per-process diagnostic tile
  files + combine, for DiagManager output on multi-host meshes.

On the single-chip axon TPU (1 process, 1 device) the single-file
`io.restart` path remains the right tool; this module is exercised on
multi-device meshes (the driver's virtual-CPU mesh and real multi-host
pods share the code path — process count is the only difference).
"""

from __future__ import annotations

import glob
import json
import os

import jax
import numpy as np

from isca_tpu.io import restart as single


def _shard_index_slices(shard, ndim):
    """Normalize a shard's global index to [(start, stop), ...] per dim."""
    out = []
    for d in range(ndim):
        sl = shard.index[d] if d < len(shard.index) else slice(None)
        start = 0 if sl.start is None else int(sl.start)
        stop = None if sl.stop is None else int(sl.stop)
        out.append((start, stop))
    return out


def save_restart_sharded(dirpath: str, state) -> str:
    """Write this process's shard tile of a (possibly sharded) state pytree."""
    os.makedirs(dirpath, exist_ok=True)
    proc = jax.process_index()
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    paths = [jax.tree_util.keystr(p) for p, _ in flat]

    arrays: dict[str, np.ndarray] = {}
    index: list[dict] = []
    for i, (_, leaf) in enumerate(flat):
        if not isinstance(leaf, jax.Array):
            leaf = jax.numpy.asarray(leaf)
        shape = tuple(leaf.shape)
        shards_meta = []
        seen_idx = set()
        for k, sh in enumerate(leaf.addressable_shards):
            slices = _shard_index_slices(sh, leaf.ndim)
            key_id = tuple(slices)
            if key_id in seen_idx:     # replicated across local devices
                continue
            seen_idx.add(key_id)
            key = f"leaf{i}_s{k}"
            arrays[key] = single._to_host(sh.data)
            shards_meta.append({"key": key, "slices": slices})
        index.append({"path": paths[i], "shape": shape,
                      "dtype": str(np.asarray(arrays[shards_meta[0]["key"]]).dtype)
                      if shards_meta else "float32",
                      "shards": shards_meta})

    out = os.path.join(dirpath, f"tile{proc:04d}.npz")
    np.savez_compressed(out, _index=json.dumps(index), **arrays)
    return out


def _read_tiles(dirpath: str):
    tiles = []
    for path in sorted(glob.glob(os.path.join(dirpath, "tile*.npz"))):
        data = np.load(path, allow_pickle=False)
        tiles.append((json.loads(str(data["_index"])), data))
    if not tiles:
        raise FileNotFoundError(f"no tile*.npz files in {dirpath}")
    return tiles


def load_restart_sharded(dirpath: str, like):
    """Rebuild a sharded state pytree from a tile directory.

    `like` supplies the structure, shapes, dtypes AND target shardings
    (e.g. the freshly-built initial state after shard_pytree). The mesh
    layout may differ from the one that wrote the tiles as long as every
    target shard is expressible as a union of saved blocks (the usual case:
    same divisor chain).
    """
    tiles = _read_tiles(dirpath)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    paths_like = [jax.tree_util.keystr(p) for p, _ in flat]
    paths_saved = [e["path"] for e in tiles[0][0]]
    if paths_like != paths_saved:
        raise ValueError("restart structure mismatch:\n saved: %s\n model: %s"
                         % (paths_saved[:4], paths_like[:4]))

    leaves = []
    for i, (_, tmpl) in enumerate(flat):
        if not isinstance(tmpl, jax.Array):
            tmpl = jax.numpy.asarray(tmpl)
        shape = tuple(tmpl.shape)
        entry0 = tiles[0][0][i]
        if tuple(entry0["shape"]) != shape:
            raise ValueError(f"restart resolution mismatch for {paths_like[i]}: "
                             f"{entry0['shape']} vs {shape}")
        # collect all saved blocks for this leaf across tiles
        blocks = []
        for index, data in tiles:
            for smeta in index[i]["shards"]:
                blocks.append((smeta["slices"], data[smeta["key"]]))

        def extract(slices):
            """Assemble the sub-array covering `slices` from saved blocks."""
            tgt = [(s, shape[d] if e is None else e)
                   for d, (s, e) in enumerate(slices)]
            out = None
            for bsl, arr in blocks:
                src = [(s, shape[d] if e is None else e)
                       for d, (s, e) in enumerate(bsl)]
                if all(ts >= ss and te <= se
                       for (ts, te), (ss, se) in zip(tgt, src)):
                    cut = tuple(slice(ts - ss, te - ss)
                                for (ts, te), (ss, _) in zip(tgt, src))
                    # NB: ascontiguousarray alone would promote 0-d scalars
                    # to shape (1,); reshape restores the exact target shape
                    return np.ascontiguousarray(arr[cut]).reshape(
                        [te - ts for ts, te in tgt])
                # partial overlap: accumulate
                if all(ts < se and te > ss
                       for (ts, te), (ss, se) in zip(tgt, src)):
                    if out is None:
                        out = np.zeros([te - ts for ts, te in tgt], arr.dtype)
                    inter = [(max(ts, ss), min(te, se))
                             for (ts, te), (ss, se) in zip(tgt, src)]
                    dst_cut = tuple(slice(a - ts, b - ts)
                                    for (a, b), (ts, _) in zip(inter, tgt))
                    src_cut = tuple(slice(a - ss, b - ss)
                                    for (a, b), (ss, _) in zip(inter, src))
                    out[dst_cut] = arr[src_cut]
            if out is None:
                raise ValueError(f"no saved block covers {slices} of "
                                 f"{paths_like[i]}")
            return out

        sharding = tmpl.sharding
        device_arrays = []
        for sh in tmpl.addressable_shards:
            block = extract(_shard_index_slices(sh, tmpl.ndim))
            device_arrays.append(jax.device_put(block.astype(tmpl.dtype),
                                                sh.device))
        leaves.append(jax.make_array_from_single_device_arrays(
            shape, sharding, device_arrays))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def combine_restart_tiles(dirpath: str, out_path: str) -> None:
    """Merge a sharded tile set into one single-file restart (io.restart
    layout) — the mppnccombine equivalent. f32 lat-sharded blocks go through
    the native fastio.combine_tiles kernel; everything else through numpy."""
    from isca_tpu import native as fastio

    tiles = _read_tiles(dirpath)
    index0 = tiles[0][0]
    paths = [e["path"] for e in index0]
    arrays = {}
    for i, entry in enumerate(index0):
        shape = tuple(entry["shape"])
        blocks = []
        for index, data in tiles:
            for smeta in index[i]["shards"]:
                blocks.append((smeta["slices"], data[smeta["key"]]))
        first = blocks[0][1]
        # fast path: f32 blocks split along axis 0 only
        axis0_only = all(
            all((s == 0 and (e is None or e == shape[d])) for d, (s, e)
                in enumerate(bsl) if d != 0)
            for bsl, _ in blocks)
        if axis0_only and first.dtype == np.float32 and len(shape) >= 1:
            out = fastio.combine_tiles([b for _, b in blocks],
                                       [bsl[0][0] for bsl, _ in blocks],
                                       shape[0])
        else:
            out = np.zeros(shape, first.dtype)
            for bsl, b in blocks:
                cut = tuple(slice(s, shape[d] if e is None else e)
                            for d, (s, e) in enumerate(bsl))
                out[cut] = b
        arrays[f"leaf_{i}"] = out
    np.savez_compressed(out_path, _paths=json.dumps(paths), **arrays)


# ---------------------------------------------------------------------------
# Diagnostics tiles (per-process DiagManager output + combine)
# ---------------------------------------------------------------------------

class DiagTileWriter:
    """Accumulates finalized diagnostic records as per-process tile files.

    Use in place of (or before) the NetCDF writer on multi-host meshes: each
    process passes only its local lat-band blocks; `combine_diag_tiles`
    produces the global field dict for the single-file writer.
    """

    def __init__(self, dirpath: str):
        self.dir = dirpath
        os.makedirs(dirpath, exist_ok=True)
        self.proc = jax.process_index()

    def write(self, record_id: int, fields: dict) -> str:
        """fields: name -> sharded jax.Array or (np block, offset, axis)."""
        arrays, meta = {}, []
        for name, v in fields.items():
            if isinstance(v, jax.Array) and not v.is_fully_replicated:
                seen = set()
                for k, sh in enumerate(v.addressable_shards):
                    slices = _shard_index_slices(sh, v.ndim)
                    if tuple(slices) in seen:
                        continue
                    seen.add(tuple(slices))
                    key = f"{name}__s{k}"
                    arrays[key] = single._to_host(sh.data)
                    meta.append({"name": name, "key": key, "slices": slices,
                                 "shape": tuple(v.shape)})
            else:
                arrays[f"{name}__full"] = single._to_host(v)
                meta.append({"name": name, "key": f"{name}__full",
                             "slices": None,
                             "shape": tuple(np.shape(arrays[f"{name}__full"]))})
        path = os.path.join(self.dir, f"rec{record_id:06d}.tile{self.proc:04d}.npz")
        np.savez_compressed(path, _meta=json.dumps(meta), **arrays)
        return path


def combine_diag_tiles(dirpath: str, record_id: int) -> dict:
    """Merge one record's tiles from all processes into global numpy fields."""
    paths = sorted(glob.glob(
        os.path.join(dirpath, f"rec{record_id:06d}.tile*.npz")))
    if not paths:
        raise FileNotFoundError(f"no tiles for record {record_id} in {dirpath}")
    fields: dict[str, np.ndarray] = {}
    for p in paths:
        data = np.load(p, allow_pickle=False)
        for m in json.loads(str(data["_meta"])):
            name, arr = m["name"], data[m["key"]]
            if m["slices"] is None:
                fields[name] = arr
                continue
            if name not in fields:
                fields[name] = np.zeros(m["shape"], arr.dtype)
            cut = tuple(slice(s, m["shape"][d] if e is None else e)
                        for d, (s, e) in enumerate(m["slices"]))
            fields[name][cut] = arr
    return fields
