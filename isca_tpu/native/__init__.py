"""Native (C++) runtime support, loaded via ctypes.

Compiled on first import with g++ (cached next to the source); falls back to
pure-Python implementations if no compiler is available, so the package never
hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import time

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "fastio.cpp")
_SO = os.path.join(_HERE, "_fastio.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.combine_tiles.restype = ctypes.c_int
    lib.combine_tiles.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.rss_kb.restype = ctypes.c_int64
    lib.ns_clock.restype = ctypes.c_int64
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def combine_tiles(tiles, offsets, rows_total: int):
    """Merge per-host shards (list of (rows_i, ...) f32 arrays) along axis 0.

    The mppnccombine-equivalent: shards from a multi-host run are merged into
    one (rows_total, ...) array before a single NetCDF write.
    """
    tiles = [np.ascontiguousarray(t, np.float32) for t in tiles]
    trail = tiles[0].shape[1:]
    cols = int(np.prod(trail)) if trail else 1
    out = np.empty((rows_total,) + trail, np.float32)
    lib = _load()
    if lib is None:  # pure-python fallback
        for t, off in zip(tiles, offsets):
            out[off : off + t.shape[0]] = t
        return out
    ptrs = (ctypes.POINTER(ctypes.c_float) * len(tiles))(
        *[t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for t in tiles]
    )
    rows = (ctypes.c_int64 * len(tiles))(*[t.shape[0] for t in tiles])
    offs = (ctypes.c_int64 * len(tiles))(*list(offsets))
    rc = lib.combine_tiles(
        ptrs, rows, offs, len(tiles), rows_total, cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError("combine_tiles: shard out of bounds")
    return out


def rss_kb() -> int:
    lib = _load()
    if lib is None:
        return -1
    return int(lib.rss_kb())


def ns_clock() -> int:
    lib = _load()
    if lib is None:
        return time.monotonic_ns()
    return int(lib.ns_clock())
