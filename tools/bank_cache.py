#!/usr/bin/env python
"""Recompress gate state caches for committing (docs/testing.md chaining).

Build machines are ephemeral: a chained spinup survives a session ONLY as a
git-committed cache. In-session checkpoints are written uncompressed (zlib
on a ~470 MB T213L30 state costs 20-40 s at the 10-minute cadence); this
tool deflates them once, atomically, at session end:

    python tools/bank_cache.py exp/gate_cache/*.npz
    git add exp/gate_cache && git commit -m "Bank N spinup days"

`np.load` reads either format, so the committed file resumes directly.
"""

import os
import sys

import numpy as np


def bank(path):
    before = os.path.getsize(path)
    with np.load(path, allow_pickle=False) as d:
        payload = {k: d[k] for k in d.files}
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **payload)
    os.replace(tmp, path)
    after = os.path.getsize(path)
    steps = int(payload.get("steps", np.int64(0)))
    print(f"{path}: {before / 1e6:.0f} MB -> {after / 1e6:.0f} MB "
          f"({steps} steps banked)")


if __name__ == "__main__":
    paths = [p for p in sys.argv[1:] if os.path.exists(p)]
    if not paths:
        sys.exit("no cache files given/found")
    for p in paths:
        bank(p)
