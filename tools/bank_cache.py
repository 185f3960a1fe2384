#!/usr/bin/env python
"""Recompress gate state caches for committing (docs/testing.md chaining).

Build machines are ephemeral: a chained spinup survives a session ONLY as a
git-committed cache. In-session checkpoints are written uncompressed (zlib
on a ~470 MB T213L30 state costs 20-40 s at the 10-minute cadence); this
tool deflates them once, atomically, at session end:

    python tools/bank_cache.py exp/gate_cache/*.npz
    git add exp/gate_cache && git commit -m "Bank N spinup days"

`np.load` reads either format, so the committed file resumes directly.

XLA compile-cache curation (exp/xla_cache is gitignored by default —
round-4 advisor: committed CPU/oversized entries are dead weight or
SIGILL-prone on other hosts):

    python tools/bank_cache.py --curate-xla [--max-mb 100]

force-adds entries under the size cap that are already tracked or that a
TPU session just (re)wrote, and UNTRACKS any tracked entry over the cap.
Run it only after a real-TPU session (CPU runs are redirected to temp
cache dirs by tests/conftest.py and __graft_entry__.dryrun_multichip, so
entries present here are TPU programs).
"""

import os
import subprocess
import sys

import numpy as np


def curate_xla(max_mb=100.0):
    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(here, "..", "exp", "xla_cache")
    tracked = set(subprocess.run(
        ["git", "ls-files", "exp/xla_cache"], cwd=os.path.join(here, ".."),
        capture_output=True, text=True).stdout.split())
    add, rm = [], []
    for name in sorted(os.listdir(cache)):
        rel = f"exp/xla_cache/{name}"
        mb = os.path.getsize(os.path.join(cache, name)) / 1e6
        if mb > max_mb:
            if rel in tracked:
                rm.append(rel)
            print(f"  skip  {name} ({mb:.0f} MB > {max_mb:.0f} MB cap)")
        else:
            add.append(rel)
    root = os.path.join(here, "..")
    if rm:
        subprocess.run(["git", "rm", "-q", "--cached", *rm], cwd=root,
                       check=True)
        print(f"untracked {len(rm)} oversized entries (kept on disk)")
    if add:
        subprocess.run(["git", "add", "-f", *add], cwd=root, check=True)
        print(f"staged {len(add)} entries under the {max_mb:.0f} MB cap")


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
    if "--curate-xla" in sys.argv:
        argv = sys.argv[1:]
        cap = (float(argv[argv.index("--max-mb") + 1])
               if "--max-mb" in argv else 100.0)
        curate_xla(cap)
        sys.exit(0)
    paths = [p for p in sys.argv[1:] if os.path.exists(p)]
    if not paths:
        sys.exit("no cache files given/found")
    for p in paths:
        bank(p)
