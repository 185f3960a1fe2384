#!/usr/bin/env python
"""On-chip smoke matrix: every trip-test configuration at float32 on the TPU.

The golden trip tests (tools/trip_test.py) validate numerics at float64 on
CPU; this tool rebuilds the same 17-config matrix at float32 and integrates
each for a few model days on the real chip, checking finiteness and sane
temperature ranges. It exists because f32-on-TPU failure modes (bf16 matmul
defaults, ~1e-5-absolute transcendentals) do not reproduce on CPU — the
Frierson 'input'-ladder log-cancellation blow-up was exactly such a case.

Usage:
    python tools/tpu_smoke.py [--days 3] [--only frierson,mima]

Exit code 0 iff every configuration passes.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp

import trip_test

trip_test.DTYPE = jnp.float32  # rebuild the matrix at f32 for the chip


def tg_of(state):
    dyn = getattr(state, "dyn", state)
    if hasattr(dyn, "tg"):
        return dyn.tg.curr
    return None  # barotropic/shallow have no temperature


def prognostic_leaves(state):
    return [x for x in jax.tree_util.tree_leaves(state)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)]


def run_one(name: str, days: float) -> tuple[bool, str]:
    model = trip_test.CONFIGS[name]()
    state = (model.initial_state(0) if name.startswith(("barotropic", "shallow"))
             else model.initial_state())
    dt = getattr(getattr(model, "core", model).config, "dt", None) or model.config.dt
    steps = max(int(days * 86400.0 / dt), 2)

    run = jax.jit(lambda s: model.run(s, steps, first=True))
    t0 = time.time()
    state = jax.block_until_ready(run(state))
    wall = time.time() - t0

    finite = all(bool(jnp.isfinite(x).all()) for x in prognostic_leaves(state))
    detail = f"{steps} steps in {wall:.0f}s"
    tg = tg_of(state)
    if tg is not None:
        tmin, tmax = float(tg.min()), float(tg.max())
        detail += f", T in [{tmin:.0f}, {tmax:.0f}] K"
        finite = finite and 80.0 < tmin < tmax < 900.0
    return finite, detail


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--days", type=float, default=3.0)
    p.add_argument("--only", default="")
    args = p.parse_args()

    names = [n for n in (args.only.split(",") if args.only else trip_test.CONFIGS)
             if n]
    failures = []
    for n in names:
        try:
            ok, detail = run_one(n, args.days)
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            ok, detail = False, f"exception: {type(e).__name__}: {e}"
        print(f"[{'PASS' if ok else 'FAIL'}] {n}: {detail}", flush=True)
        if not ok:
            failures.append(n)
    print(f"\n{len(names) - len(failures)}/{len(names)} configs pass on TPU f32")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
