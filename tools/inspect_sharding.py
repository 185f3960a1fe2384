"""Inspect the collectives XLA/GSPMD inserts for the sharded Held-Suarez step.

Diagnostic tool (not a test): compiles the model step over an 8-device virtual
CPU mesh and reports (a) which collective ops appear in the optimized HLO and
how many bytes they move, (b) whether the Legendre einsums were partitioned
(per-device shapes smaller than global) or replicated.

Usage: python tools/inspect_sharding.py [T] [L] [ndev]
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ndev = int(sys.argv[3]) if len(sys.argv) > 3 else 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={ndev}"
).strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from isca_tpu.dycore.primitive import PrimitiveConfig
from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel
from isca_tpu.parallel.mesh import make_mesh, shard_pytree, sharding_pytree


def main():
    Tres = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    core = PrimitiveConfig(resolution=Tres, num_levels=L, dt=600.0, dtype=jnp.float32)
    model = HeldSuarezModel(HeldSuarezConfig(core=core))
    s0 = model.initial_state()

    mesh = make_mesh(ndev)
    s_sh = shard_pytree(mesh, s0)
    out_sh = sharding_pytree(mesh, s_sh)
    step = jax.jit(lambda s: model.step(s, first=False), out_shardings=out_sh)
    lowered = step.lower(s_sh)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    counts = {}
    bytes_moved = {}
    for line in hlo.splitlines():
        m = re.search(r"=\s+(\S+)\s+(all-reduce|all-gather|all-to-all|"
                      r"collective-permute|reduce-scatter)\(", line)
        if m:
            shape, op = m.group(1), m.group(2)
            counts[op] = counts.get(op, 0) + 1
            nums = re.findall(r"(\d+(?:,\d+)*)\]", shape)
            sz = 1
            for grp in re.findall(r"\[([\d,]*)\]", shape):
                if grp:
                    for d in grp.split(","):
                        sz *= int(d)
            elt = 8 if "c64" in shape else (4 if "f32" in shape or "u32" in shape else 8)
            bytes_moved[op] = bytes_moved.get(op, 0) + sz * elt

    print(f"== collectives in one step (T{Tres}L{L}, {ndev} devices) ==")
    for op in sorted(counts):
        print(f"  {op:20s} x{counts[op]:3d}   ~{bytes_moved[op]/1e6:.2f} MB payload")
    if not counts:
        print("  (none)")

    # biggest per-device dots => did the Legendre einsums partition?
    dots = []
    for line in hlo.splitlines():
        m = re.match(r"\s*%?\S+\s+=\s+(\S+)\s+dot\(", line)
        if m:
            shape = m.group(1)
            sz = 1
            for grp in re.findall(r"\[([\d,]*)\]", shape):
                if grp:
                    for d in grp.split(","):
                        sz *= int(d)
            dots.append((sz, shape))
    dots.sort(reverse=True)
    print("== largest per-device dot outputs ==")
    for sz, shape in dots[:8]:
        print(f"  {shape}")
    nlat = model.core.T.nlat
    print(f"(global nlat={nlat}, per-device should be {nlat//ndev}; "
          f"M+1={model.core.T.num_fourier+1})")


if __name__ == "__main__":
    main()
