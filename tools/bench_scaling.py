#!/usr/bin/env python
"""Strong-scaling structure of the sharded step across mesh sizes.

BASELINE.md's third north-star metric is grid-points/s scaling at 1 chip /
1 host / N hosts. Real multi-chip hardware is unavailable in this
environment (one v5e chip via a tunnel; the build host has 2 cores, so
virtual-device wall-clock is meaningless). What CAN be measured honestly is
the *structure* XLA compiles for each mesh size, which determines scaling on
real ICI:

  * per-device FLOPs (must fall ~1/N for strong scaling),
  * per-device live memory (arguments + temps; ~1/N + replicated constants),
  * collective payload per step (the all-to-all transpose bytes; the
    communication term of the scaling model),
  * comm/compute byte ratio (the quantity ICI bandwidth must cover).

For each device count this script compiles the REAL sharded Held-Suarez
step (transpose-method shard_map transforms) in a subprocess (the virtual
device count is fixed at process startup) and merges the records into
SCALING_REPORT.json. Reference counterpart: the npes<=lat_max MPI scaling
of spec_mpp (src/atmos_spectral/tools/spec_mpp.F90:62-75); the transpose
collectives mirror transforms.F90:970-1056.

    python tools/bench_scaling.py [--resolution T85] [--levels 25]
                                  [--ndevs 1,2,4,8] [--json SCALING_REPORT.json]
"""

import argparse
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def single(resolution, levels, ndev):
    """Compile the sharded step at one mesh size; print one JSON line."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}"
    ).strip()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(HERE, ".."))
    from isca_tpu.dycore.primitive import PrimitiveConfig
    from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel
    from isca_tpu.parallel.mesh import make_mesh, shard_pytree, sharding_pytree

    res = int(resolution) if resolution.isdigit() else resolution
    mesh = make_mesh(ndev) if ndev > 1 else None
    core = PrimitiveConfig(resolution=res, num_levels=levels, dt=600.0,
                           dtype=jnp.float32, mesh=mesh)
    model = HeldSuarezModel(HeldSuarezConfig(core=core))
    s0 = model.initial_state()
    nlat = model.core.T.nlat
    if mesh is not None:
        s0 = shard_pytree(mesh, s0, nlat=nlat)
        out_sh = sharding_pytree(mesh, s0, nlat=nlat)
        step = jax.jit(lambda s: model.step(s, first=False),
                       out_shardings=out_sh)
    else:
        step = jax.jit(lambda s: model.step(s, first=False))
    compiled = step.lower(s0).compile()

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    rec = {
        "ndevices": ndev,
        "per_device_flops": float(ca.get("flops", 0.0)),
        "per_device_bytes": float(ca.get("bytes accessed", 0.0)),
    }
    mem = compiled.memory_analysis()
    if mem is not None:
        rec["per_device_argument_bytes"] = int(mem.argument_size_in_bytes)
        rec["per_device_temp_bytes"] = int(mem.temp_size_in_bytes)

    counts, payload = {}, {}
    for line in compiled.as_text().splitlines():
        m = re.search(r"=\s+(.*?)\s+(all-reduce|all-gather|all-to-all|"
                      r"collective-permute|reduce-scatter)(?:-start)?\(", line)
        if not m:
            continue
        shapes, op = m.group(1), m.group(2)
        counts[op] = counts.get(op, 0) + 1
        total = 0
        for dt, grp in re.findall(r"(f32|f64|c64|c128|u32|s32|bf16|pred)"
                                  r"\[([\d,]*)\]", shapes):
            sz = 1
            for d in grp.split(","):
                if d:
                    sz *= int(d)
            total += sz * {"f32": 4, "u32": 4, "s32": 4, "bf16": 2, "pred": 1,
                           "c64": 8, "f64": 8, "c128": 16}[dt]
        payload[op] = payload.get(op, 0) + total
    rec["collectives"] = {op: {"count": counts[op],
                               "payload_bytes": payload[op]}
                          for op in sorted(counts)}
    comm = sum(payload.values())
    rec["comm_bytes_per_step"] = comm
    rec["comm_to_compute_byte_ratio"] = (
        comm / rec["per_device_bytes"] if rec["per_device_bytes"] else None)
    print("RESULT " + json.dumps(rec), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", default="T85")
    p.add_argument("--levels", type=int, default=25)
    p.add_argument("--ndevs", default="1,2,4,8")
    p.add_argument("--json", default="SCALING_REPORT.json")
    p.add_argument("--_single", type=int, default=0, help=argparse.SUPPRESS)
    args = p.parse_args()

    if args._single:
        single(args.resolution, args.levels, args._single)
        return

    records = []
    for ndev in [int(x) for x in args.ndevs.split(",")]:
        print(f"== compiling {args.resolution}L{args.levels} on {ndev} "
              "device(s)...", flush=True)
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--resolution", args.resolution, "--levels", str(args.levels),
             "--_single", str(ndev)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                records.append(json.loads(line[len("RESULT "):]))
                break
        else:
            raise SystemExit(
                f"ndev={ndev} failed:\n{out.stdout}\n{out.stderr}")

    base = records[0]
    for r in records:
        n = r["ndevices"]
        r["flops_scaling_efficiency"] = (
            base["per_device_flops"] / (n * r["per_device_flops"]))
    rep = {
        "config": {"resolution": args.resolution, "levels": args.levels},
        "note": ("compiled structure on virtual CPU meshes; per-device flops"
                 " ~1/N and bounded comm ratio are the strong-scaling"
                 " preconditions ICI then has to satisfy (no multi-chip"
                 " hardware in this environment)"),
        "records": records,
    }
    with open(args.json, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep, indent=1))
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
