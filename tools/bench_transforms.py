"""Spectral-transform speed-of-light benchmark (BASELINE.md metric #2).

Measures the full analysis+synthesis round trip (grid -> spectral -> grid:
DFT + Legendre einsums, exactly the production `grid_to_spec`/`spec_to_grid`
path) at the standard truncations, batched over fields x levels as the model
batches them, and reports:

  * wall time per round trip,
  * achieved GFLOP/s (analytic FLOP count of the four einsums),
  * fraction of the chip's matmul peak for the precision in use.

The reference has no published transform numbers (BASELINE.md); this IS the
baseline. Writes TRANSFORM_BENCH.json at the repo root.

Run on the real TPU:  python tools/bench_transforms.py [--batch B]
(also runs on CPU for smoke purposes; peak fraction is then meaningless).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from isca_tpu.spectral import transforms as tr

# matmul peak TFLOP/s per chip by device kind.  "highest" precision on TPU
# runs f32-accurate matmuls via multi-pass bf16 (~6 passes), so the relevant
# speed-of-light is peak_bf16 / 6; "default" compares against peak_bf16.
# Sources: public TPU spec sheets (v4: 275 bf16; v5e: 197; v5p: 459; v6e: 918).
PEAK_BF16_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5e": 197.0,
    "TPU v5 lite": 197.0,
    "TPU v5p": 459.0,
    "TPU v6e": 918.0,
    "TPU v6 lite": 918.0,
}


def roundtrip_flops(T: tr.SphericalTransforms, batch: int) -> float:
    """Analytic FLOPs of one analysis+synthesis round trip.

    Four dense real contractions (2 mul-add = 2 FLOPs per MAC):
      DFT analysis      (B, nlat, nlon) x (nlon, 2*M1)
      Legendre analysis (nlat, M1, N2) x (2, B, nlat, M1)
      Legendre synth    (nlat, M1, N2) x (2, B, M1, N2)
      DFT synth         (B, nlat, 2*M1) x (2*M1, nlon)
    """
    M1 = T.num_fourier + 1
    N2 = T.num_spherical + 1
    dft = 2.0 * batch * T.nlat * T.nlon * (2 * M1)      # each direction
    leg = 2.0 * 2.0 * batch * T.nlat * M1 * N2          # each direction
    return 2.0 * dft + 2.0 * leg


def bench_one(name: str, batch: int, precision: str, iters: int = 60):
    T = tr.make_transforms(name, dtype=jnp.float32, precision=precision)

    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (batch, T.nlat, T.nlon), dtype=jnp.float32)

    @jax.jit
    def roundtrip(g):
        return tr.spec_to_grid(T, tr.grid_to_spec(T, g))

    out = roundtrip(g)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = roundtrip(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    fl = roundtrip_flops(T, batch)
    return {
        "resolution": name,
        "grid": [T.nlat, T.nlon],
        "batch": batch,
        "precision": precision,
        "us_per_roundtrip": round(dt * 1e6, 1),
        "gflops": round(fl / dt / 1e9, 1),
    }


def main():
    batch = 100
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])

    dev = jax.devices()[0]
    kind = dev.device_kind
    peak_bf16 = None
    for k, v in PEAK_BF16_TFLOPS.items():
        if k.lower() in kind.lower() or kind.lower() in k.lower():
            peak_bf16 = v
            break

    results = []
    for name in ("T42", "T85", "T170", "T213"):
        for precision in ("highest", "default"):
            r = bench_one(name, batch, precision)
            if peak_bf16 is not None:
                # "highest" = 6-pass bf16 on MXU; "default" = single-pass bf16
                sol = peak_bf16 * 1e3 / (6.0 if precision == "highest" else 1.0)
                r["pct_of_peak"] = round(100.0 * r["gflops"] / sol, 1)
            results.append(r)
            print(r)

    rep = {
        "device_kind": kind,
        "platform": dev.platform,
        "peak_bf16_tflops": peak_bf16,
        "peak_model": "highest precision := peak_bf16/6 (6-pass f32-accurate)",
        "batch": batch,
        "results": results,
    }
    out_path = os.path.join(os.path.dirname(__file__), "..", "TRANSFORM_BENCH.json")
    with open(out_path, "w") as fh:
        json.dump(rep, fh, indent=1)
    print(f"wrote {os.path.abspath(out_path)}")


if __name__ == "__main__":
    main()
