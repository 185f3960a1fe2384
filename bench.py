"""North-star benchmark: Held-Suarez T85L25 model-days/day on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference (ExeClim/Isca) publishes no timing numbers (BASELINE.md); as the
baseline denominator we use 400 model-days/day, an estimate of the Fortran-MPI
reference at T85L25 on a 16-core node (its typical deployment per
docs/source/begginers_guide.rst) — to be replaced by a measured number when the
reference toolchain (gfortran+MPI+netCDF) is available. vs_baseline > 10 is the
stated target (>10x Fortran per chip).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from isca_tpu.dycore.primitive import PrimitiveConfig
from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel

FORTRAN_BASELINE_MDPD = 400.0  # estimated reference rate (see module docstring)


def main():
    # transform_precision="high" (3-pass MXU passes instead of 6 for the
    # transform einsums) is climate-validated: the full HS T85L25 gate passes
    # 8/8 criteria at this setting (PRECISION_GATE.json, driven by
    # tools/climate_gate.py --only hs --precision high on the chip), so the
    # bench runs the same configuration we would deploy.
    core = PrimitiveConfig(resolution="T85", num_levels=25, dt=600.0,
                           transform_precision="high", dtype=jnp.float32)
    model = HeldSuarezModel(HeldSuarezConfig(core=core))
    state = model.initial_state()
    steps_per_day = int(86400 / core.dt)

    run_day = jax.jit(
        lambda s, first: model.run(s, steps_per_day, first=first), static_argnums=1
    )
    # warm up BOTH jit variants (first step is forward Euler; the rest leapfrog)
    state = run_day(state, True)
    state = run_day(state, False)
    jax.block_until_ready(state)

    t0 = time.time()
    ndays = 20
    for _ in range(ndays):
        state = run_day(state, False)
    jax.block_until_ready(state)
    wall = time.time() - t0

    ok = bool(jnp.isfinite(state.tg.curr).all())
    mdpd = ndays * 86400.0 / wall if ok else 0.0
    print(
        json.dumps(
            {
                "metric": "held_suarez_T85L25_model_days_per_day",
                "value": round(mdpd, 1),
                "unit": "model-days/day/chip",
                "vs_baseline": round(mdpd / FORTRAN_BASELINE_MDPD, 2),
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
