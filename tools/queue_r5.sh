#!/bin/bash
# Round-5 chip queue: runs the remaining climate-gate sessions back-to-back
# after the giant T213 chain finishes, so the single TPU chip never idles.
# Each stage is supervised by the stall watchdog and writes its own
# per-config artifact; the final merge into CLIMATE_GATE.json happens
# separately once all stages are in.
set -ux
cd "$(dirname "$0")/.."

# 1. Held-Suarez + Frierson under the CURRENT bounds registry at the bench
#    precision ("high", PRECISION_GATE-validated) — the committed artifact's
#    round-3 entries predate the bounds_version stamps and cannot satisfy
#    tests/test_gate_merge.py::test_artifact_bounds_match_code.
python tools/run_watchdog.py --log hsfr_r5.log -- \
  python tools/climate_gate.py --only hs,frierson --days 1200 \
    --precision high --json CG_hsfr_r5.json

# 2. MiMA chained to >=720 accumulated days on the synthetic-v4 LW tables
#    (gate days = --days/2; spin 360 + avg 360; cache seeded round 4).
python tools/run_watchdog.py --log mima_r5.log -- \
  python tools/climate_gate.py --only mima --days 1440 \
    --mima-cache exp/gate_cache/mima_T42.npz --json CG_mima_r5.json \
    --max-wall-seconds 3600

# 3. Realistic continents under the reference's RRTM configuration.
#    spin-orbits 1 is the session-budget minimum (recorded in the artifact).
python tools/run_watchdog.py --log realistic_r5.log -- \
  python tools/climate_gate.py --only realistic --days 1080 \
    --realistic-radiation rrtm --realistic-spin-orbits 1 \
    --json CG_realistic_rrtm_r5.json
