#!/usr/bin/env python
"""Attach the giant-planet spinup trajectory from a chained-run log to the
gate artifact.

The chained giant gate logs the upper-equatorial zonal-mean wind at every
~10-minute checkpoint ("[spinup] day D: upper equatorial u = +X m/s",
tools/climate_gate.py gate_giant.progress). That trajectory is the evidence
behind the honest PASS/FAIL story: it shows whether the SL09 superrotation
is still spinning up (slow prograde drift) or has equilibrated. This tool
parses those lines out of one or more watchdog logs and records them in the
per-config artifact under provenance, so the committed CLIMATE_GATE.json
carries the measured spin-up curve, not just the end state.

    python tools/attach_trajectory.py CG_giant_r5.json giant_r5.log [more.log]
"""

import json
import re
import sys

PAT = re.compile(
    r"\[(spinup|averaging)\] day ([0-9.]+): upper equatorial u = "
    r"([+-][0-9.]+) m/s")


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 2
    art_path, logs = argv[1], argv[2:]
    traj = {}
    for lp in logs:
        with open(lp) as f:
            for m in PAT.finditer(f.read()):
                traj[float(m.group(2))] = float(m.group(3))
    if not traj:
        print("no trajectory lines found")
        return 1
    with open(art_path) as f:
        art = json.load(f)
    art["gp_spinup_trajectory"] = {
        "description": "upper-equatorial (|lat|<8, top third) zonal-mean u "
                       "at chained-run checkpoints, m/s by model day",
        "points": [[d, traj[d]] for d in sorted(traj)],
    }
    with open(art_path, "w") as f:
        json.dump(art, f, indent=1)
    print(f"attached {len(traj)} trajectory points to {art_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
