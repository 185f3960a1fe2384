"""Trip-test analogue: fast configs against the stored goldens.

The full matrix lives in tools/trip_test.py (15 configurations mirroring
exp/test_cases/trip_test/trip_test_functions.py:151-172); this test keeps
the cheap ones in CI so an answer-changing commit is caught immediately.
Regenerate goldens intentionally with `python tools/trip_test.py --update`.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
GOLDEN = os.path.join(REPO, "tests", "goldens", "trip_goldens.json")

FAST = ["held_suarez", "axisymmetric", "barotropic_vort_eq_stirring",
        "shallow_water_stirring", "frierson"]


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no goldens recorded")
def test_fast_configs_match_goldens():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import trip_test

    with open(GOLDEN) as f:
        goldens = json.load(f)
    missing = [n for n in FAST if n not in goldens]
    assert not missing, f"goldens missing for {missing}"

    failures = []
    for name in FAST:
        got = trip_test.run_config(name)
        failures += trip_test.compare(name, got, goldens[name])
    assert not failures, "\n".join(failures)


def test_slow_tier_goldens_cover_all_slow_configs():
    """The weekly/manual slow tier (full test-case resolution) must have a
    committed golden for every SLOW_CONFIGS entry — including the round-5
    additions (giant T85L30, MiMA at the reference namelist shape) — so
    `tools/trip_test.py --slow` is a complete regression net, not a
    partially-recorded one."""
    sys.path.insert(0, REPO)
    from tools import trip_test

    slow_path = os.path.join(REPO, "tests", "goldens",
                             "trip_goldens_slow.json")
    assert os.path.exists(slow_path), "slow-tier goldens missing"
    with open(slow_path) as f:
        goldens = json.load(f)
    missing = sorted(set(trip_test.SLOW_CONFIGS) - set(goldens))
    assert not missing, f"slow goldens missing for {missing}"
