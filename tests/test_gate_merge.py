"""merge_artifacts: later files win on criterion collisions, and re-merging
an already-merged artifact carries its per-config provenance rows through
instead of flattening them into one synthetic row. Plus the bounds-drift
guard: the committed CLIMATE_GATE.json must agree with the code's BOUNDS
registry (round-4 verdict: stale entries under superseded bounds silently
coexisted with current-bounds code)."""

import json
import os

import pytest

from tools.climate_gate import BOUNDS, bounds_version, merge_artifacts


def test_merge_preserves_nested_provenance(tmp_path):
    merged_in = {
        "criteria": {"x": {"pass": True}, "m": {"pass": False}},
        "configs_run": ["hs", "mima"],
        "wall_seconds": 10.0,
        "runs": [
            {"source": "r1.json", "configs": ["hs"], "date": "d1",
             "platform": "tpu", "device_kind": "v5", "days_arg": 1,
             "wall_seconds": 4.0},
            {"source": "r2.json", "configs": ["mima"], "date": "d2",
             "platform": "tpu", "device_kind": "v5", "days_arg": 2,
             "wall_seconds": 6.0},
        ],
    }
    rerun = {"criteria": {"m": {"pass": True}}, "configs_run": ["mima"],
             "wall_seconds": 5.0, "date": "d3", "platform": "tpu",
             "device_kind": "v5", "days_arg": 3}
    pa, pb, pc = (tmp_path / n for n in ("a.json", "b.json", "out.json"))
    pa.write_text(json.dumps(merged_in))
    pb.write_text(json.dumps(rerun))

    rc = merge_artifacts([str(pa), str(pb)], str(pc))
    out = json.loads(pc.read_text())

    assert out["criteria"]["m"]["pass"] is True   # later file wins
    assert out["criteria"]["x"]["pass"] is True
    assert len(out["runs"]) == 3                  # 2 carried through + 1 new
    assert out["configs_run"] == ["hs", "mima"]
    assert out["passed"] == 2 and out["total"] == 2
    assert abs(out["wall_seconds"] - 15.0) < 1e-9
    assert rc == 0


ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "CLIMATE_GATE.json")


def test_artifact_bounds_match_code():
    """Every criterion in the committed artifact must have been judged under
    the CURRENT bounds registry: its recorded bounds equal BOUNDS[name] and
    its bounds_version stamp equals the code's. A bounds change without a
    wholesale artifact regeneration fails here — stale entries cannot
    silently coexist with tightened code (round-4 verdict, weak #1)."""
    if not os.path.exists(ARTIFACT):
        pytest.skip("no committed CLIMATE_GATE.json")
    art = json.load(open(ARTIFACT))
    if "bounds_version" not in art:
        pytest.skip("legacy (pre-bounds-registry) artifact format — "
                    "regenerate wholesale with tools/climate_gate.py")
    code_v = bounds_version()
    assert art.get("bounds_version_code", art["bounds_version"]) == code_v \
        or art["bounds_version"] == code_v, (
        f"artifact bounds_version {art['bounds_version']} != code {code_v}")
    for name, rec in art["criteria"].items():
        assert rec.get("bounds_version") == code_v, (
            f"{name}: judged under bounds_version "
            f"{rec.get('bounds_version')}, code is {code_v}")
        if name in BOUNDS and "bounds" in rec:
            want = BOUNDS[name]
            got = rec["bounds"]
            if isinstance(want, dict):
                assert got == want, f"{name}: {got} != {want}"
            else:
                assert list(got) == list(want), f"{name}: {got} != {want}"


def test_bounds_version_stamped_by_checks():
    from tools.climate_gate import bcheck, check

    results = {}
    bcheck("hs_jet_strength", 30.0, "detail", results)
    check("fr_jet", True, "detail", results)
    v = bounds_version()
    assert results["hs_jet_strength"]["bounds_version"] == v
    assert results["hs_jet_strength"]["bounds"] == [25.0, 40.0]
    assert results["fr_jet"]["bounds_version"] == v
    assert results["fr_jet"]["bounds"] == BOUNDS["fr_jet"]


def test_bcheck_open_bounds():
    from tools.climate_gate import bcheck

    results = {}
    assert bcheck("hs_surface_westerlies", 3.0, "d", results)      # [0, None]
    assert not bcheck("hs_surface_westerlies", -1.0, "d", results)
    assert bcheck("hs_trade_easterlies", -2.0, "d", results)       # [None, 0]
    assert not bcheck("hs_trade_easterlies", 1.0, "d", results)
