"""merge_artifacts: later files win on criterion collisions, and re-merging
an already-merged artifact carries its per-config provenance rows through
instead of flattening them into one synthetic row."""

import json

from tools.climate_gate import merge_artifacts


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
