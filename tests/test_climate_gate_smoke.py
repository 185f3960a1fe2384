"""Structural smoke of the realistic-continents gate (tools/climate_gate.py).

The climate gates are chip-run validation, but their orchestration (land +
Sauliere topography setup, seasonal window tiling, empirical winter-window
selection, the spin-orbit override, criterion recording) is plain Python that
must not rot between chip sessions. These tests run the REAL gate_realistic
at a deliberately tiny configuration (T21, few-day smoke orbit via
orbit_days_override — the knob that exists for exactly this) and assert the
machinery, not the climate: every criterion is recorded with a finite value
and the current bounds stamp. Climate PASSes are meaningless at a 4-day
orbit and are intentionally not asserted.

The RRTM variant additionally exercises the reference-ozone ingestion and
the OLR criterion (the round-4 never-run path); at ~3 min of CPU it is
gated behind ISCA_SLOW_TESTS=1 (the chip climate gate covers it for real).
"""

import os

import pytest

from tools.climate_gate import bounds_version, gate_realistic

GREY_KEYS = {
    "realistic_land_seasonal_amplitude",
    "realistic_continentality_ratio",
    "realistic_winter_jet_stronger",
    "realistic_tsurf_range_winter",
    "realistic_tsurf_range_summer",
}


def _assert_recorded(results, keys):
    assert keys <= set(results), f"missing criteria: {keys - set(results)}"
    v = bounds_version()
    for k in keys:
        rec = results[k]
        assert isinstance(rec["pass"], bool)
        assert rec["bounds_version"] == v
        assert "value" in rec and rec["value"] == rec["value"]  # finite/not-NaN


def test_gate_realistic_grey_smoke():
    results = {}
    gate_realistic(6, results, resolution="T21", orbit_days_override=4,
                   radiation="grey", spin_orbits=1)
    _assert_recorded(results, GREY_KEYS)
    assert "realistic_olr" not in results  # OLR criterion is RRTM-only


@pytest.mark.skipif(not os.environ.get("ISCA_SLOW_TESTS"),
                    reason="~3 min CPU; set ISCA_SLOW_TESTS=1 (chip gate "
                           "covers the RRTM path in production)")
def test_gate_realistic_rrtm_smoke():
    results = {}
    gate_realistic(4, results, resolution="T21", orbit_days_override=2,
                   radiation="rrtm", spin_orbits=1)
    _assert_recorded(results, GREY_KEYS | {"realistic_olr"})
