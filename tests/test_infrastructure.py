"""Tests for time manager, diagnostics manager, restarts, Experiment API."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isca_tpu.utils.time_manager import ModelTime
from isca_tpu.io.diag_manager import DiagTable, DiagManager
from isca_tpu.io.restart import save_restart, load_restart
from isca_tpu.experiment import Experiment
from isca_tpu.dycore.primitive import PrimitiveConfig
from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel


class TestTimeManager:
    def test_thirty_day_calendar(self):
        t = ModelTime.from_date(2, 3, 15, 6, 30, 0)
        assert t.date() == (2, 3, 15, 6, 30, 0)
        t2 = t + 86400 * 16
        assert t2.date() == (2, 4, 1, 6, 30, 0)

    def test_noleap(self):
        t = ModelTime.from_date(1, 2, 28, calendar="noleap") + 86400
        assert t.date()[:3] == (1, 3, 1)

    def test_julian_leap(self):
        t = ModelTime.from_date(4, 2, 28, calendar="julian") + 86400
        assert t.date()[:3] == (4, 2, 29)

    def test_fraction_of_year(self):
        t = ModelTime.from_date(1, 7, 1)  # half way through a 360-day year
        assert abs(t.fraction_of_year() - 0.5) < 0.01


class TestRestart:
    def test_round_trip(self, tmp_path):
        model = HeldSuarezModel(HeldSuarezConfig(core=PrimitiveConfig(
            resolution="T21", num_levels=8, dt=1800.0, dtype=jnp.float64)))
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 6))(s)
        path = str(tmp_path / "res0001.npz")
        save_restart(path, s)
        s2 = load_restart(path, model.initial_state())
        np.testing.assert_array_equal(np.asarray(s2.tg.curr), np.asarray(s.tg.curr))
        np.testing.assert_array_equal(np.asarray(s2.vors.prev), np.asarray(s.vors.prev))
        # continuing from the restart matches continuing directly (exact)
        a = jax.jit(lambda s: model.run(s, 6, first=False))(s)
        b = jax.jit(lambda s: model.run(s, 6, first=False))(s2)
        np.testing.assert_array_equal(np.asarray(a.tg.curr), np.asarray(b.tg.curr))


class TestExperiment:
    def test_segmented_run_with_diagnostics(self, tmp_path):
        model = HeldSuarezModel(HeldSuarezConfig(core=PrimitiveConfig(
            resolution="T21", num_levels=8, dt=1800.0, dtype=jnp.float64)))
        dt = DiagTable().add_file("atmos_daily", 86400)
        dt.add_field("atmos_daily", "dynamics", "temp", time_avg=True)
        dt.add_field("atmos_daily", "dynamics", "ps", time_avg=True)
        dt.add_field("atmos_daily", "dynamics", "ucomp", time_avg=False)
        exp = Experiment("hs_test", model, dt, datadir=str(tmp_path))
        s1 = exp.run(1, days=2)
        s2 = exp.run(2, days=2)

        # diagnostics exist and parse
        from scipy.io import netcdf_file
        path = os.path.join(str(tmp_path), "hs_test", "run0001", "atmos_daily.nc")
        with netcdf_file(path, "r", mmap=False) as nc:
            temp = nc.variables["temp"][:]
            assert temp.shape[0] == 2          # two daily records
            assert np.isfinite(temp).all()
            assert 150 < temp.mean() < 320
            assert nc.variables["ps"][:].shape[-2:] == (32, 64)

        # restart chain: run 2 started from run 1's end state
        from isca_tpu.io.restart import load_restart
        s_re = load_restart(
            os.path.join(str(tmp_path), "hs_test", "restarts", "res0001.npz"),
            model.initial_state(),
        )
        np.testing.assert_array_equal(np.asarray(s_re.tg.curr), np.asarray(s1.tg.curr))

    def test_restart_equivalence(self, tmp_path):
        """Two 1-day segments == one 2-day run (trip-test analogue, exact)."""
        mk = lambda: HeldSuarezModel(HeldSuarezConfig(core=PrimitiveConfig(
            resolution="T21", num_levels=8, dt=1800.0, dtype=jnp.float64)))
        model = mk()
        exp = Experiment("chain", model, None, datadir=str(tmp_path))
        exp.run(1, days=1)
        s_chained = exp.run(2, days=1)

        model2 = mk()
        s = model2.initial_state()
        s_direct = jax.jit(lambda s: model2.run(s, 96))(s)  # 2 days straight
        np.testing.assert_allclose(
            np.asarray(s_chained.tg.curr), np.asarray(s_direct.tg.curr), atol=1e-9
        )


class TestTimeInterp:
    def test_periodic_monthly(self):
        from isca_tpu.utils.time_interp import monthly_climatology
        vals = np.arange(12.0)[:, None]  # 12 "months", trivial field
        ts = monthly_climatology(vals, dtype=jnp.float64)
        year = 360 * 86400.0
        # mid-January == record 0
        np.testing.assert_allclose(float(ts.at(0.5 * 30 * 86400.0)[0]), 0.0, atol=1e-6)
        # between Jan and Feb centers
        v = float(ts.at(30 * 86400.0)[0])
        assert 0.4 < v < 0.6
        # December -> January wrap: halfway between the Dec (11) and Jan (0) values
        v = float(ts.at(year - 1.0)[0])
        np.testing.assert_allclose(v, 5.5, atol=0.01)
        # periodicity: one year later identical
        np.testing.assert_allclose(
            float(ts.at(45 * 86400.0)[0]), float(ts.at(45 * 86400.0 + year)[0]),
            rtol=1e-6)

    def test_nonperiodic_timeseries(self):
        from isca_tpu.utils.time_interp import TimeSeries
        ts = TimeSeries(
            data=jnp.asarray([300.0, 400.0, 600.0]),
            times=jnp.asarray([0.0, 100.0, 200.0]),
            periodic=False, period_seconds=0.0)
        np.testing.assert_allclose(float(ts.at(50.0)), 350.0, rtol=1e-6)
        np.testing.assert_allclose(float(ts.at(250.0)), 600.0, rtol=1e-6)  # clamped

    def test_variable_co2_model(self):
        """variable_co2_grey equivalent: byrne radiation with a CO2 ramp."""
        from isca_tpu.utils.time_interp import TimeSeries
        from tests.test_moist_model import small_model
        from isca_tpu.physics.two_stream_gray import TwoStreamConfig
        model = small_model(radiation=TwoStreamConfig(rad_scheme="byrne"))
        model.physics.co2_series = TimeSeries(
            data=jnp.asarray([360.0, 720.0]),
            times=jnp.asarray([0.0, 30 * 86400.0]),
            periodic=False, period_seconds=0.0)
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 48))(s)
        assert np.isfinite(float(model.diagnostics(s)["tmax"]))

    def test_prescribed_sst_model(self):
        """realistic_continents_fixed_sst equivalent: APE analytic SSTs."""
        from tests.test_moist_model import small_model
        import dataclasses
        from isca_tpu.physics.mixed_layer import MixedLayerConfig
        model = small_model(mixed_layer=MixedLayerConfig(do_ape_sst=True))
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 48))(s)
        ts = np.asarray(s.t_surf)
        lats = np.degrees(np.asarray(model.core.T.lats))
        eq = ts[np.abs(lats) < 10].mean()
        pole = ts[np.abs(lats) > 70].mean()
        assert eq > 295.0 and abs(pole - 273.15) < 1.0


class TestEventsAndLogging:
    def _model(self):
        return HeldSuarezModel(HeldSuarezConfig(core=PrimitiveConfig(
            resolution="T21", num_levels=8, dt=1800.0, dtype=jnp.float64)))

    def test_event_hooks_and_json_logging(self, tmp_path):
        import json
        exp = Experiment("events", self._model(), None, datadir=str(tmp_path),
                         json_logging=True)
        seen = []
        exp.on("run:ready", lambda e, i: seen.append(("ready", i)))
        exp.on("run:progress", lambda e, i, d: seen.append(("progress", d)))

        @exp.on("run:complete")
        def _done(e, i):
            seen.append(("complete", i))

        exp.run(1, days=1)
        kinds = [k for k, _ in seen]
        assert kinds[0] == "ready" and kinds[-1] == "complete"
        assert "progress" in kinds

        path = os.path.join(str(tmp_path), "events", "run0001", "steps.jsonl")
        rows = [json.loads(l) for l in open(path)]
        assert rows and rows[-1]["day"] == pytest.approx(1.0)
        assert 150 < rows[-1]["tmin"] <= rows[-1]["tmax"] < 500
        assert rows[-1]["mean_ps"] == pytest.approx(101325.0, rel=1e-3)

    def test_failed_run_event(self, tmp_path):
        """Non-finite diagnostics abort with FailedRunError + run:failed."""
        from isca_tpu.utils.events import FailedRunError
        model = self._model()
        exp = Experiment("fail", model, None, datadir=str(tmp_path),
                         json_logging=True)
        failed = []
        exp.on("run:failed", lambda e, i: failed.append(i))
        real_diag = model.diagnostics
        model.diagnostics = lambda s: {**real_diag(s), "tmin": float("nan")}
        with pytest.raises(FailedRunError):
            exp.run(1, days=1)
        assert failed == [1]


class TestChksum:
    def test_layout_independent(self):
        from isca_tpu.utils.chksum import chksum, combined_chksum, tree_chksum
        x = np.arange(4096, dtype=np.float32).reshape(64, 64) * 1.7
        assert chksum(x) == chksum(x.reshape(16, 256))
        assert chksum(x) == chksum(jnp.asarray(x))
        assert chksum(x) != chksum(x + 1.0)
        tree = {"a": x, "b": {"c": x[:2]}}
        d = tree_chksum(tree)
        assert len(d) == 2 and all(isinstance(v, int) for v in d.values())
        assert combined_chksum(tree) == combined_chksum(
            {"a": x.copy(), "b": {"c": x[:2].copy()}})

    def test_golden_round_trip(self, tmp_path):
        from isca_tpu.utils.chksum import check_golden, save_golden
        tree = {"t": np.linspace(0, 1, 100), "u": np.ones((3, 4))}
        p = str(tmp_path / "golden.json")
        save_golden(p, tree)
        assert check_golden(p, tree) == []
        tree["u"][0, 0] = 2.0
        assert check_golden(p, tree) == ["['u']"]

    def test_complex_state(self):
        from isca_tpu.utils.chksum import chksum
        z = np.exp(1j * np.linspace(0, 3, 50)).astype(np.complex128)
        assert chksum(z) == chksum(z.copy())
        z2 = z.copy(); z2[3] += 1e-12
        assert chksum(z) != chksum(z2)


class TestRestartResolutionChange:
    def test_t21_restart_continues_at_t42(self):
        """scripts/change_horizontal_resolution_of_restart_file parity:
        spin up at T21, convert the restart to T42, continue stably."""
        from isca_tpu.io.restart import change_resolution
        mk = lambda res: HeldSuarezModel(HeldSuarezConfig(
            core=PrimitiveConfig(resolution=res, num_levels=8, dt=1200.0,
                                 dtype=jnp.float64)))
        m21, m42 = mk("T21"), mk("T42")
        s21 = jax.jit(lambda s: m21.run(s, 144))(m21.initial_state())
        s42 = change_resolution(s21, m21.core.T, m42.core.T,
                                m42.initial_state())
        # large-scale state preserved: global-mean ps and T
        import isca_tpu.spectral.transforms as tr
        ps21 = float(tr.area_weighted_mean(m21.core.T, s21.psg.curr))
        ps42 = float(tr.area_weighted_mean(m42.core.T, s42.psg.curr))
        assert abs(ps21 - ps42) < 1e-3 * ps21
        # continues stably at the new resolution
        s42b = jax.jit(lambda s: m42.run(s, 24, first=False))(s42)
        tg = np.asarray(s42b.tg.curr)
        assert np.isfinite(tg).all() and 150 < tg.min() < tg.max() < 350


class TestValidityGuard:
    """valid_range_t guard + graceful shutdown (spectral_dynamics.F90:940-1005)."""

    def test_check_range_locates_extrema(self):
        from isca_tpu.utils.validity import check_range, describe_violation
        f = np.full((4, 5, 6), 250.0)
        f[2, 3, 1] = 90.0      # below range
        f[1, 0, 5] = 510.0     # above range
        rep = jax.jit(lambda x: check_range(x, 100.0, 500.0))(jnp.asarray(f))
        assert not bool(rep.ok)
        assert float(rep.vmin) == 90.0 and float(rep.vmax) == 510.0
        assert tuple(np.asarray(rep.min_idx)) == (2, 3, 1)
        assert tuple(np.asarray(rep.max_idx)) == (1, 0, 5)
        lats = np.deg2rad(np.linspace(-60, 60, 5))
        lons = np.deg2rad(np.linspace(0, 300, 6))
        msg = describe_violation("temperature", rep, 100.0, 500.0,
                                 lats=lats, lons=lons)
        assert "90.000" in msg and "510.000" in msg
        assert "level 2" in msg and "lat 30.00" in msg

        ok = jax.jit(lambda x: check_range(x, 100.0, 500.0))(
            jnp.full((3, 3), 250.0))
        assert bool(ok.ok)

    def test_model_validity_methods(self):
        model = HeldSuarezModel(HeldSuarezConfig(core=PrimitiveConfig(
            resolution="T21", num_levels=8, dt=1800.0, dtype=jnp.float64)))
        s = model.initial_state()
        assert bool(model.validity(s).ok)     # isothermal 264 K is valid
        assert model.validity_range == (100.0, 500.0)

    def test_experiment_aborts_with_located_extremum(self, tmp_path):
        """A run whose temperature leaves valid_range_t fails with the
        reference's located-extremum message, after flushing diagnostics."""
        import dataclasses
        import pytest
        from isca_tpu.utils.events import FailedRunError

        core = PrimitiveConfig(resolution="T21", num_levels=8, dt=1800.0,
                               dtype=jnp.float64,
                               valid_range_t=(263.9, 264.1))  # absurdly tight
        model = HeldSuarezModel(HeldSuarezConfig(core=core))
        dt = DiagTable().add_file("atmos_daily", 86400)
        dt.add_field("atmos_daily", "dynamics", "temp", time_avg=True)
        exp = Experiment("bad_run", model, dt, datadir=str(tmp_path))
        events = []
        exp.on("run:failed", lambda *a: events.append("failed"))
        with pytest.raises(FailedRunError) as ei:
            exp.run(1, days=2)
        assert "temperature out of valid range" in str(ei.value)
        assert "lat" in str(ei.value)
        assert events == ["failed"]
        # diagnostics flushed before the abort: partial output survives
        path = os.path.join(str(tmp_path), "bad_run", "run0001",
                            "atmos_daily.nc")
        assert os.path.exists(path)


class TestAlertsAndProvenance:
    """codebase.py write_source_control_status + check_disk_space/create_alert
    equivalents (utils/alerts.py)."""

    def test_source_control_status(self, tmp_path):
        from isca_tpu.utils.alerts import write_source_control_status
        out = tmp_path / "git_hash_used.txt"
        s = write_source_control_status(str(out))
        text = out.read_text()
        assert "commit hash used" in text
        assert len(s["commit"]) in (7, 40, len("unknown"), 64) or s["commit"]

    def test_disk_guard_thresholds(self):
        from isca_tpu.utils import alerts
        from isca_tpu.utils.events import EventEmitter
        em = EventEmitter()
        events = []
        em.on("disk:low", lambda *a: events.append(a))
        free = alerts.check_disk_space("/", limit_gb=0.0, cutoff_gb=0.0)
        assert free > 0 and events == []
        # force the warn path
        alerts.check_disk_space("/", limit_gb=1e9, cutoff_gb=0.0, emitter=em)
        assert len(events) == 1 and events[0][2] is False
        import pytest
        with pytest.raises(alerts.DiskSpaceError):
            alerts.check_disk_space("/", limit_gb=1e9, cutoff_gb=1e9, emitter=em)
        assert events[-1][2] is True

    def test_email_hook_fires_on_failure(self, tmp_path, monkeypatch):
        from isca_tpu.utils import alerts
        from isca_tpu.utils.events import FailedRunError
        sent = []
        monkeypatch.setattr(alerts, "send_email",
                            lambda rcpt, msg, **kw: sent.append((rcpt, msg)))
        core = PrimitiveConfig(resolution="T21", num_levels=8, dt=1800.0,
                               dtype=jnp.float64,
                               valid_range_t=(263.9, 264.1))
        model = HeldSuarezModel(HeldSuarezConfig(core=core))
        exp = Experiment("alert_run", model, None, datadir=str(tmp_path))
        alerts.email_on_failure(exp, "user@example.com")
        import pytest
        with pytest.raises(FailedRunError):
            exp.run(1, days=1)
        assert sent and sent[0][0] == "user@example.com"
        assert "FAILED" in sent[0][1]
        # provenance file written before the abort
        assert os.path.exists(os.path.join(
            str(tmp_path), "alert_run", "run0001", "git_hash_used.txt"))


class TestLogProgressDerive:
    def test_colored_formatter(self):
        import logging
        from isca_tpu.utils.loghandler import ColoredFormatter, enable_colored_logging
        rec = logging.LogRecord("isca_tpu", logging.WARNING, "x", 1, "hi", (), None)
        colored = ColoredFormatter(use_color=True).format(rec)
        plain = ColoredFormatter(use_color=False).format(rec)
        assert "\033[33m" in colored and "hi" in colored
        assert "\033" not in plain
        log = enable_colored_logging()
        n = len(log.handlers)
        assert enable_colored_logging() is log          # idempotent
        assert len(log.handlers) == n

    def test_exp_progress_and_derive(self, tmp_path):
        import io
        from isca_tpu.utils.loghandler import exp_progress
        model = HeldSuarezModel(HeldSuarezConfig(core=PrimitiveConfig(
            resolution="T21", num_levels=8, dt=1800.0, dtype=jnp.float64)))
        exp = Experiment("prog_test", model, None, datadir=str(tmp_path))
        buf = io.StringIO()
        with exp_progress(exp, description="t", out=buf) as p:
            p._bar = None      # force the plain-stream path even if tqdm exists
            exp.run(1, days=1)
        assert not exp._events.get("run:progress")      # handler detached
        d = exp.derive("prog_test_derived")
        assert d.model is exp.model
        assert d.datadir.endswith("prog_test_derived")
        d.run(1, days=1)

    def test_prune_restarts(self, tmp_path):
        model = HeldSuarezModel(HeldSuarezConfig(core=PrimitiveConfig(
            resolution="T21", num_levels=8, dt=1800.0, dtype=jnp.float64)))
        exp = Experiment("prune_test", model, None, datadir=str(tmp_path))
        rdir = os.path.join(str(tmp_path), "prune_test", "restarts")
        for i in range(1, 8):
            open(os.path.join(rdir, f"res{i:04d}.npz"), "wb").close()
        deleted = exp.prune_restarts(keep_every=3, keep_last=1)
        left = sorted(os.listdir(rdir))
        assert left == ["res0003.npz", "res0006.npz", "res0007.npz"], left
        assert len(deleted) == 4
