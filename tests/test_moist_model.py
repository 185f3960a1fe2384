"""Integration tests for the grey-radiation moist aquaplanet (Frierson tier)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from isca_tpu.dycore.primitive import PrimitiveConfig
from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
from isca_tpu.physics.moist_driver import MoistPhysicsConfig
from isca_tpu.physics.two_stream_gray import TwoStreamConfig


def small_model(**phys_kw):
    core = PrimitiveConfig(
        resolution="T21", num_levels=12, dt=1200.0, dtype=jnp.float64,
        vert_coord_option="uneven_sigma",
        vert_coord_kwargs=(("scale_heights", 6.0), ("surf_res", 0.5), ("exponent", 7.5)),
        do_water_correction=True, water_correction_limit=200.0e2,
        robert_coeff=0.03,
    )
    phys = MoistPhysicsConfig(**phys_kw) if phys_kw else MoistPhysicsConfig()
    return GreyMoistModel(GreyMoistConfig(core=core, physics=phys))


class TestGreyMoist:
    def test_five_day_spinup(self):
        model = small_model()
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 72 * 5))(s)
        d = model.diagnostics(s)
        assert np.isfinite(float(d["tmax"]))
        assert 150.0 < float(d["tmin"]) and float(d["tmax"]) < 350.0
        # ocean evaporates into an initially dry atmosphere
        assert float(d["total_water"]) > 1.0
        assert float(d["qmin"]) > -1e-6   # positivity (van Leer + fixer)
        assert abs(float(d["mean_ps"]) - 101325.0) < 2.0
        # slab ocean stays in a sane range
        assert 270.0 < float(d["mean_t_surf"]) < 300.0

    def test_seasonal_insolation_runs(self):
        model = small_model(
            radiation=TwoStreamConfig(do_seasonal=True, use_time_average_coszen=True)
        )
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 48))(s)
        assert np.isfinite(float(model.diagnostics(s)["tmax"]))

    def test_byrne_radiation_runs(self):
        model = small_model(radiation=TwoStreamConfig(rad_scheme="byrne"))
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 48))(s)
        assert np.isfinite(float(model.diagnostics(s)["tmax"]))

    def test_f32(self):
        core = PrimitiveConfig(
            resolution="T21", num_levels=12, dt=1200.0, dtype=jnp.float32,
            do_water_correction=True, robert_coeff=0.03,
        )
        model = GreyMoistModel(GreyMoistConfig(core=core))
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 72))(s)
        assert np.isfinite(float(model.diagnostics(s)["tmax"]))


class TestLandAndBucket:
    def test_bucket_continents_run(self):
        from isca_tpu.utils.topography import land_mask, gaussian_topography
        import numpy as np
        from isca_tpu.physics.moist_driver import MoistPhysicsConfig

        model = small_model(bucket=True)
        T = model.core.T
        lats = np.degrees(np.asarray(T.lats))
        lons = np.degrees(np.asarray(T.lons))
        lm = land_mask(lons, lats, "continents")
        topo = gaussian_topography(lons, lats, height=1500.0, olon=60.0, olat=45.0) * lm
        model.set_land(lm, surf_geopotential=topo)
        s = model.initial_state()
        # land starts with the land bucket depth
        bd = np.asarray(s.bucket_depth.curr)
        assert bd[lm > 0.5].max() <= 20.0 + 1e-6
        assert bd[lm < 0.5].min() >= 999.0
        s = jax.jit(lambda s: model.run(s, 72 * 2))(s)
        d = model.diagnostics(s)
        assert np.isfinite(float(d["tmax"]))
        bd = np.asarray(s.bucket_depth.curr)
        assert np.isfinite(bd).all()
        assert bd.min() >= 0.0
        # land buckets clamped at max depth
        assert bd[lm > 0.5].max() <= 0.15 + 20.0  # may not have rained down yet


class TestDtRadSubstepping:
    """rrtm_radiation_nml dt_rad parity: radiation recomputed every dt_rad
    seconds, stored heating/fluxes reused in between."""

    def _build(self, dt_rad):
        import dataclasses
        from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
        cfg = GreyMoistConfig()
        cfg = dataclasses.replace(
            cfg,
            core=dataclasses.replace(cfg.core, resolution="T21",
                                     num_levels=12),
            physics=dataclasses.replace(cfg.physics, dt_rad=dt_rad))
        return GreyMoistModel(cfg)

    def test_dt_rad_equal_dt_is_identity(self):
        import numpy as np
        m0, m1 = self._build(0.0), self._build(720.0)
        s0, s1 = m0.initial_state(), m1.initial_state()
        s0 = m0.step(s0, first=True); s1 = m1.step(s1, first=True)
        for _ in range(3):
            s0 = m0.step(s0); s1 = m1.step(s1)
        np.testing.assert_allclose(np.asarray(s0.dyn.tg.curr),
                                   np.asarray(s1.dyn.tg.curr), rtol=1e-6)

    def test_substepped_radiation_held_between_calls(self):
        import numpy as np
        m = self._build(4 * 720.0)
        s = m.initial_state()
        s = m.step(s, first=True)
        olr0 = np.asarray(s.rad_cache.olr).copy()
        s = m.step(s)   # within the hold window: cache unchanged
        np.testing.assert_allclose(np.asarray(s.rad_cache.olr), olr0)
        ages = [int(s.rad_cache.age)]
        for _ in range(4):
            s = m.step(s)
            ages.append(int(s.rad_cache.age))
        # the age counter cycles with period n_rad=4
        assert 1 in ages and max(ages) == 4
        tg = np.asarray(s.dyn.tg.curr)
        assert np.isfinite(tg).all()


class TestRadiationLonstep:
    """rrtm_radiation_nml lonstep / do_zm_rad / do_zm_tracers parity."""

    def _build(self, **rad_kw):
        import dataclasses
        from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
        from isca_tpu.physics.rrtm_radiation import RRTMConfig
        cfg = GreyMoistConfig()
        cfg = dataclasses.replace(
            cfg,
            core=dataclasses.replace(cfg.core, resolution="T21",
                                     num_levels=12),
            physics=dataclasses.replace(
                cfg.physics, radiation_scheme="rrtm",
                rrtm=RRTMConfig(use_time_average_coszen=True, **rad_kw)))
        return GreyMoistModel(cfg)

    def test_lon_expand_linear_toroidal(self):
        from isca_tpu.physics.rrtm_radiation import _lon_expand
        a = jnp.asarray(np.arange(8.0).reshape(2, 4))   # (lat=2, lon=4)
        out = np.asarray(_lon_expand(a, 2))
        assert out.shape == (2, 8)
        # positions 2*i are the subsampled values exactly
        np.testing.assert_allclose(out[:, ::2], np.asarray(a))
        # midpoints are averages; last midpoint wraps toroidally
        np.testing.assert_allclose(out[0, 1], 0.5)
        np.testing.assert_allclose(out[0, 7], 0.5 * (3.0 + 0.0))

    def test_lonstep_close_to_full_and_cheap_shapes(self):
        m1 = self._build()
        m2 = self._build(lonstep=2)
        s1, s2 = m1.initial_state(), m2.initial_state()
        s1 = m1.step(s1, first=True)
        s2 = m2.step(s2, first=True)
        t1 = np.asarray(s1.dyn.tg.curr)
        t2 = np.asarray(s2.dyn.tg.curr)
        assert t2.shape == t1.shape and np.isfinite(t2).all()
        # zonally quasi-uniform initial state: the subsampled radiation
        # reproduces the full computation closely after one step
        np.testing.assert_allclose(t2, t1, rtol=0, atol=0.05)

    def test_zm_rad_is_zonally_uniform_heating(self):
        m = self._build(do_zm_rad=True, do_zm_tracers=True)
        s = m.initial_state()
        s, diag = m.step_with_diagnostics(s, first=True)
        tdt = np.asarray(diag["tdt_rad"])      # (lat, lon, L) level-last
        assert np.isfinite(tdt).all()
        # radiative heating is zonally constant under do_zm_rad
        spread = np.ptp(tdt, axis=1).max()
        scale = np.abs(tdt).max()
        assert spread <= 1e-6 * max(scale, 1e-30), (spread, scale)


class TestFriersonTestCaseConfig:
    """The faithful Frierson-2006 configuration (reference
    frierson_test_case.py) — its thin 'input' sigma ladder exposed a
    catastrophic log-cancellation in the Simmons-Burridge full-level
    pressures on TPU (negative layer thicknesses -> vert_diff blow-up);
    pressure_variables now uses log1p. These guard that property."""

    def test_builds_and_steps_finite(self):
        import jax
        import jax.numpy as jnp

        from isca_tpu.models.moist import (GreyMoistModel,
                                           frierson_test_case_config)

        m = GreyMoistModel(frierson_test_case_config())
        s = m.initial_state()
        s = jax.jit(lambda s: m.run(s, 6, first=True))(s)
        assert bool(jnp.isfinite(s.dyn.tg.curr).all())
        assert bool(jnp.isfinite(s.t_surf).all())

    def test_f32_layer_thickness_positive(self):
        """f32 pressure variables on the Frierson ladder must give strictly
        increasing full-level pressures and positive layer thicknesses, and
        alpha must match the f64 computation to f32 roundoff (the log-diff
        formulation amplified log error ~p/dp times)."""
        import numpy as np

        from isca_tpu.dycore import press_geopot as pg
        from isca_tpu.models.moist import FRIERSON_BK

        bk = np.asarray(FRIERSON_BK)
        pk = np.zeros_like(bk)
        ps64 = np.array([101325.0, 96000.0, 107000.0])
        _, _, pf64, lpf64 = pg.pressure_variables(np, pk, bk, ps64, True)
        _, _, pf32, lpf32 = pg.pressure_variables(
            np, pk.astype(np.float32), bk.astype(np.float32),
            ps64.astype(np.float32), True)
        assert (np.diff(pf32, axis=-1) > 0).all()
        np.testing.assert_allclose(lpf32, lpf64, atol=5e-6)

    def test_geopotential_log1p_path_matches(self):
        import numpy as np

        from isca_tpu.dycore import press_geopot as pg
        from isca_tpu.models.moist import FRIERSON_BK

        bk = np.asarray(FRIERSON_BK)
        pk = np.zeros_like(bk)
        ps = np.array([101325.0])
        ph, lph, pf, lpf = pg.pressure_variables(np, pk, bk, ps, True)
        t = np.full((1, len(bk) - 1), 280.0)
        zs = np.zeros(1)
        gf_a, gh_a = pg.compute_geopotential(np, 287.04, t, lph, lpf, zs, True)
        gf_b, gh_b = pg.compute_geopotential(np, 287.04, t, lph, lpf, zs, True,
                                             p_half=ph)
        np.testing.assert_allclose(gf_b, gf_a, rtol=1e-12)
        np.testing.assert_allclose(gh_b, gh_a, rtol=1e-12)
        # thicknesses strictly positive
        assert (np.diff(gf_b[0]) < 0).all()
