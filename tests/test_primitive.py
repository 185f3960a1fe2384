"""Tests for the primitive-equation core and Held-Suarez model (SURVEY.md stage 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isca_tpu.dycore import press_geopot as pg
from isca_tpu.dycore import vert_advection as va
from isca_tpu.dycore import vert_coordinate as vc
from isca_tpu.dycore.primitive import PrimitiveConfig
from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel
from isca_tpu.physics.hs_forcing import HSForcingConfig


def hs_model(resolution="T21", num_levels=12, dt=1200.0, **kw):
    core = PrimitiveConfig(
        resolution=resolution, num_levels=num_levels, dt=dt, dtype=jnp.float64, **kw
    )
    return HeldSuarezModel(HeldSuarezConfig(core=core))


class TestVertCoord:
    def test_even_sigma(self):
        pk, bk = vc.compute_vert_coord("even_sigma", 10)
        assert pk[0] == 0 and bk[0] == 0 and bk[-1] == 1.0
        np.testing.assert_allclose(np.diff(bk), 0.1)

    def test_uneven_sigma_monotone(self):
        pk, bk = vc.compute_vert_coord(
            "uneven_sigma", 25, scale_heights=6.0, surf_res=0.5, exponent=7.5
        )
        assert bk[0] == 0 and bk[-1] == 1.0
        assert (np.diff(bk) > 0).all()

    def test_hybrid_monotone_pressure(self):
        pk, bk = vc.compute_vert_coord("hybrid", 30)
        p = pk + bk * 101325.0
        assert (np.diff(p) > 0).all()
        assert bk[0] == 0.0  # pure pressure at top

    def test_mcm_and_v197_ladders(self):
        # fixed ladders (vert_coordinate.F90:276-311) with strict level counts
        pk, bk = vc.compute_vert_coord("mcm", 14)
        assert bk[0] == 0.0 and bk[-1] == 1.0 and (np.diff(bk) > 0).all()
        assert (pk == 0).all()
        pk, bk = vc.compute_vert_coord("v197", 18)
        assert bk.size == 19 and (np.diff(bk) > 0).all()
        import pytest
        with pytest.raises(ValueError):
            vc.compute_vert_coord("mcm", 20)


class TestPressGeopot:
    def test_pressure_consistency(self):
        pk, bk = vc.compute_vert_coord("even_sigma", 8)
        ps = np.full((4, 4), 1.0e5)
        ph, lph, pf, lpf = pg.pressure_variables(np, pk, bk, ps, True)
        assert ph.shape == (4, 4, 9)
        np.testing.assert_allclose(ph[..., -1], 1.0e5)
        # full pressures between their half levels
        assert (pf[..., 1:] > ph[..., 1:-1]).all() and (pf < ph[..., 1:]).all()
        np.testing.assert_allclose(np.exp(lpf), pf, rtol=1e-12)

    def test_isothermal_geopotential(self):
        # For isothermal T, Phi = Phi_s + R T ln(ps/p).
        pk, bk = vc.compute_vert_coord("even_sigma", 20)
        ps = np.full((2, 2), 1.0e5)
        T0, R = 280.0, 287.04
        ph, lph, pf, lpf = pg.pressure_variables(np, pk, bk, ps, True)
        t = np.full(pf.shape, T0)
        phi_full, phi_half = pg.compute_geopotential(np, R, t, lph, lpf, np.zeros((2, 2)), True)
        expected = R * T0 * (np.log(1.0e5) - lpf)
        np.testing.assert_allclose(phi_full, expected, rtol=1e-12)

    def test_mcm_pressure_variables(self):
        """vert_difference_option='mcm': full level = mean of half levels
        (press_and_geopot.F90:196-210)."""
        pk, bk = vc.compute_vert_coord("mcm", 14)
        ps = np.full((3, 2), 9.8e4)
        ph, lph, pf, lpf = pg.pressure_variables(np, pk, bk, ps,
                                                 bool(pk[0] == 0 and bk[0] == 0),
                                                 option="mcm")
        np.testing.assert_allclose(pf, 0.5 * (ph[..., 1:] + ph[..., :-1]),
                                   rtol=1e-14)
        np.testing.assert_allclose(np.exp(lpf), pf, rtol=1e-12)
        import pytest
        with pytest.raises(ValueError):
            pg.pressure_variables(np, pk, bk, ps, True, option="bogus")


class TestVertAdvection:
    def test_uniform_field_no_tendency(self):
        w = np.random.default_rng(0).standard_normal((3, 3, 9))
        w[..., 0] = w[..., -1] = 0.0
        dp = np.ones((3, 3, 8))
        r = np.full((3, 3, 8), 5.0)
        for scheme in (va.SECOND_CENTERED, va.SECOND_CENTERED_WTS,
                       va.FOURTH_CENTERED, va.FOURTH_CENTERED_WTS,
                       va.VAN_LEER_LINEAR, va.FINITE_VOLUME_PARABOLIC):
            out = np.asarray(va.vert_advection(100.0, jnp.asarray(w), jnp.asarray(dp),
                                               jnp.asarray(r), scheme))
            np.testing.assert_allclose(out, 0.0, atol=1e-12, err_msg=scheme)

    def test_linear_profile_centered(self):
        # constant w, linear r in p: advective tendency = -w dr/dp exactly for centered
        L = 12
        w = np.full((1, 1, L + 1), 2.0)
        dp = np.full((1, 1, L), 10.0)
        r = np.arange(L, dtype=float).reshape(1, 1, L) * 3.0  # dr/dp = 0.3
        out = np.asarray(va.vert_advection(1.0, jnp.asarray(w), jnp.asarray(dp),
                                           jnp.asarray(r), va.SECOND_CENTERED))
        np.testing.assert_allclose(out[0, 0, 1:-1], -2.0 * 0.3, rtol=1e-12)

    def test_fourth_centered_exact_for_cubic(self):
        # 4th-order interface interpolation is exact for cubics sampled on a
        # uniform ladder: advective tendency of r = k^3 equals -w dr/dp at
        # interfaces (vert_advection.F90:239-273)
        L = 12
        w = np.full((1, 1, L + 1), 2.0)
        dp = np.full((1, 1, L), 1.0)
        k = np.arange(L, dtype=float)
        r = (k**2).reshape(1, 1, L)
        out = np.asarray(va.vert_advection(1.0, jnp.asarray(w), jnp.asarray(dp),
                                           jnp.asarray(r), va.FOURTH_CENTERED))
        # interior cells away from the 2nd-order boundary interfaces
        expect = -2.0 * 2.0 * k  # -w dr/dp, dr/dp = 2k
        np.testing.assert_allclose(out[0, 0, 2:-2], expect[2:-2], rtol=1e-12)

    def test_fourth_wts_matches_fourth_on_uniform(self):
        L = 10
        rng = np.random.default_rng(3)
        w = rng.standard_normal((2, 2, L + 1))
        w[..., 0] = w[..., -1] = 0.0
        dp = np.full((2, 2, L), 7.0)
        r = rng.standard_normal((2, 2, L))
        a = np.asarray(va.vert_advection(1.0, jnp.asarray(w), jnp.asarray(dp),
                                         jnp.asarray(r), va.FOURTH_CENTERED))
        b = np.asarray(va.vert_advection(1.0, jnp.asarray(w), jnp.asarray(dp),
                                         jnp.asarray(r), va.FOURTH_CENTERED_WTS))
        np.testing.assert_allclose(a, b, atol=1e-12)


class TestHeldSuarez:
    def test_cold_start_balanced(self):
        model = hs_model()
        s = model.initial_state()
        assert float(jnp.abs(s.ug.curr).max()) < 2.0  # tiny seed winds only
        mean_ps = float(model.diagnostics(s)["mean_ps"])
        assert abs(mean_ps - 101325.0) < 1.0

    def test_short_run_stable(self):
        model = hs_model()
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 48))(s)  # 16 hours
        d = model.diagnostics(s)
        assert np.isfinite(float(d["umax"]))
        assert 100.0 < float(d["tmin"]) and float(d["tmax"]) < 500.0
        assert abs(float(d["mean_ps"]) - 101325.0) < 1.0  # mass fixer

    def test_energy_fixer_conserves_when_unforced(self):
        # With forcing off (no_forcing equivalent: zero tendencies), total energy
        # (KE + cp T) is fixed exactly by the energy corrector.
        model = hs_model()
        model.forcing = lambda u, v, t, p, ps: __import__(
            "isca_tpu.dycore.primitive", fromlist=["GridTendencies"]
        ).GridTendencies()
        s = model.initial_state()
        e0 = float(model.diagnostics(s)["energy"])
        s = jax.jit(lambda s: model.run(s, 24))(s)
        e1 = float(model.diagnostics(s)["energy"])
        assert abs(e1 - e0) / e0 < 1e-10

    def test_ten_day_spinup_develops_jets(self):
        # The classic HS spin-up: baroclinic instability should begin producing
        # westerly midlatitude jets within ~20 days. Use T21L12 for speed.
        model = hs_model(dt=1800.0)
        s = model.initial_state()
        run5d = jax.jit(lambda s, first: model.run(s, 240, first=first), static_argnums=1)
        s = run5d(s, True)
        for _ in range(3):
            s = run5d(s, False)   # 20 days total
        d = model.diagnostics(s)
        u_zonal = np.asarray(d["u_zonal"])  # (L, lat)
        assert np.isfinite(u_zonal).all()
        lats = np.degrees(np.asarray(model.core.T.lats))
        midlat = (np.abs(lats) > 30) & (np.abs(lats) < 60)
        # upper-level (lowest index third) midlatitude winds are westerly
        upper = u_zonal[: model.config.core.num_levels // 3]
        assert upper[:, midlat].mean() > 2.0, upper[:, midlat].mean()
        # temperature within valid range the whole time (would have NaN'd else)
        assert 100.0 < float(d["tmin"]) and float(d["tmax"]) < 500.0

    def test_uneven_sigma_hs(self):
        model = hs_model(
            vert_coord_option="uneven_sigma",
            vert_coord_kwargs=(("scale_heights", 6.0), ("surf_res", 0.5), ("exponent", 7.5)),
        )
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 24))(s)
        assert np.isfinite(float(model.diagnostics(s)["umax"]))

    def test_f32_matches_f64_short(self):
        cfg64 = PrimitiveConfig(resolution="T21", num_levels=8, dt=1200.0, dtype=jnp.float64)
        cfg32 = dataclasses_replace(cfg64, dtype=jnp.float32)
        m64 = HeldSuarezModel(HeldSuarezConfig(core=cfg64))
        m32 = HeldSuarezModel(HeldSuarezConfig(core=cfg32))
        s64 = jax.jit(lambda s: m64.run(s, 12))(m64.initial_state())
        s32 = jax.jit(lambda s: m32.run(s, 12))(m32.initial_state())
        t64 = np.asarray(s64.tg.curr)
        t32 = np.asarray(s32.tg.curr)
        np.testing.assert_allclose(t32, t64, atol=0.05)  # K, after 12 steps


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


class TestJablonowski2006:
    """Baroclinic-wave test case (Jablonowski & Williamson 2006)."""

    def _core(self, res="T42", L=20):
        from isca_tpu.dycore.primitive import PrimitiveConfig, PrimitiveCore
        cfg = PrimitiveConfig(resolution=res, num_levels=L, dt=600.0,
                              dtype=jnp.float64, do_energy_correction=False)
        return PrimitiveCore(cfg)

    def test_balanced_state_stays_steady(self):
        from isca_tpu.dycore.initial_conditions import (
            Jablonowski2006Config, apply_jablonowski_2006)
        from isca_tpu.dycore.primitive import GridTendencies
        core = self._core("T21", 12)
        state, zs = apply_jablonowski_2006(core, Jablonowski2006Config(Up=0.0))
        v0 = float(jnp.abs(state.vg.curr).max())
        assert v0 < 0.5  # balanced: nearly zero meridional wind

        def run(s, n):
            s = core.dynamics_step(s, GridTendencies(), zs, first=True)
            body = lambda ss, _: (core.dynamics_step(ss, GridTendencies(), zs), None)
            s, _ = jax.lax.scan(body, s, None, length=n - 1)
            return s
        s = jax.jit(lambda s: run(s, 288))(state)  # 2 days
        vmax = float(jnp.abs(s.vg.curr).max())
        assert np.isfinite(vmax)
        assert vmax < 2.0, vmax  # stays near-balanced (truncation-level drift only)

    def test_perturbation_grows_baroclinic_wave(self):
        from isca_tpu.dycore.initial_conditions import (
            Jablonowski2006Config, apply_jablonowski_2006)
        from isca_tpu.dycore.primitive import GridTendencies
        core = self._core("T42", 20)
        state, zs = apply_jablonowski_2006(core, Jablonowski2006Config(Up=1.0))

        def run(s, n, first):
            if first:
                s = core.dynamics_step(s, GridTendencies(), zs, first=True)
                n -= 1
            body = lambda ss, _: (core.dynamics_step(ss, GridTendencies(), zs), None)
            s, _ = jax.lax.scan(body, s, None, length=n)
            return s

        runj = jax.jit(lambda s: run(s, 144 * 2, True))
        s = runj(state)  # day 2
        ps_range_d2 = float(s.psg.curr.max() - s.psg.curr.min())
        run2 = jax.jit(lambda s: run(s, 144 * 2, False))
        for _ in range(3):
            s = run2(s)   # day 8
        ps_range_d8 = float(s.psg.curr.max() - s.psg.curr.min())
        assert np.isfinite(ps_range_d8)
        # the baroclinic wave deepens: published evolution has surface lows of
        # several hPa by day 8 (JW06 Fig. 5-7); require clear growth
        assert ps_range_d8 > 3.0 * ps_range_d2, (ps_range_d2, ps_range_d8)
        assert ps_range_d8 > 500.0, ps_range_d8  # > 5 hPa range by day 8


class TestExternalFileIC:
    """initial condition from a NetCDF file (ic_from_external_file.F90)."""

    def _write_ic(self, path, L, nlat, nlon, order="c"):
        from scipy.io import netcdf_file
        rng = np.random.RandomState(0)
        t = 250.0 + 30.0 * rng.rand(L, nlat, nlon)
        u = 10.0 * rng.rand(L, nlat, nlon)
        v = np.zeros((L, nlat, nlon))
        ps = 1.0e5 + 100.0 * rng.rand(nlat, nlon)
        with netcdf_file(str(path), "w") as nc:
            if order == "c":
                nc.createDimension("pfull", L)
                nc.createDimension("lat", nlat)
                nc.createDimension("lon", nlon)
                dims3, dims2 = ("pfull", "lat", "lon"), ("lat", "lon")
                tw, uw, vw, pw = t, u, v, ps
            else:  # the reference's Fortran (lon, lat, lev) storage
                nc.createDimension("lon", nlon)
                nc.createDimension("lat", nlat)
                nc.createDimension("pfull", L)
                dims3, dims2 = ("lon", "lat", "pfull"), ("lon", "lat")
                tw, uw, vw = (x.transpose(2, 1, 0) for x in (t, u, v))
                pw = ps.T
            nc.createVariable("t", "d", dims3)[:] = tw
            nc.createVariable("u", "d", dims3)[:] = uw
            nc.createVariable("v", "d", dims3)[:] = vw
            nc.createVariable("ps", "d", dims2)[:] = pw
        return t, u, ps

    @pytest.mark.parametrize("order", ["c", "fortran"])
    def test_loads_and_band_limits(self, tmp_path, order):
        from isca_tpu.dycore.initial_conditions import apply_external_file
        from isca_tpu.dycore.primitive import PrimitiveConfig, PrimitiveCore

        cfg = PrimitiveConfig(resolution="T21", num_levels=6, dtype=jnp.float64)
        core = PrimitiveCore(cfg)
        nlat, nlon = core.T.grid_shape
        path = tmp_path / "init_cond.nc"
        t, u, ps = self._write_ic(path, 6, nlat, nlon, order)

        state, zs = apply_external_file(core, str(path))
        # band-limited but close to the input (random fields lose some power at
        # truncation; means must agree tightly)
        np.testing.assert_allclose(
            float(state.tg.curr.mean()), t.mean(), rtol=1e-3)
        np.testing.assert_allclose(
            float(state.psg.curr.mean()), ps.mean(), rtol=1e-4)
        # spectrally consistent: grid vor/div match their spectral synthesis
        from isca_tpu.spectral import transforms as tr
        np.testing.assert_allclose(
            np.asarray(tr.spec_to_grid(core.T, state.vors.curr)),
            np.asarray(state.vorg.curr), atol=1e-12)
        # state steps without blowing up
        from isca_tpu.dycore.primitive import GridTendencies
        s = core.dynamics_step(state, GridTendencies(), zs, first=True)
        assert bool(jnp.isfinite(s.tg.curr).all())

    def test_shape_mismatch_is_error(self, tmp_path):
        from isca_tpu.dycore.initial_conditions import apply_external_file
        from isca_tpu.dycore.primitive import PrimitiveConfig, PrimitiveCore

        cfg = PrimitiveConfig(resolution="T21", num_levels=6, dtype=jnp.float64)
        core = PrimitiveCore(cfg)
        path = tmp_path / "init_cond.nc"
        self._write_ic(path, 6, 10, 20)  # wrong grid
        with pytest.raises(ValueError, match="shape"):
            apply_external_file(core, str(path))

    def test_missing_tracer_is_error(self, tmp_path):
        from isca_tpu.dycore.initial_conditions import apply_external_file
        from isca_tpu.dycore.primitive import (
            PrimitiveConfig, PrimitiveCore, TracerAttr)

        cfg = PrimitiveConfig(resolution="T21", num_levels=6, dtype=jnp.float64)
        core = PrimitiveCore(cfg, tracer_attrs=(TracerAttr(name="sphum"),))
        nlat, nlon = core.T.grid_shape
        path = tmp_path / "init_cond.nc"
        self._write_ic(path, 6, nlat, nlon)
        with pytest.raises(ValueError, match="sphum"):
            apply_external_file(core, str(path))


class TestMCMDifferencing:
    """vert_difference_option='mcm' end-to-end (the reference's
    Manabe-Climate-Model configuration: mcm sigma ladder + mcm differencing
    in pressure_variables/four_in_one/implicit)."""

    def test_mcm_held_suarez_stable(self):
        model = hs_model(num_levels=14, vert_coord_option="mcm",
                         vert_difference_option="mcm")
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 96))(s)   # 32 hours
        d = model.diagnostics(s)
        assert np.isfinite(float(d["umax"]))
        assert 100.0 < float(d["tmin"]) and float(d["tmax"]) < 500.0
        assert abs(float(d["mean_ps"]) - 101325.0) < 1.0

    def test_mcm_differs_from_simmons_burridge(self):
        m1 = hs_model(num_levels=14, vert_coord_option="mcm")
        m2 = hs_model(num_levels=14, vert_coord_option="mcm",
                      vert_difference_option="mcm")
        s1 = jax.jit(lambda s: m1.run(s, 24))(m1.initial_state())
        s2 = jax.jit(lambda s: m2.run(s, 24))(m2.initial_state())
        # same ladder, different differencing -> different trajectories
        dmax = float(jnp.abs(s1.tg.curr - s2.tg.curr).max())
        assert dmax > 1e-6


class TestRhomboidal:
    """triang_trunc=.false. end-to-end: the MCM configuration runs the
    primitive core rhomboidally truncated (spectral_dynamics nml triang_trunc;
    num_total_wavenumbers = T + fourier_inc*M, spectral_dynamics.F90:430-434)."""

    def test_rhomboidal_held_suarez_stable(self):
        model = hs_model(resolution=15, num_levels=12, dt=1200.0,
                         nlon=64, nlat=32, truncation_shape="rhomboidal")
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 48))(s)   # 16 hours
        d = model.diagnostics(s)
        assert np.isfinite(float(d["umax"]))
        assert 100.0 < float(d["tmin"]) and float(d["tmax"]) < 500.0
        assert abs(float(d["mean_ps"]) - 101325.0) < 1.0


class TestHSForcingOptions:
    """hs_forcing equilibrium_t_option='from_file' and
    relax_to_specified_wind (hs_forcing.F90:96-100, 641-655)."""

    def _forcing(self, **kw):
        from isca_tpu.physics.hs_forcing import HSForcing, HSForcingConfig
        lats = jnp.linspace(-1.2, 1.2, 6)
        return HSForcing(HSForcingConfig(**kw), lats), lats

    def test_teq_from_file(self):
        f, lats = self._forcing(equilibrium_t_option="from_file", ks=-1e30, ka=-1e30)
        L, nlat, nlon = 4, 6, 8
        f.teq_field = jnp.full((L, nlat, 1), 250.0)
        t = jnp.full((L, nlat, nlon), 260.0)
        p_full = jnp.broadcast_to(
            jnp.linspace(2e4, 9e4, L)[:, None, None], t.shape)
        psg = jnp.full((nlat, nlon), 1e5)
        g = f(jnp.zeros_like(t), jnp.zeros_like(t), t, p_full, psg)
        # relaxation pulls toward 250 K everywhere: dt_t < 0 uniformly
        assert (np.asarray(g.dt) < 0).all()

    def test_relax_to_specified_wind(self):
        f, lats = self._forcing(relax_to_specified_wind=True, kf=-1.0)
        L, nlat, nlon = 3, 6, 8
        f.u_spec = jnp.full((L, nlat, 1), 10.0)
        f.v_spec = jnp.zeros((L, nlat, 1))
        u = jnp.zeros((L, nlat, nlon))
        v = jnp.zeros((L, nlat, nlon))
        t = jnp.full((L, nlat, nlon), 280.0)
        p_full = jnp.broadcast_to(
            jnp.linspace(2e4, 9e4, L)[:, None, None], u.shape)
        psg = jnp.full((nlat, nlon), 1e5)
        g = f(u, v, t, p_full, psg)
        vkf = 1.0 / 86400.0
        np.testing.assert_allclose(np.asarray(g.du), 10.0 * vkf, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g.dv), 0.0, atol=1e-12)


class TestSpectralDiagnostics:
    """Full 'dynamics' diagnostic set (spectral_dynamics.F90:1709-1860)."""

    def test_extended_fields_present_and_consistent(self):
        model = hs_model()
        s = jax.jit(lambda s: model.run(s, 12))(model.initial_state())
        d = jax.jit(lambda s: model.diag_fields(s, extended=True))(s)
        L = model.core.config.num_levels
        nlat, nlon = model.core.T.grid_shape
        for name in ("pres_full", "height", "wspd", "ucomp_sq", "ucomp_vcomp",
                     "omega_temp", "vcomp_vor", "ucomp_height"):
            assert d[name].shape == (L, nlat, nlon), name
        assert d["pres_half"].shape == (L + 1, nlat, nlon)
        assert d["slp"].shape == (nlat, nlon)
        np.testing.assert_allclose(np.asarray(d["wspd"]),
                                   np.sqrt(np.asarray(d["ucomp"])**2
                                           + np.asarray(d["vcomp"])**2), atol=1e-12)
        np.testing.assert_allclose(np.asarray(d["ucomp_vcomp"]),
                                   np.asarray(d["ucomp"]) * np.asarray(d["vcomp"]),
                                   atol=1e-12)
        # flat topography: slp == ps
        np.testing.assert_allclose(np.asarray(d["slp"]), np.asarray(d["ps"]),
                                   rtol=1e-10)
        # EKE: positive scalar, small vs total KE early in spinup
        assert float(d["EKE"]) >= 0.0 and np.isfinite(float(d["EKE"]))
        assert np.isfinite(float(d["vort_norm"]))
        # heights decrease with level index (level L-1 is the bottom)
        z = np.asarray(d["height"])
        assert (np.diff(z, axis=0) < 0).all()
        stat = model.core.static_diag_fields()
        assert stat["pk"].shape == (L + 1,) and stat["zsurf"].shape == (nlat, nlon)

    def test_slp_with_topography(self):
        # raised topography -> slp > ps over the mountain
        model = hs_model()
        T = model.core.T
        lat2d = np.asarray(T.lats)[:, None] * np.ones((1, T.nlon))
        lon2d = np.ones((T.nlat, 1)) * np.asarray(T.lons)[None, :]
        zs = 2000.0 * np.exp(-((np.degrees(lat2d) - 40) ** 2 / 100.0)
                             - ((np.degrees(lon2d) - 90) ** 2 / 100.0))
        model.surf_geopotential = jnp.asarray(zs * model.core.C.grav, jnp.float64)
        model.core.surf_geopotential = model.surf_geopotential
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 6))(s)
        d = model.diag_fields(s, extended=True)
        ratio = np.asarray(d["slp"]) / np.asarray(d["ps"])
        assert ratio[zs > 500].min() > 1.01
