"""Unit tests for the moist-physics column components (SURVEY.md stage 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isca_tpu.constants import EARTH
from isca_tpu.physics.sat_vapor_pres import SatVaporPres
from isca_tpu.physics.lscale_cond import LscaleCond, LscaleCondConfig
from isca_tpu.physics.qe_moist_convection import QEMoistConvection, QEMoistConvectionConfig
from isca_tpu.physics.two_stream_gray import TwoStreamConfig, TwoStreamGray
from isca_tpu.physics.monin_obukhov import MOConfig, mo_drag
from isca_tpu.physics import astronomy as astro
from isca_tpu.physics.vert_diff import gcm_vert_diff_down, gcm_vert_diff_up
from isca_tpu.physics.mixed_layer import MixedLayerConfig, mixed_layer_step


def column_profile(L=20, ps=1.0e5, t_sfc=295.0, lapse=6.5e-3):
    """A fixed-lapse-rate test column, level-last (1, L)."""
    sigma_half = np.linspace(0.0, 1.0, L + 1)
    p_half = (sigma_half * ps)[None, :]
    p_full = 0.5 * (p_half[:, 1:] + p_half[:, :-1])
    p_full[:, 0] = p_half[:, 1] / 2
    z = 8000.0 * np.log(ps / np.maximum(p_full, 1.0))
    t = np.maximum(t_sfc - lapse * z, 200.0)
    return (jnp.asarray(t), jnp.asarray(p_full), jnp.asarray(p_half), jnp.asarray(z))


def moist_adiabat_column(L=20, ps=1.0e5, t_sfc=300.0, offset=0.3):
    """Environment slightly cooler than the surface parcel's pseudoadiabat
    (small CAPE), with RH decreasing upward -> deep-convective conditions."""
    import math

    svp = SatVaporPres(do_simple=True)
    C = EARTH
    kappa = C.rdgas / C.cp_air
    sigma_half = np.linspace(0.0, 1.0, L + 1)
    p_half = (sigma_half * ps)[None, :]
    p_full = 0.5 * (p_half[:, 1:] + p_half[:, :-1])
    p_full[:, 0] = p_half[:, 1] / 2

    # integrate a pseudoadiabat downward in ln p from (t_sfc, ps)
    rh0 = 0.9
    es0 = float(svp.es(jnp.asarray(t_sfc)))
    r0 = 0.622 * rh0 * es0 / (ps - rh0 * es0)
    T, p = t_sfc, ps
    t_prof = np.zeros(L)
    for k in range(L - 1, -1, -1):
        target = p_full[0, k]
        while p > target:
            es = float(svp.es(jnp.asarray(T)))
            rs = 0.622 * es / (p - es)
            if rs > r0:  # below LCL: dry adiabat
                dTdlnp = kappa * T
            else:
                a = kappa * T + C.hlv / C.cp_air * rs
                b = C.hlv**2 * rs / (C.cp_air * C.rvgas * T * T)
                dTdlnp = a / (1.0 + b)
            dlnp = max(math.log(target / p), -0.01)
            T += dTdlnp * dlnp
            p *= math.exp(dlnp)
        t_prof[k] = T
    t = np.maximum(t_prof - offset, 165.0)[None, :]
    t[0, -1] = t_sfc   # surface parcel level at full temperature
    # high RH throughout: the rhbm=0.8 reference then dries the column on net
    # (small parcel excess temperature keeps qref ~ 0.87 qsat)
    rh = np.full(L, 0.93)
    q = rh[None, :] * np.asarray(svp.qs(jnp.asarray(t), jnp.asarray(p_full)))
    return (jnp.asarray(t), jnp.asarray(q), jnp.asarray(p_full), jnp.asarray(p_half))


class TestSatVaporPres:
    def test_simple_matches_clausius(self):
        svp = SatVaporPres(do_simple=True)
        t = jnp.asarray([273.16, 300.0])
        es = np.asarray(svp.es(t))
        assert abs(es[0] - 610.78) < 0.1
        assert 3300 < es[1] < 3800  # ~3535 Pa at 300 K

    def test_full_continuous_at_freezing(self):
        svp = SatVaporPres(do_simple=False)
        t = jnp.asarray([273.1599, 273.1601])
        es = np.asarray(svp.es(t))
        assert abs(es[1] / es[0] - 1.0) < 1e-3

    def test_qs_increases_with_t(self):
        svp = SatVaporPres(do_simple=True)
        t = jnp.linspace(250.0, 310.0, 10)
        qs = np.asarray(svp.qs(t, jnp.full_like(t, 1e5)))
        assert (np.diff(qs) > 0).all()


class TestConvection:
    def make(self):
        svp = SatVaporPres(do_simple=True)
        return QEMoistConvection(QEMoistConvectionConfig(), svp)

    def test_dry_column_no_convection(self):
        conv = self.make()
        t, pf, ph, _ = column_profile()
        q = jnp.zeros_like(t)
        r = conv(600.0, t, q, pf, ph)
        np.testing.assert_allclose(np.asarray(r.deltaT), 0.0, atol=1e-12)
        assert float(r.rain[0]) == 0.0

    def test_unstable_moist_column_rains(self):
        conv = self.make()
        t, q, pf, ph = moist_adiabat_column()
        r = conv(1200.0, t, q, pf, ph)
        assert float(r.cape[0]) > 0.0
        assert int(r.convflag[0]) == 2
        assert float(r.rain[0]) > 0.0
        # boundary layer dries (rhbm target below its high RH)
        assert np.asarray(r.deltaq)[0, -1] < 0.0

    def test_high_cape_saturated_column_goes_shallow(self):
        # very unstable near-saturated column: the rhbm reference moistens on
        # net -> the "shallower" shallow scheme engages with zero precip
        conv = self.make()
        t, pf, ph, _ = column_profile(t_sfc=302.0, lapse=8.0e-3)
        svp = SatVaporPres(do_simple=True)
        q = 0.9 * svp.qs(t, pf)
        r = conv(1200.0, t, q, pf, ph)
        assert float(r.cape[0]) > 0.0
        assert int(r.convflag[0]) == 1
        assert float(r.rain[0]) == 0.0

    def test_enthalpy_conservation_deep(self):
        # deep branch: cp dT + L dq integrates to the latent heat of the rain
        conv = self.make()
        t, q, pf, ph = moist_adiabat_column()
        r = conv(1200.0, t, q, pf, ph)
        assert int(r.convflag[0]) == 2
        dp = np.asarray(ph)[0, 1:] - np.asarray(ph)[0, :-1]
        C = EARTH
        enth = (C.cp_air * np.asarray(r.deltaT)[0] + C.hlv * np.asarray(r.deltaq)[0]) * dp
        scale = (np.abs(C.hlv * np.asarray(r.deltaq)[0]) * dp).sum() + 1e-10
        # Betts-Miller constraint: column cp dT + L dq integrates to zero
        assert abs(enth.sum()) / scale < 1e-6


class TestLscaleCond:
    def test_supersaturation_removed(self):
        svp = SatVaporPres(do_simple=True)
        lsc = LscaleCond(LscaleCondConfig(do_simple=True), svp)
        t, pf, ph, _ = column_profile()
        qs = svp.qs(t, pf)
        q = 1.2 * qs
        r = lsc(t, q, pf, ph)
        assert float(r.rain[0]) > 0.0
        q_new = np.asarray(q + r.qdel)
        qs_new = np.asarray(svp.qs(t + r.tdel, pf))
        assert (q_new <= qs_new * 1.001 + 1e-8).all()

    def test_subsaturated_untouched(self):
        svp = SatVaporPres(do_simple=True)
        lsc = LscaleCond(LscaleCondConfig(do_simple=True), svp)
        t, pf, ph, _ = column_profile()
        q = 0.5 * svp.qs(t, pf)
        r = lsc(t, q, pf, ph)
        np.testing.assert_allclose(np.asarray(r.qdel), 0.0, atol=1e-15)


class TestTwoStreamGray:
    def test_frierson_energy_balance_consistency(self):
        rad = TwoStreamGray(TwoStreamConfig())
        t, pf, ph, _ = column_profile()
        lat = jnp.asarray([0.5])
        q = jnp.zeros_like(t)
        albedo = jnp.asarray([0.06])
        down = rad.down(lat, jnp.asarray([0.0]), ph, t, q, albedo)
        up = rad.up(down, ph, jnp.asarray([300.0]), albedo)
        # OLR positive and of the right magnitude; net heating integrates to
        # column flux difference
        olr = float(up.olr[0])
        assert 100.0 < olr < 400.0
        C = EARTH
        dp = np.asarray(ph)[0, 1:] - np.asarray(ph)[0, :-1]
        heat_int = (np.asarray(up.tdt_rad)[0] * dp * C.cp_air / C.grav).sum()
        lw_net_toa = -olr  # upward positive
        sw_net_toa = float(down.sw_down[0, 0]) - float(up.sw_up[0, 0])
        sfc_net = (
            float(down.net_surf_sw_down[0])
            + float(down.surf_lw_down[0])
            - float(up.lw_up[0, -1])
        )
        np.testing.assert_allclose(
            heat_int, sw_net_toa + lw_net_toa - sfc_net, rtol=1e-4, atol=0.5
        )

    def test_schemes_run(self):
        t, pf, ph, _ = column_profile()
        svp = SatVaporPres(do_simple=True)
        q = 0.5 * svp.qs(t, pf)
        lat = jnp.asarray([0.3])
        alb = jnp.asarray([0.1])
        for scheme in ("frierson", "byrne", "geen", "schneider"):
            rad = TwoStreamGray(TwoStreamConfig(rad_scheme=scheme))
            down = rad.down(lat, jnp.asarray([0.0]), ph, t, q, alb)
            up = rad.up(down, ph, jnp.asarray([295.0]), alb)
            assert np.isfinite(np.asarray(up.tdt_rad)).all(), scheme


class TestAstronomy:
    def test_equinox_declination_zero(self):
        orbit = astro.Orbit(ecc=0.0)
        dec = float(astro.declination(orbit, jnp.asarray(0.0)))
        assert abs(dec) < 1e-6

    def test_daily_mean_polar_night(self):
        orbit = astro.Orbit(ecc=0.0)
        # northern winter solstice: time_since_ae = 0.25 of year
        tsae = jnp.asarray(0.25 * 2 * np.pi)
        cz, frac, _ = astro.daily_mean_solar(orbit, jnp.asarray(np.deg2rad(80.0)), tsae)
        assert float(frac) < 0.05  # polar night
        cz2, frac2, _ = astro.daily_mean_solar(orbit, jnp.asarray(np.deg2rad(-80.0)), tsae)
        assert float(frac2) > 0.95  # midnight sun

    def test_diurnal_average_matches_instantaneous_integral(self):
        orbit = astro.Orbit()
        lat = jnp.asarray(0.7)
        lon = jnp.asarray(1.0)
        tsae = jnp.asarray(1.0)
        dt = 2 * np.pi / 24  # one hour window
        cz_avg, frac, _ = astro.diurnal_solar(orbit, lat, lon, jnp.asarray(2.0), tsae, dt)
        # numerical average over the window
        gmts = 2.0 + np.linspace(0, dt, 200)
        czs = np.array([
            float(astro.diurnal_solar(orbit, lat, lon, jnp.asarray(g), tsae)[0])
            for g in gmts
        ])
        sunlit = czs > 0
        expected = czs[sunlit].mean() if sunlit.any() else 0.0
        np.testing.assert_allclose(float(cz_avg), expected, atol=0.02)


class TestMoDrag:
    def test_neutral_log_law(self):
        cfg = MOConfig(neutral=True)
        cd_m, cd_t, cd_q, us, bs = mo_drag(
            cfg, jnp.asarray([300.0]), jnp.asarray([300.0]), jnp.asarray([50.0]),
            jnp.asarray([0.05]), jnp.asarray([0.05]), jnp.asarray([0.05]),
            jnp.asarray([5.0]),
        )
        expected = (0.4 / np.log(50.0 / 0.05)) ** 2
        np.testing.assert_allclose(float(cd_m[0]), expected, rtol=1e-6)

    def test_unstable_increases_drag(self):
        cfg = MOConfig()
        args = lambda pt0: mo_drag(
            cfg, jnp.asarray([300.0]), jnp.asarray([pt0]), jnp.asarray([50.0]),
            jnp.asarray([0.05]), jnp.asarray([0.05]), jnp.asarray([0.05]),
            jnp.asarray([5.0]),
        )
        cd_neutralish = float(args(300.0)[0][0])
        cd_unstable = float(args(305.0)[0][0])
        cd_stable = float(args(295.0)[0][0])
        assert cd_unstable > cd_neutralish > cd_stable


class TestVertDiffChain:
    def test_diffusion_conserves_column_enthalpy_with_zero_flux(self):
        C = EARTH
        L = 16
        t, pf, ph, z = column_profile(L)
        q = jnp.full_like(t, 0.005)
        u = jnp.full_like(t, 5.0)
        v = jnp.zeros_like(t)
        diff = jnp.full_like(t, 10.0)
        zero2 = jnp.zeros(t.shape[:-1])
        zero3 = jnp.zeros_like(t)
        delt = 1200.0
        down = gcm_vert_diff_down(
            C, delt, u, v, t, q, diff, diff, ph, pf, z,
            zero2, zero2, zero2, zero2,
            zero3, zero3, zero3, zero3,
            do_conserve_energy=False,
        )
        # no surface flux: delta_t closed with flux = 0 like an isolated column
        from isca_tpu.physics.vert_diff import _diff_surface
        _, delta_t = _diff_surface(
            down.tri.dtmass, -down.tri.dflux_t / (1.0 - 0*down.tri.dflux_t),
            jnp.zeros_like(zero2), jnp.zeros_like(zero2), zero2, zero2, 1.0,
            down.tri.delta_t,
        )
        # simpler check: closed system with mixed layer of huge capacity ->
        # column cp*T integral changes only by surface flux ~ 0
        tri = down.tri._replace(delta_t=down.tri.delta_t / (1.0 - down.tri.dtmass * down.tri.dflux_t),
                                delta_q=down.tri.delta_q / (1.0 - down.tri.dtmass * down.tri.dflux_q))
        dt_t, dt_q = gcm_vert_diff_up(delt, tri)
        dp = np.asarray(ph)[..., 1:] - np.asarray(ph)[..., :-1]
        # dry static energy integral conserved (diffusion of T+gz/cp is a flux form)
        dse_change = (np.asarray(dt_t) * dp).sum()
        dse_scale = (np.abs(np.asarray(dt_t)) * dp).sum() + 1e-12
        assert abs(dse_change) / dse_scale < 1e-6

    def test_mixed_layer_energy_balance_sign(self):
        # heating imbalance warms the slab
        C = EARTH
        cfg = MixedLayerConfig(depth=10.0)
        from isca_tpu.physics.vert_diff import TriSurf
        shape = (4,)
        zero = jnp.zeros(shape)
        tri = TriSurf(
            dtmass=zero + 1.0e-2, dflux_t=zero, dflux_q=zero,
            delta_t=zero, delta_q=zero, delta_u=zero, delta_v=zero,
            e=jnp.zeros(shape + (9,)), f_t=jnp.zeros(shape + (9,)),
            f_q=jnp.zeros(shape + (9,)),
        )
        r = mixed_layer_step(
            cfg, 600.0, jnp.full(shape, 290.0), tri,
            zero, zero, zero + C.stefan * 290.0**4,
            zero + 400.0, zero + 300.0,   # strong SW+LW down
            zero, zero, zero, zero + 4 * C.stefan * 290.0**3, zero, zero,
        )
        assert (np.asarray(r.delta_t_surf) > 0).all()


class TestFullBettsMiller:
    def make(self, **kw):
        from isca_tpu.physics.betts_miller import BettsMiller, BettsMillerConfig
        svp = SatVaporPres(do_simple=True)
        return BettsMiller(BettsMillerConfig(**kw), svp)

    def test_deep_convection_rains(self):
        bm = self.make()
        t, q, pf, ph = moist_adiabat_column()
        r = bm(1200.0, t, q, pf, ph)
        assert float(r.cape[0]) > 0.0
        assert int(r.convflag[0]) == 2
        assert float(r.rain[0]) > 0.0

    def test_default_no_shallow(self):
        # Pt>0, Pq<=0 with both shallow options off -> no convection at all
        bm = self.make()
        t, pf, ph, _ = column_profile(t_sfc=302.0, lapse=8.0e-3)
        svp = SatVaporPres(do_simple=True)
        q = 0.9 * svp.qs(t, pf)
        r = bm(1200.0, t, q, pf, ph)
        assert float(r.rain[0]) == 0.0
        np.testing.assert_allclose(np.asarray(r.deltaT), 0.0, atol=1e-12)

    def test_changeqref_zero_precip(self):
        bm = self.make(do_changeqref=True)
        t, pf, ph, _ = column_profile(t_sfc=302.0, lapse=8.0e-3)
        svp = SatVaporPres(do_simple=True)
        q = 0.9 * svp.qs(t, pf)
        r = bm(1200.0, t, q, pf, ph)
        # adjustment happens but with zero net moisture change
        dp = np.asarray(ph)[0, 1:] - np.asarray(ph)[0, :-1]
        dq_int = (np.asarray(r.deltaq)[0] * dp).sum()
        scale = (np.abs(np.asarray(r.deltaq)[0]) * dp).sum() + 1e-14
        if scale > 1e-12:
            assert abs(dq_int) / scale < 1e-4

    def test_taucape_shortens_tau(self):
        bm_fix = self.make()
        bm_cape = self.make(do_taucape=True, capetaubm=900.0, tau_min=600.0)
        t, q, pf, ph = moist_adiabat_column()
        r1 = bm_fix(1200.0, t, q, pf, ph)
        r2 = bm_cape(1200.0, t, q, pf, ph)
        assert np.isfinite(np.asarray(r2.deltaT)).all()

    def test_model_runs_with_full_bm(self):
        import jax
        from tests.test_moist_model import small_model
        model = small_model(convection_scheme="FULL_BETTS_MILLER")
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 48))(s)
        assert np.isfinite(float(model.diagnostics(s)["tmax"]))


class TestMixedLayerOptions:
    """MiMA mixed-layer options: albedo profiles, ice albedo, heat-capacity
    profiles, warmpool q-flux, prescribed initial SST (mixed_layer.F90:84-556)."""

    def _lat2d(self, n=8):
        lats = jnp.linspace(-jnp.pi / 2 * 0.95, jnp.pi / 2 * 0.95, n)
        return lats[:, None] * jnp.ones((1, 4))

    def test_albedo_choices(self):
        from isca_tpu.physics.mixed_layer import surface_albedo
        lat2d = self._lat2d()
        a1 = np.asarray(surface_albedo(MixedLayerConfig(albedo_choice=1), lat2d))
        np.testing.assert_allclose(a1, 0.06)
        # choice 3: symmetric step poleward of lat_glacier
        a3 = np.asarray(surface_albedo(
            MixedLayerConfig(albedo_choice=3, lat_glacier=60.0,
                             higher_albedo=0.5), lat2d))
        deg = np.degrees(np.asarray(lat2d))
        np.testing.assert_allclose(a3[np.abs(deg) > 60], 0.5)
        np.testing.assert_allclose(a3[np.abs(deg) <= 60], 0.06)
        # choice 4: monotone ramp equator -> pole
        a4 = np.asarray(surface_albedo(
            MixedLayerConfig(albedo_choice=4, higher_albedo=0.4), lat2d))[:, 0]
        assert a4[0] == a4[-1] and (np.diff(a4[4:]) >= -1e-12).all()
        # choice 5: tanh between the two values
        a5 = np.asarray(surface_albedo(
            MixedLayerConfig(albedo_choice=5, higher_albedo=0.4), lat2d))
        assert (a5 >= 0.06 - 1e-9).all() and (a5 <= 0.4 + 1e-9).all()

    def test_ice_albedo_methods(self):
        from isca_tpu.physics.mixed_layer import albedo_with_ice
        base = jnp.full((4,), 0.1)
        conc = jnp.asarray([0.0, 0.4, 0.6, 1.0])
        step = np.asarray(albedo_with_ice(
            MixedLayerConfig(ice_albedo_value=0.7), base, conc))
        np.testing.assert_allclose(step, [0.1, 0.1, 0.7, 0.7])
        ramp = np.asarray(albedo_with_ice(
            MixedLayerConfig(ice_albedo_value=0.7,
                             ice_albedo_method="ramp_function"), base, conc))
        np.testing.assert_allclose(ramp, 0.1 * (1 - np.asarray(conc)) + 0.7 * np.asarray(conc))

    def test_heat_capacity_profile(self):
        from isca_tpu.physics.mixed_layer import heat_capacity_field
        lat2d = self._lat2d()
        lon2d = jnp.zeros_like(lat2d)
        rho_cp = EARTH.dens_h2o * 3989.24495292815
        cfg = MixedLayerConfig(depth=40.0, trop_depth=10.0,
                               trop_cap_limit=15.0, heat_cap_limit=60.0,
                               np_cap_factor=0.5)
        hc = np.asarray(heat_capacity_field(cfg, lon2d, lat2d))
        deg = np.degrees(np.asarray(lat2d))
        np.testing.assert_allclose(hc[np.abs(deg) < 15], 10.0 * rho_cp)
        np.testing.assert_allclose(hc[deg > 60], 0.5 * 40.0 * rho_cp)
        np.testing.assert_allclose(hc[deg < -60], 40.0 * rho_cp)

    def test_lonlat_land_capacity(self):
        from isca_tpu.physics.mixed_layer import heat_capacity_field
        lat2d = self._lat2d()
        lon2d = jnp.broadcast_to(
            jnp.radians(jnp.asarray([10.0, 100.0, 200.0, 300.0]))[None, :],
            lat2d.shape)
        rho_cp = EARTH.dens_h2o * 3989.24495292815
        cfg = MixedLayerConfig(land_option="lonlat", land_depth=2.0,
                               slandlon=(90.0,), elandlon=(110.0,),
                               slandlat=(-90.0,), elandlat=(90.0,))
        hc = np.asarray(heat_capacity_field(cfg, lon2d, lat2d))
        np.testing.assert_allclose(hc[:, 1], 2.0 * rho_cp)
        np.testing.assert_allclose(hc[:, 0], 40.0 * rho_cp)

    def test_warmpool(self):
        from isca_tpu.physics.mixed_layer import warmpool_qflux
        lat2d = self._lat2d()
        lon2d = jnp.broadcast_to(
            jnp.linspace(0.0, 2 * jnp.pi, 4, endpoint=False)[None, :], lat2d.shape)
        cfg = MixedLayerConfig(do_warmpool=True, warmpool_amp=5.0,
                               warmpool_width=20.0, warmpool_k=1)
        q = np.asarray(warmpool_qflux(cfg, lon2d, lat2d))
        deg = np.degrees(np.asarray(lat2d))
        assert (q[np.abs(deg) > 20] == 0).all()
        eq_row = np.argmin(np.abs(deg[:, 0]))
        np.testing.assert_allclose(q[eq_row], 5.0 * (1 - (deg[eq_row, 0] / 20.0) ** 2)
                                   * np.cos(np.asarray(lon2d)[eq_row]), rtol=1e-6)

    def test_prescribed_initial_dist(self):
        from isca_tpu.physics.mixed_layer import initial_t_surf
        lat2d = self._lat2d()
        cfg = MixedLayerConfig(prescribe_initial_dist=True, tconst=305.0, delta_T=40.0)
        t0 = np.asarray(initial_t_surf(cfg, lat2d))
        # equator: tconst + delta_T/3; pole: tconst - 2 delta_T/3
        eq_row = np.argmin(np.abs(np.asarray(lat2d)[:, 0]))
        assert t0[eq_row, 0] > 305.0 and t0[0, 0] < 290.0

    def test_sst_over_ocean_only(self):
        from isca_tpu.physics.vert_diff import TriSurf
        shape = (4,)
        zero = jnp.zeros(shape)
        tri = TriSurf(
            dtmass=zero + 1.0e-2, dflux_t=zero, dflux_q=zero,
            delta_t=zero, delta_q=zero, delta_u=zero, delta_v=zero,
            e=jnp.zeros(shape + (9,)), f_t=jnp.zeros(shape + (9,)),
            f_q=jnp.zeros(shape + (9,)),
        )
        C = EARTH
        cfg = MixedLayerConfig(do_sc_sst=True, specify_sst_over_ocean_only=True)
        land = jnp.asarray([1.0, 1.0, 0.0, 0.0])
        sst = jnp.full(shape, 300.0)
        r = mixed_layer_step(
            cfg, 600.0, jnp.full(shape, 290.0), tri,
            zero, zero, zero + C.stefan * 290.0**4,
            zero + 400.0, zero + 300.0,
            zero, zero, zero, zero + 4 * C.stefan * 290.0**3, zero, zero,
            land_mask=land, sst_prescribed=sst,
        )
        ts = np.asarray(r.t_surf)
        np.testing.assert_allclose(ts[2:], 300.0)      # ocean pinned to SST
        assert (ts[:2] > 290.0).all() and (ts[:2] < 295.0).all()  # land warms
