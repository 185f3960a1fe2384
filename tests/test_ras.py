"""Relaxed Arakawa-Schubert convection tests.

Reference behavior: src/atmos_param/ras/ras.f90 (Moorthi & Suarez 1992).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from isca_tpu.constants import EARTH
from isca_tpu.physics.ras import RAS, RASConfig
from isca_tpu.physics.sat_vapor_pres import SatVaporPres


def make_sounding(L=24, ncol=3, t_sfc=302.0, rh=0.85, lapse=6.8e-3, ps=1.0e5):
    """Conditionally unstable moist tropical columns (level-last, top-down)."""
    p_half = jnp.linspace(20.0e2, ps, L + 1)
    p_full = 0.5 * (p_half[:-1] + p_half[1:])
    H = 7600.0
    z = H * np.log(ps / np.asarray(p_full))
    z_half = H * np.log(ps / np.maximum(np.asarray(p_half), 1.0))
    t = np.maximum(t_sfc - lapse * z, 200.0)
    svp = SatVaporPres(constants=EARTH, do_simple=True)
    q = rh * np.asarray(svp.qs(jnp.asarray(t), p_full))
    q = q * np.exp(-z / 3000.0) / np.exp(-z[-1] / 3000.0)
    tile = lambda a, n=L: jnp.broadcast_to(jnp.asarray(a), (ncol, n))
    return (tile(t), tile(q), jnp.zeros((ncol, L)), jnp.zeros((ncol, L)),
            tile(p_full), tile(p_half, L + 1), tile(z_half, L + 1), svp)


class TestCompLCL:
    def test_lcl_reasonable(self):
        t, q, u, v, pf, ph, zh, svp = make_sounding()
        ras = RAS(RASConfig(), svp)
        klcl = ras.comp_lcl(t[..., -1], q[..., -1], pf[..., -1], pf)
        L = t.shape[-1]
        k = np.asarray(klcl)
        # moist boundary layer: LCL within the lowest ~quarter of the column
        assert np.all(k >= L // 2 - 1) and np.all(k <= L - 1)
        p_lcl = np.asarray(pf)[0, k[0]]
        assert 7.0e4 < p_lcl <= 1.0e5

    def test_dry_parcel_lcl_higher(self):
        t, q, u, v, pf, ph, zh, svp = make_sounding()
        ras = RAS(RASConfig(), svp)
        k_moist = ras.comp_lcl(t[..., -1], q[..., -1], pf[..., -1], pf)
        k_dry = ras.comp_lcl(t[..., -1], 0.3 * q[..., -1], pf[..., -1], pf)
        assert np.all(np.asarray(k_dry) <= np.asarray(k_moist))


class TestRAS:
    def run(self, dt=1200.0, **sound_kw):
        t, q, u, v, pf, ph, zh, svp = make_sounding(**sound_kw)
        ras = RAS(RASConfig(), svp)
        res = ras(dt, t, q, u, v, pf, ph, zh)
        return ras, res, (t, q, pf, ph)

    def test_unstable_column_precipitates_and_stabilizes(self):
        ras, res, (t, q, pf, ph) = self.run()
        assert np.all(np.isfinite(np.asarray(res.dt_t)))
        assert np.all(np.isfinite(np.asarray(res.dt_q)))
        rain = np.asarray(res.rain)
        assert np.all(rain > 0.0), "moist unstable column must rain"
        # convection dries the column overall (precip removes water)
        dp = np.asarray(ph[..., 1:] - ph[..., :-1])
        dq_int = np.sum(np.asarray(res.dt_q) * dp / EARTH.grav, axis=-1)
        assert np.all(dq_int < 0.0)
        # net condensation heating warms the column
        dt_int = np.sum(np.asarray(res.dt_t) * dp / EARTH.grav * EARTH.cp_air,
                        axis=-1)
        assert np.all(dt_int > 0.0)

    def test_moisture_closure(self):
        """Column water removed = surface precip + evaporated amount balance:
        integral of -dq = rain (evap returns moisture, reducing rain)."""
        ras, res, (t, q, pf, ph) = self.run()
        dp = np.asarray(ph[..., 1:] - ph[..., :-1])
        dq_int = -np.sum(np.asarray(res.dt_q) * dp / EARTH.grav, axis=-1)
        rain = np.asarray(res.rain)
        np.testing.assert_allclose(dq_int, rain, rtol=2e-3, atol=1e-7)

    def test_stable_column_inactive(self):
        """A cold dry stable column produces no convection."""
        ras, res, _ = self.run(t_sfc=270.0, rh=0.2, lapse=4.0e-3)
        np.testing.assert_allclose(np.asarray(res.rain), 0.0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(res.dt_t), 0.0, atol=1e-8)

    def test_relaxation_partial_adjustment(self):
        """RAS relaxes toward equilibrium: doubling rasal0 increases the
        adjustment (up to the fracs cap)."""
        t, q, u, v, pf, ph, zh, svp = make_sounding()
        weak = RAS(RASConfig(rasal0=0.05), svp)(1200.0, t, q, u, v, pf, ph, zh)
        strong = RAS(RASConfig(rasal0=0.5), svp)(1200.0, t, q, u, v, pf, ph, zh)
        assert float(np.asarray(strong.rain).sum()) > \
            float(np.asarray(weak.rain).sum())

    def test_evaporation_moistens_subcloud_dry_layers(self):
        """With evap on, some precip re-evaporates (precip_ev > 0) in
        sub-saturated air and the surface rain is reduced."""
        t, q, u, v, pf, ph, zh, svp = make_sounding()
        on = RAS(RASConfig(evap_on=True), svp)(1200.0, t, q, u, v, pf, ph, zh)
        off = RAS(RASConfig(evap_on=False), svp)(1200.0, t, q, u, v, pf, ph, zh)
        assert float(np.asarray(on.precip_ev).sum()) > 0.0
        assert float(np.asarray(on.rain).sum()) < float(np.asarray(off.rain).sum())

    def test_snow_when_cold(self):
        t, q, u, v, pf, ph, zh, svp = make_sounding()
        ras = RAS(RASConfig(), svp)
        coldT = jnp.array([True, False, False])
        res = ras(1200.0, t, q, u, v, pf, ph, zh, coldT=coldT)
        assert float(res.snow[0]) > 0.0 and float(res.rain[0]) == 0.0
        assert float(res.rain[1]) > 0.0 and float(res.snow[1]) == 0.0

    def test_moist_model_with_ras(self):
        from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel

        cfg = GreyMoistConfig()
        cfg = dataclasses.replace(
            cfg,
            core=dataclasses.replace(cfg.core, resolution="T21", num_levels=12),
            physics=dataclasses.replace(cfg.physics, convection_scheme="RAS"),
        )
        model = GreyMoistModel(cfg)
        state = model.initial_state()
        state = model.run(state, 8, first=True)
        tg = np.asarray(state.dyn.tg.curr)
        qg = np.asarray(state.dyn.tracers["sphum"].curr)
        assert np.all(np.isfinite(tg)) and 150 < tg.mean() < 330
        assert np.all(np.isfinite(qg))
