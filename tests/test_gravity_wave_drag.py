"""Gravity-wave drag tests (mg_drag, cg_drag, const_drag).

Reference behavior: src/atmos_param/mg_drag/mg_drag.f90 (Stern/Pierrehumbert
orographic GWD) and src/atmos_param/cg_drag/cg_drag.f90 (Alexander-Dunkerton
1999 spectral convective GWD).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from isca_tpu.constants import EARTH
from isca_tpu.physics.gravity_wave_drag import (
    CgDrag,
    CgDragConfig,
    MgDragConfig,
    mg_drag,
)


def make_atmosphere(L=30, ncol=4, u0=20.0, shear=True, lapse=6.5e-3,
                    t_sfc=288.0, ps=1.0e5):
    """Stably stratified columns with westerlies, level-last (ncol, L)."""
    p_half = jnp.linspace(100.0, ps, L + 1)
    p_full = 0.5 * (p_half[:-1] + p_half[1:])
    H = 7500.0
    z_full = H * jnp.log(ps / p_full)
    z_half = H * jnp.log(ps / jnp.maximum(p_half, 1.0))
    t = jnp.maximum(t_sfc - lapse * z_full, 210.0)
    if shear:
        u = u0 * (1.0 + z_full / 2.0e4)
    else:
        u = jnp.full_like(z_full, u0)
    tile = lambda a: jnp.broadcast_to(a, (ncol,) + a.shape)
    return (tile(u), jnp.zeros((ncol, L)), tile(t), tile(p_full),
            tile(p_half), tile(z_full), tile(z_half))


class TestMgDrag:
    def test_drag_decelerates_low_level_flow(self):
        """Mountain drag must oppose the low-level wind and conserve sign.

        Constant wind with height: falling pressure shrinks the saturation
        flux aloft, forcing wave breaking and momentum deposition."""
        u, v, t, pf, ph, zf, zh = make_atmosphere(shear=False)
        hprime = jnp.full(u.shape[:-1], 400.0)
        res = mg_drag(MgDragConfig(), 600.0, u, v, t, pf, ph, zf, zh, hprime)
        assert np.all(np.isfinite(np.asarray(res.dt_u)))
        # westerly flow over mountains: base flux negative-x
        assert float(res.taubx[0]) < 0.0
        # net column-integrated zonal tendency is decelerating
        dp = np.asarray(ph[..., 1:] - ph[..., :-1])
        net = np.sum(np.asarray(res.dt_u) * dp, axis=-1)
        assert np.all(net < 0.0)

    def test_flat_terrain_no_drag(self):
        u, v, t, pf, ph, zf, zh = make_atmosphere()
        hprime = jnp.zeros(u.shape[:-1])
        res = mg_drag(MgDragConfig(), 600.0, u, v, t, pf, ph, zf, zh, hprime)
        np.testing.assert_allclose(np.asarray(res.dt_u), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(res.taubx), 0.0, atol=1e-12)

    def test_momentum_flux_profile_monotone(self):
        """taup is a reversed cummax, so the applied flux must be monotone
        non-increasing with height (drag one-signed)."""
        u, v, t, pf, ph, zf, zh = make_atmosphere(u0=15.0, shear=False)
        hprime = jnp.full(u.shape[:-1], 700.0)
        res = mg_drag(MgDragConfig(), 600.0, u, v, t, pf, ph, zf, zh, hprime)
        # all levels decelerate or are neutral (dterm has taub's sign: <= 0
        # against +x flow after projection)
        assert np.all(np.asarray(res.dt_u) <= 1e-14)

    def test_energy_conservation_heating(self):
        u, v, t, pf, ph, zf, zh = make_atmosphere(shear=False)
        hprime = jnp.full(u.shape[:-1], 500.0)
        cfg = MgDragConfig(do_conserve_energy=True)
        res = mg_drag(cfg, 600.0, u, v, t, pf, ph, zf, zh, hprime)
        # dissipative heating where drag acts (KE sink -> heat source)
        assert float(np.asarray(res.dt_t).sum()) > 0.0


class TestCgDrag:
    def make(self, L=40, ncol=3):
        ps = 1.0e5
        p_half = np.linspace(50.0, ps, L + 1)
        p_full = 0.5 * (p_half[:-1] + p_half[1:])
        lat = jnp.asarray(np.deg2rad(np.array([-45.0, 0.0, 45.0])))
        cg = CgDrag(CgDragConfig(), lat, p_full)
        H = 7500.0
        z_full = H * np.log(ps / p_full)
        t = np.maximum(288.0 - 6.5e-3 * z_full, 216.0)
        u = 10.0 * np.sin(np.pi * z_full / 3.0e4)
        tile = lambda a: jnp.broadcast_to(jnp.asarray(a), (ncol, L))
        return cg, tile(p_full), tile(z_full), tile(t), tile(u), jnp.zeros((ncol, L))

    def test_source_tables(self):
        cg, *_ = self.make()
        # source level closer to surface away from equator (cg_drag.f90:186-188)
        sl = np.asarray(cg.source_level)
        assert sl[0] > sl[1] - 1e-9 or sl[2] > sl[1] - 1e-9
        amp = np.asarray(cg.source_amp)
        # NH augmentation positive, SH negative (Bt_nh=+.001, Bt_sh=-.001)
        assert amp[2] > amp[1] > amp[0]

    def test_forcing_finite_and_above_source_only(self):
        cg, pf, zf, t, u, v = self.make()
        res = cg(pf, zf, t, u, v)
        gx = np.asarray(res.gwfcng_x)
        assert np.all(np.isfinite(gx))
        assert np.any(gx != 0.0)
        # no forcing below the source level
        sl = np.asarray(cg.source_level)   # 1-based ext index
        L = pf.shape[-1]
        for i in range(gx.shape[0]):
            assert np.allclose(gx[i, sl[i]:], 0.0, atol=1e-14)

    def test_momentum_deposition_scales_with_source_amp(self):
        cfg0 = CgDragConfig()
        cfg2 = dataclasses.replace(cfg0, Bt_0=0.008, Bt_nh=0.0, Bt_sh=0.0)
        cfg1 = dataclasses.replace(cfg0, Bt_0=0.004, Bt_nh=0.0, Bt_sh=0.0)
        _, pf, zf, t, u, v = self.make()
        lat = jnp.zeros((3,))
        pref = np.asarray(pf[0])
        cg1 = CgDrag(cfg1, lat, pref)
        cg2 = CgDrag(cfg2, lat, pref)
        g1 = np.asarray(cg1(pf, zf, t, u, v).gwfcng_x)
        g2 = np.asarray(cg2(pf, zf, t, u, v).gwfcng_x)
        # doubling the source stress doubles the deposition (eps linear)
        np.testing.assert_allclose(g2, 2.0 * g1, rtol=1e-6, atol=1e-18)

    def test_no_wind_antisymmetry(self):
        """With u -> -u the forcing flips sign (spectrum is symmetric)."""
        cfg = CgDragConfig(Bt_nh=0.0, Bt_sh=0.0)
        _, pf, zf, t, u, v = self.make()
        lat = jnp.zeros((3,))
        cg = CgDrag(cfg, lat, np.asarray(pf[0]))
        g_pos = np.asarray(cg(pf, zf, t, u, v).gwfcng_x)
        g_neg = np.asarray(cg(pf, zf, t, -u, v).gwfcng_x)
        np.testing.assert_allclose(g_neg, -g_pos, rtol=1e-6, atol=1e-18)


class TestDampingDriverIntegration:
    def test_moist_model_with_gwd_steps(self):
        from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel

        cfg = GreyMoistConfig()
        cfg = dataclasses.replace(
            cfg,
            core=dataclasses.replace(cfg.core, resolution="T21", num_levels=12),
            physics=dataclasses.replace(
                cfg.physics, do_damping=True,
                damping=dataclasses.replace(
                    cfg.physics.damping, do_mg_drag=True, do_cg_drag=True)),
        )
        model = GreyMoistModel(cfg)
        model.physics.hprime = jnp.full(model.core.T.grid_shape, 300.0)
        state = model.initial_state()
        state = model.run(state, 6, first=True)
        tg = np.asarray(state.dyn.tg.curr)
        assert np.all(np.isfinite(tg))
        assert 150.0 < tg.mean() < 330.0
