"""Shallow-convection and stable-BL scheme tests.

Reference behavior: src/atmos_param/shallow_conv/shallow_conv.F90,
src/atmos_param/stable_bl_turb/stable_bl_turb.F90.
"""

import jax.numpy as jnp
import numpy as np

from isca_tpu.constants import EARTH
from isca_tpu.physics.bl_schemes import (
    ShallowConvConfig,
    StableBLConfig,
    mylcl,
    shallow_conv,
    stable_bl_turb,
)
from isca_tpu.physics.sat_vapor_pres import SatVaporPres


def columns(L=20, ncol=3, t_sfc=295.0, rh=0.8, lapse=9.0e-3, ps=1.0e5):
    p_half = jnp.linspace(100.0e2, ps, L + 1)
    p_full = 0.5 * (p_half[:-1] + p_half[1:])
    z = 7800.0 * np.log(ps / np.asarray(p_full))
    zh = 7800.0 * np.log(ps / np.asarray(p_half))
    t = np.maximum(t_sfc - lapse * z, 210.0)
    svp = SatVaporPres(constants=EARTH, do_simple=True)
    q = rh * np.asarray(svp.qs(jnp.asarray(t), p_full))
    tile = lambda a, n=L: jnp.broadcast_to(jnp.asarray(a), (ncol, n))
    return (tile(t), tile(q), tile(p_full), tile(p_half, L + 1),
            tile(z, L), tile(zh, L + 1), svp)


class TestMYLCL:
    def test_lcl_below_parcel_above_shalow(self):
        t, q, pf, ph, zf, zh, svp = columns()
        cfg = ShallowConvConfig()
        plcl, kbase = mylcl(cfg, svp, t[..., -1], q[..., -1], pf[..., -1], ph)
        p = np.asarray(plcl)
        assert np.all(p <= np.asarray(pf[..., -1]) + 1e-6)
        assert np.all(p >= cfg.pshalow - 1e-6)
        # 80% RH surface parcel: LCL a few tens of hPa above the surface
        assert np.all(p > 8.0e4)

    def test_saturated_parcel_lcl_at_parcel(self):
        t, q, pf, ph, zf, zh, svp = columns()
        qsat = svp.qs(t[..., -1], pf[..., -1])
        plcl, _ = mylcl(ShallowConvConfig(), svp, t[..., -1], qsat,
                        pf[..., -1], ph)
        np.testing.assert_allclose(np.asarray(plcl), np.asarray(pf[..., -1]),
                                   rtol=0.02)


class TestShallowConv:
    def test_unstable_moist_column_gets_mixing(self):
        """Superadiabatic moist column: enhanced diffusivity in the shallow
        cumulus layer (akhsc = akhsc0 there), zero above pshalow."""
        t, q, pf, ph, zf, zh, svp = columns(lapse=9.8e-3, rh=0.85)
        cfg = ShallowConvConfig()
        akhsc, plcl = shallow_conv(cfg, svp, t, q, pf, ph)
        a = np.asarray(akhsc)
        assert np.all(np.isfinite(a))
        assert a.max() > 0.0
        assert a.max() <= cfg.akhsc0 + 1e-9
        # nothing above pshalow
        above = np.asarray(pf) <= cfg.pshalow
        assert np.all(np.where(above[..., :-1], a[..., 1:], 0.0) == 0.0)

    def test_stable_column_no_mixing(self):
        t, q, pf, ph, zf, zh, svp = columns(lapse=3.0e-3, rh=0.3)
        akhsc, _ = shallow_conv(ShallowConvConfig(), svp, t, q, pf, ph)
        np.testing.assert_allclose(np.asarray(akhsc), 0.0, atol=1e-12)


class TestStableBL:
    def make(self, lapse, u0=10.0, bstar=-0.01):
        t, q, pf, ph, zf, zh, svp = columns(lapse=lapse, rh=0.3)
        ncol, L = t.shape
        u = u0 * (1.0 - jnp.asarray(np.linspace(0, 1, L)))[None, :] \
            * jnp.ones((ncol, 1))
        lat = jnp.asarray(np.deg2rad([30.0, 45.0, 60.0]))
        return (lat, t, q, u, jnp.zeros_like(u), zf, zh,
                jnp.full((ncol,), 0.3), jnp.full((ncol,), bstar))

    def test_shear_layer_mixes(self):
        lat, t, q, u, v, zf, zh, us, bs = self.make(lapse=9.8e-3)
        res = stable_bl_turb(StableBLConfig(), lat, t, q, u, v, zf, zh, us, bs)
        akm = np.asarray(res.akm)
        assert np.all(np.isfinite(akm))
        assert akm.max() > 0.1
        assert akm.max() <= StableBLConfig().akmax

    def test_strong_stability_kills_mixing(self):
        cfg = StableBLConfig()
        lat, t, q, u, v, zf, zh, us, bs = self.make(lapse=9.8e-3)
        active = stable_bl_turb(cfg, lat, t, q, u, v, zf, zh, us, bs)
        # very stable: modest inversion, weak shear, dry air (Ri >> ri_crit)
        lat, t2, _, u2, v2, zf2, zh2, us2, bs2 = self.make(lapse=-3.0e-3,
                                                          u0=0.5, bstar=0.01)
        q2 = jnp.full_like(t2, 1.0e-4)
        stable = stable_bl_turb(cfg, lat, t2, q2, u2, v2, zf2, zh2, us2, bs2)
        assert np.asarray(stable.akm).sum() < 0.01 * np.asarray(active.akm).sum() + 1e-6

    def test_pbl_height_from_ustar(self):
        cfg = StableBLConfig()
        lat, t, q, u, v, zf, zh, us, bs = self.make(lapse=9.8e-3)
        res = stable_bl_turb(cfg, lat, t, q, u, v, zf, zh, us, bs)
        z = np.asarray(res.z_sbl)
        f = 2.0 * EARTH.omega * np.abs(np.sin(np.asarray(lat)))
        expect = np.minimum(cfg.alpha * 0.3 / np.maximum(f, cfg.fmin),
                            cfg.hpbl_cap)
        np.testing.assert_allclose(z, expect, rtol=1e-6)
