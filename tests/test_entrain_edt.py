"""Tests for the entrain (Bretherton closure) and EDT (Grenier-Bretherton
TKE) boundary-layer schemes and their vert_turb-style driver wiring.

Reference: src/atmos_param/entrain/entrain.F90, src/atmos_param/edt/edt.F90,
vert_turb_driver.F90:103-122.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from isca_tpu.physics.edt import EDTConfig, edt, galperin
from isca_tpu.physics.entrain import EntrainConfig, entrain


def make_columns(ncol=3, L=30):
    z = np.linspace(15000, 100, L)
    zh = np.concatenate([[16000], 0.5 * (z[1:] + z[:-1]), [0.0]])
    p_full = 1e5 * np.exp(-z / 8000)
    p_half = 1e5 * np.exp(-zh / 8000)

    def col(a):
        return np.broadcast_to(np.asarray(a, np.float64),
                               (ncol,) + np.shape(a)).copy()

    # col 0: convectively unstable surface layer; col 1: stratocumulus-like
    # cloud near 800 m with strong LW cooling; col 2: stable surface
    t = np.where(z < 1000, 288 - 0.0098 * z, 288 - 0.0065 * z - 3)
    qv = 8e-3 * np.exp(-z / 2500)
    tdtlw = np.zeros((ncol, L))
    kcld = int(np.argmin(np.abs(z - 800)))
    tdtlw[1, kcld] = -60.0 / 86400.0
    qa = col(np.zeros(L)); qa[1, kcld - 1:kcld + 2] = 0.8
    ql = col(np.zeros(L)); ql[1, kcld] = 2e-4
    u = col(5 + 0.001 * z)
    v = col(np.zeros(L))
    u_star = np.array([0.3, 0.25, 0.3])
    b_star = np.array([0.01, 0.002, -0.005])
    return dict(
        tdtlw=jnp.asarray(tdtlw), u_star=jnp.asarray(u_star),
        b_star=jnp.asarray(b_star), t=jnp.asarray(col(t)),
        qv=jnp.asarray(col(qv)), ql=jnp.asarray(ql),
        qi=jnp.zeros((ncol, L)), qa=jnp.asarray(qa),
        u=jnp.asarray(u), v=jnp.asarray(v),
        z_full=jnp.asarray(col(z)), p_full=jnp.asarray(col(p_full)),
        z_half=jnp.asarray(col(zh)), p_half=jnp.asarray(col(p_half)),
        kcld=kcld)


class TestEntrain:
    def test_mixed_layer_detection(self):
        c = make_columns()
        kcld = c.pop("kcld")
        res = entrain(EntrainConfig(), c["tdtlw"], jnp.zeros(3, bool),
                      c["u_star"], c["b_star"], c["t"], c["qv"], c["ql"],
                      c["qi"], c["qa"], c["u"], c["v"], c["z_full"],
                      c["p_full"], c["z_half"], c["p_half"],
                      jnp.zeros_like(c["t"]), jnp.zeros_like(c["t"]))
        zsml = np.asarray(res.zsml)
        # convective column: PBL near the 1 km inversion
        assert 500 < zsml[0] < 1500
        # stable surface: no surface mixed layer
        assert zsml[2] == 0.0
        # stratocumulus column: radiative ML top near the cloud
        assert 500 < float(res.zradtop[1]) < 1200
        assert float(res.wentr_rad[1]) > 0
        assert float(res.wentr_rad[0]) == 0.0
        assert np.isfinite(np.asarray(res.k_t)).all()
        assert (np.asarray(res.k_t) >= 0).all()
        # surface-driven entrainment rate positive and capped
        assert 0 < float(res.wentr_pbl[0]) <= EntrainConfig().wentrmax

    def test_stable_column_keeps_input_k(self):
        c = make_columns()
        c.pop("kcld")
        base = jnp.full_like(c["t"], 1.23)
        res = entrain(EntrainConfig(), c["tdtlw"] * 0, jnp.zeros(3, bool),
                      c["u_star"], c["b_star"], c["t"], c["qv"],
                      jnp.zeros_like(c["t"]), c["qi"],
                      jnp.zeros_like(c["t"]), c["u"], c["v"], c["z_full"],
                      c["p_full"], c["z_half"], c["p_half"], base, base)
        # stable column untouched: K equals the incoming value everywhere
        np.testing.assert_allclose(np.asarray(res.k_t[2]), 1.23)


class TestEDT:
    def test_galperin_limits(self):
        gh, sh, sm = galperin(jnp.asarray([-1.0, 0.0, 0.163, 10.0]))
        g = np.asarray(gh)
        assert (g >= -0.28 - 1e-12).all() and (g <= 0.0233 + 1e-12).all()
        assert (np.asarray(sh) > 0).all() and (np.asarray(sm) > 0).all()
        # unstable -> larger stability functions than stable
        assert float(sh[0]) > float(sh[2])

    def test_convective_and_stable_columns(self):
        c = make_columns()
        c.pop("kcld")
        res = edt(EDTConfig(), c["tdtlw"], c["u_star"], c["b_star"],
                  c["t"], c["qv"], c["ql"], c["qi"], c["qa"],
                  c["u"], c["v"], c["z_full"], c["p_full"],
                  c["z_half"], c["p_half"])
        kt = np.asarray(res.k_t)
        assert np.isfinite(kt).all() and (kt >= 0).all()
        # convective column develops substantial BL mixing
        assert kt[0].max() > 10.0
        # cloud-topped column gets extra TKE from radiative production
        assert float(np.asarray(res.tke)[1].max()) > \
            float(np.asarray(res.tke)[0].max())
        assert 300 < float(res.pblh[0]) < 3000
        # tke bounded
        tke = np.asarray(res.tke)
        assert (tke <= 20.0 + 1e-6).all() and (tke >= 0).all()


class TestDriverWiring:
    def test_moist_model_all_bl_schemes(self):
        from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel

        for scheme in ("entrain", "edt", "stable_bl"):
            cfg = GreyMoistConfig()
            cfg = dataclasses.replace(
                cfg,
                core=dataclasses.replace(cfg.core, resolution="T21",
                                         num_levels=12),
                physics=dataclasses.replace(
                    cfg.physics, bl_scheme=scheme,
                    do_shallow_conv=(scheme == "entrain")),
            )
            model = GreyMoistModel(cfg)
            state = model.initial_state()
            state, _ = model.step_with_diagnostics(state, first=True)
            for _ in range(3):
                state = model.step(state)
            tg = np.asarray(state.dyn.tg.curr)
            assert np.isfinite(tg).all(), scheme
            assert 150.0 < tg.mean() < 330.0, scheme
