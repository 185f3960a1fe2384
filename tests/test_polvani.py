"""Polvani 2004 / Polvani-Esler 2007 initial-condition tests.

Reference: src/atmos_spectral/init/polvani_2004.F90, polvani_2007.F90.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from isca_tpu.dycore.initial_conditions import (
    Polvani2004Config,
    Polvani2007Config,
    apply_polvani_2004,
    apply_polvani_2007,
    polvani_2007_vert_coord,
)
from isca_tpu.dycore.primitive import PrimitiveConfig, PrimitiveCore


def make_core_2007(nlev=30):
    pk, bk = polvani_2007_vert_coord(nlev)
    cfg = PrimitiveConfig(
        resolution="T42", num_levels=nlev, dt=600.0,
        vert_coord_option="input",
        vert_coord_kwargs=(("pk", tuple(pk)), ("bk", tuple(bk))),
    )
    return PrimitiveCore(cfg)


class TestPolvani2007:
    def test_vert_coord_log_spaced(self):
        pk, bk = polvani_2007_vert_coord(30, sigma_top=0.02)
        assert bk[0] == 0.02 and bk[-1] == 1.0
        # uniform in log sigma for interior levels
        r = np.diff(np.log(bk[:-1]))
        np.testing.assert_allclose(r, r[0], rtol=1e-10)

    def test_lc1_jet_structure(self):
        core = make_core_2007()
        state, zs = apply_polvani_2007(core, Polvani2007Config(type_of_init="LC1"))
        u = np.asarray(state.ug.curr)       # (L, nlat, nlon)
        t = np.asarray(state.tg.curr)
        lats = np.rad2deg(np.asarray(core.T.lats))
        assert np.all(np.isfinite(u)) and np.all(np.isfinite(t))
        # jet amplitude ~ U0 sqrt(e) is the max of fz... fz max = 1 at z=zt
        assert 35.0 < u.max() < 55.0
        # jet lives in the NH
        nh = lats > 0
        assert np.abs(u[:, nh, :]).max() > 10.0 * np.abs(u[:, ~nh, :]).max()
        # temperature decreases poleward in the NH jet region (thermal wind)
        tz = t.mean(axis=2)                 # zonal mean (L, nlat)
        mid = np.argmin(np.abs(lats - 30.0))
        high = np.argmin(np.abs(lats - 70.0))
        assert tz[-1, mid] > tz[-1, high]

    def test_lc2_surface_pressure_varies(self):
        core = make_core_2007()
        s1, _ = apply_polvani_2007(core, Polvani2007Config(type_of_init="LC1"))
        s2, _ = apply_polvani_2007(core, Polvani2007Config(type_of_init="LC2"))
        ps1 = np.asarray(s1.psg.curr)
        ps2 = np.asarray(s2.psg.curr)
        # LC1: uniform p00 (up to band-limiting); LC2: meridional structure
        assert ps1.std() < 100.0
        assert ps2.std() > 5.0 * max(ps1.std(), 1.0)
        assert np.all(np.isfinite(ps2))

    def test_lc1_integrates_stably(self):
        """The balanced state + wave-6 perturbation must integrate without
        blowing up (baroclinic wave growth is slow on day one)."""
        from isca_tpu.dycore.primitive import GridTendencies

        core = make_core_2007()
        state, zs = apply_polvani_2007(core, Polvani2007Config())
        zero = lambda: jnp.zeros_like(state.ug.curr)
        tend = GridTendencies(du=zero(), dv=zero(), dt=zero(), dtracers={})
        state = core.dynamics_step(state, tend, zs, first=True)
        for _ in range(12):
            state = core.dynamics_step(state, tend, zs)
        t = np.asarray(state.tg.curr)
        u = np.asarray(state.ug.curr)
        assert np.all(np.isfinite(t)) and np.all(np.isfinite(u))
        assert 150.0 < t.mean() < 330.0
        assert np.abs(u).max() < 150.0


class TestPolvani2004:
    def make_core(self):
        cfg = PrimitiveConfig(resolution="T42", num_levels=20, dt=600.0,
                              vert_coord_option="even_sigma")
        return PrimitiveCore(cfg)

    def test_basic_state(self):
        core = self.make_core()
        state, zs = apply_polvani_2004(core)
        u = np.asarray(state.ug.curr)
        t = np.asarray(state.tg.curr)
        lats = np.rad2deg(np.asarray(core.T.lats))
        assert np.all(np.isfinite(u)) and np.all(np.isfinite(t))
        # u0=50 jet, NH only
        assert 25.0 < u.max() < 60.0
        nh = lats > 0
        assert np.abs(u[:, nh, :]).max() > 10.0 * np.abs(u[:, ~nh, :]).max()
        # stratospheric isothermal region from the standard atmosphere
        assert 180.0 < t.min() < 240.0

    def test_perturbation_localized(self):
        core = self.make_core()
        cfg = Polvani2004Config(perturb_amp=5.0)
        s_pert, _ = apply_polvani_2004(core, cfg)
        s_none, _ = apply_polvani_2004(
            core, dataclasses.replace(cfg, perturb_amp=0.0))
        dt = np.asarray(s_pert.tg.curr) - np.asarray(s_none.tg.curr)
        lats = np.rad2deg(np.asarray(core.T.lats))
        lons = np.rad2deg(np.asarray(core.T.lons))
        j45 = np.argmin(np.abs(lats - 45.0))
        i0 = np.argmin(np.abs(lons - 0.0))
        i180 = np.argmin(np.abs(lons - 180.0))
        # centered at (0E, 45N), decays away
        assert np.abs(dt[:, j45, i0]).max() > 3.0
        assert np.abs(dt[:, j45, i180]).max() < 0.5
