"""Integration tests for the shallow-water model (SURVEY.md stage 3).

Mirrors exp/test_cases/shallow_water/*: stirred turbulence and forced (h_eq)
configurations. Also checks the semi-implicit solver: stable at time steps far
beyond the explicit gravity-wave CFL, and conserving mean thickness.
"""

import jax
import jax.numpy as jnp
import numpy as np

from isca_tpu.models.shallow import ShallowConfig, ShallowModel


def make_model(**kw):
    cfg = ShallowConfig(resolution="T21", dt=1800.0, dtype=jnp.float64, **kw)
    return ShallowModel(cfg)


class TestShallow:
    def test_rest_state_stays_at_rest(self):
        # No forcing, flat h => exact steady state.
        model = make_model(physics_on=False)
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 24))(s)
        assert float(jnp.abs(s.u.curr).max()) < 1e-10
        assert float(jnp.abs(s.hg.curr - model.config.h_0).max()) < 1e-8

    def test_semi_implicit_stable_beyond_gravity_cfl(self):
        # c = sqrt(h_0) ~ 173 m/s; explicit CFL at T21 (dx ~ 600 km) ~ 1700 s.
        # Run dt = 3600 s with a big height anomaly: must stay finite & bounded.
        model = make_model(add_initial_vortex_pair=True, physics_on=False)
        cfg = ShallowConfig(resolution="T21", dt=3600.0, dtype=jnp.float64,
                            add_initial_vortex_pair=True, physics_on=False)
        model = ShallowModel(cfg)
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 96))(s)  # 4 days
        hg = np.asarray(s.hg.curr)
        assert np.isfinite(hg).all()
        assert np.abs(np.asarray(s.v.curr)).max() < 300.0

    def test_mean_thickness_conserved(self):
        model = make_model(add_initial_vortex_pair=True, physics_on=False)
        s = model.initial_state()
        m0 = float(model.diagnostics(s)["mean_h"])
        s = jax.jit(lambda s: model.run(s, 48))(s)
        m1 = float(model.diagnostics(s)["mean_h"])
        assert abs(m1 - m0) / m0 < 1e-10  # advection + SI conserve <h> exactly-ish

    def test_forced_case_approaches_h_eq_pattern(self):
        # With thermal relaxation on, h should develop a positive anomaly near the
        # forcing bump (25N, 90E) after a few days.
        model = make_model(physics_on=True)
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 240))(s)  # 5 days
        hg = np.asarray(s.hg.curr)
        T = model.T
        lat = np.degrees(np.asarray(T.lats))
        lon = np.degrees(np.asarray(T.lons))
        jj = np.argmin(np.abs(lat - 25.0))
        ii = np.argmin(np.abs(lon - 90.0))
        far = hg[np.argmin(np.abs(lat + 60.0)), :].mean()
        assert hg[jj, ii] > far + 1e3, (hg[jj, ii], far)
        assert np.isfinite(hg).all()

    def test_stirred_turbulence_spins_up(self):
        cfg = ShallowConfig(resolution="T21", dt=1800.0, dtype=jnp.float64,
                            stirring_amplitude=1e-10, physics_on=False)
        model = ShallowModel(cfg)
        s = model.initial_state(seed=3)
        s = jax.jit(lambda s: model.run(s, 240))(s)
        u = np.asarray(s.u.curr)
        assert np.isfinite(u).all()
        assert np.abs(u).max() > 0.1  # flow developed

    def test_geostrophic_adjustment_vortex(self):
        # A height anomaly should radiate gravity waves and leave a balanced
        # vortex: rms v settles to much less than the initial transient.
        cfg = ShallowConfig(resolution="T21", dt=900.0, dtype=jnp.float64,
                            add_initial_vortex_pair=True, physics_on=False)
        model = ShallowModel(cfg)
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 384))(s)  # 4 days
        vor = np.asarray(s.vorg.curr)
        assert np.isfinite(vor).all()
        assert np.abs(vor).max() > 1e-6  # a vortex persists
