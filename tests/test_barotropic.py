"""Integration tests for the barotropic vorticity model (SURVEY.md stage 2).

Mirrors the reference's barotropic_vort_eq test cases (exp/test_cases/barotropic/):
two-jet initial condition + wavenumber-4 eddy perturbation, optional stochastic
stirring. Gates: stability, energy/enstrophy behavior, tracer boundedness.
"""

import jax
import jax.numpy as jnp
import numpy as np

from isca_tpu.models.barotropic import BarotropicConfig, BarotropicModel
from isca_tpu.spectral import transforms as tr


def make_model(**kw):
    cfg = BarotropicConfig(resolution="T21", dt=1800.0, dtype=jnp.float64, **kw)
    return BarotropicModel(cfg)


class TestBarotropic:
    def test_two_jets_initial_state(self):
        model = make_model()
        s = model.initial_state()
        # initial u roughly matches the analytic two-jet profile
        cl, sl = np.asarray(model.T.coslat), np.asarray(model.T.sinlat)
        u_analytic = 25 * cl - 30 * cl**3 + 300 * sl**2 * cl**6
        u_zonal = np.asarray(s.u.curr).mean(axis=1)
        # (band-limited projection of the profile, so loose tolerance)
        assert np.corrcoef(u_zonal, u_analytic)[0, 1] > 0.99

    def test_five_day_run_stable_and_conserving(self):
        model = make_model()
        s0 = model.initial_state()
        d0 = model.diagnostics(s0)
        run = jax.jit(lambda s: model.run(s, 240))  # 5 days at dt=1800
        s = run(s0)
        d = model.diagnostics(s)
        v = np.asarray(s.v.curr)
        assert np.isfinite(v).all()
        assert np.abs(v).max() < 200.0
        # Invariants decay only through hyperdiffusion acting on the enstrophy
        # cascade (strong at T21): energy within ~10%, and never growing.
        e0, e1 = float(d0["energy"]), float(d["energy"])
        z0, z1 = float(d0["enstrophy"]), float(d["enstrophy"])
        assert 0.85 * e0 < e1 < 1.001 * e0, (e0, e1)
        assert z1 < 1.001 * z0, (z0, z1)

    def test_invariants_exact_without_damping(self):
        # With damping and the Robert filter off, leapfrog conserves enstrophy to
        # machine precision and energy to time-truncation error.
        model = make_model(damping_coeff=0.0, robert_coeff=0.0)
        s = model.initial_state()
        d0 = model.diagnostics(s)
        s = jax.jit(lambda s: model.run(s, 96))(s)
        d = model.diagnostics(s)
        assert abs(float(d["enstrophy"]) / float(d0["enstrophy"]) - 1.0) < 1e-12
        assert abs(float(d["energy"]) / float(d0["energy"]) - 1.0) < 1e-3

    def test_global_mean_vorticity_zero(self):
        model = make_model()
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 48))(s)
        mean_vor = float(s.vors.curr[0, 0].real)
        assert abs(mean_vor) < 1e-12

    def test_tracer_bounded(self):
        model = make_model()
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 96))(s)
        trg = np.asarray(tr.spec_to_grid(model.T, s.trs.curr))
        # spectral advection overshoots a little (Gibbs) but must stay order-1
        assert trg.min() > -1.6 and trg.max() < 1.6

    def test_stirred_case_spins_up(self):
        model = make_model(
            initial_zonal_wind="zero",
            zeta_0=0.0,
            stirring_amplitude=3.0e-11,
            stirring_do_localize=True,
        )
        s = model.initial_state(seed=1)
        e0 = float(model.diagnostics(s)["energy"])
        s = jax.jit(lambda s: model.run(s, 240))(s)
        e1 = float(model.diagnostics(s)["energy"])
        assert np.isfinite(e1) and e1 > e0  # stirring injects energy

    def test_f32_stability(self):
        cfg = BarotropicConfig(resolution="T21", dt=1800.0, dtype=jnp.float32)
        model = BarotropicModel(cfg)
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 96))(s)
        assert np.isfinite(np.asarray(s.v.curr)).all()

    def test_rhomboidal_run_stable(self):
        # rhomboidal truncation (reference triang_trunc=.false.) end-to-end
        cfg = BarotropicConfig(resolution=15, nlon=64, nlat=32, dt=1800.0,
                               dtype=jnp.float64, truncation_shape="rhomboidal")
        model = BarotropicModel(cfg)
        s = jax.jit(lambda s: model.run(s, 48))(model.initial_state())
        v = np.asarray(s.v.curr)
        assert np.isfinite(v).all() and np.abs(v).max() < 200.0
