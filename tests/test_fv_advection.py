"""Tests for the van Leer A-grid horizontal advection (grid tracers)."""

import jax
import jax.numpy as jnp
import numpy as np

from isca_tpu.dycore.fv_advection import a_grid_horiz_advection, make_fv_geometry
from isca_tpu.dycore.primitive import PrimitiveConfig, PrimitiveCore, TracerAttr, GridTendencies
from isca_tpu.spectral import transforms as tr


def setup(res="T21"):
    T = tr.make_transforms(res, dtype=jnp.float64)
    G = make_fv_geometry(T)
    return T, G


def gaussian_blob(T, lat0=20.0, lon0=90.0, width=20.0):
    lat = np.degrees(np.asarray(T.lats))[:, None]
    lon = np.degrees(np.asarray(T.lons))[None, :]
    dlon = np.minimum(np.abs(lon - lon0), 360 - np.abs(lon - lon0))
    return np.exp(-((lat - lat0) ** 2 + dlon**2) / (2 * width**2))


def area_mean(T, q):
    w = np.asarray(T.wts) / 2.0
    return float((np.asarray(q).mean(axis=-1) * w).sum())


class TestFVAdvection:
    def test_zonal_solid_body_conserves_and_transports(self):
        T, G = setup()
        q0 = gaussian_blob(T)
        # solid body west->east: u = U0 cos(lat): one full rotation
        U0 = 40.0
        u = jnp.broadcast_to(U0 * T.coslat[:, None], T.grid_shape)
        v = jnp.zeros(T.grid_shape)
        dt = 1800.0
        q = jnp.asarray(q0)

        @jax.jit
        def step(q):
            return q + dt * a_grid_horiz_advection(G, u, v, q, dt)

        mass0 = area_mean(T, q)
        nsteps = int(2 * np.pi * T.radius / U0 / dt)  # ~ one rotation at equator
        for _ in range(nsteps):
            q = step(q)
        qn = np.asarray(q)
        assert np.isfinite(qn).all()
        # monotone: no significant over/undershoots
        assert qn.min() > -1e-9 and qn.max() < 1.0 + 1e-6
        # advective-form transport is not exactly conservative, but close
        assert abs(area_mean(T, q) - mass0) / mass0 < 0.05
        # blob survived (peak not destroyed by diffusion)
        assert qn.max() > 0.4

    def test_meridional_cross_polar_flow(self):
        # uniform northward flow (v>0): blob should move north and remain bounded
        T, G = setup()
        q0 = gaussian_blob(T, lat0=45.0)
        v = jnp.full(T.grid_shape, 10.0)
        u = jnp.zeros(T.grid_shape)
        dt = 1800.0
        q = jnp.asarray(q0)

        @jax.jit
        def step(q):
            return q + dt * a_grid_horiz_advection(G, u, v, q, dt)

        for _ in range(96):
            q = step(q)
        qn = np.asarray(q)
        assert np.isfinite(qn).all()
        assert qn.min() > -1e-6 and qn.max() < 1.1

    def test_polar_integer_cfl(self):
        # strong zonal wind at high latitude -> courant > 1 near poles
        T, G = setup()
        q0 = gaussian_blob(T, lat0=80.0, width=10.0)
        u = jnp.broadcast_to(jnp.full_like(T.coslat, 50.0)[:, None], T.grid_shape)
        v = jnp.zeros(T.grid_shape)
        dt = 3600.0
        # max courant at pole rows >> 1
        b_max = 50.0 * dt / (float(G.dx) * float(G.c.min()))
        assert b_max > 1.5
        q = jnp.asarray(q0)

        @jax.jit
        def step(q):
            return q + dt * a_grid_horiz_advection(G, u, v, q, dt)

        for _ in range(48):
            q = step(q)
        qn = np.asarray(q)
        assert np.isfinite(qn).all()
        assert qn.max() < 1.2 and qn.min() > -1e-6


class TestDycoreTracer:
    def test_passive_grid_tracer_in_hs(self):
        from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel
        from isca_tpu.dycore import vert_advection as va

        core_cfg = PrimitiveConfig(resolution="T21", num_levels=8, dt=1800.0, dtype=jnp.float64)
        attrs = (TracerAttr("dye", representation="grid", vert_scheme=va.VAN_LEER_LINEAR),)
        model = HeldSuarezModel(HeldSuarezConfig(core=core_cfg))
        model.core = PrimitiveCore(core_cfg, tracer_attrs=attrs)
        s = model.core.cold_start(model.surf_geopotential)
        T = model.core.T
        blob = jnp.asarray(
            np.broadcast_to(gaussian_blob(T), (8,) + T.grid_shape).copy(), jnp.float64
        )
        from isca_tpu.dycore.time_integration import TwoLevel
        s.tracers["dye"] = TwoLevel(blob, blob)
        s = jax.jit(lambda s: model.run(s, 48))(s)
        dye = np.asarray(s.tracers["dye"].curr)
        assert np.isfinite(dye).all()
        assert dye.min() > -1e-6 and dye.max() < 1.2


class TestWaterBorrowing:
    def test_holes_filled_conservatively(self):
        from isca_tpu.dycore.water_borrowing import water_borrowing
        L, nlat, nlon = 4, 8, 16
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.uniform(0.001, 0.01, (L, nlat, nlon)))
        q = q.at[2, 4, 7].set(-0.002).at[1, 2, 3].set(-0.001)
        ph = jnp.asarray(np.broadcast_to(
            np.linspace(0, 1e5, L + 1)[:, None, None], (L + 1, nlat, nlon)).copy())
        dp = ph[1:] - ph[:-1]
        dt = 600.0
        dq = water_borrowing(jnp.zeros_like(q), q, ph, dt)
        q2 = q + dt * dq
        assert float(q2.min()) >= -1e-12
        # water mass conserved
        w0 = float((q * dp).sum())
        w1 = float((q2 * dp).sum())
        np.testing.assert_allclose(w1, w0, rtol=1e-10)


class TestOneHotGatherPath:
    def test_f32_onehot_matches_native_gather_exactly(self):
        """The one-hot MXU gather used at f32 selects values bit-for-bit:
        the full advection tendency must equal the native-gather path."""
        from isca_tpu.dycore import fv_advection as fvmod
        T32 = tr.make_transforms("T21", radius=6.371e6, dtype=jnp.float32)
        G32 = make_fv_geometry(T32)
        rng = np.random.default_rng(3)
        L, ny, nx = 4, T32.nlat, T32.nlon
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        q = f32(rng.random((L, ny, nx)))
        u = f32(80.0 * rng.standard_normal((L, ny, nx)))  # big polar CFL
        v = f32(15.0 * rng.standard_normal((L, ny, nx)))
        dt = 1800.0
        out_onehot = jax.jit(
            lambda u, v, q: a_grid_horiz_advection(G32, u, v, q, dt))(u, v, q)
        fvmod._FORCE_NATIVE_GATHER = True
        try:
            out_native = jax.jit(
                lambda u, v, q: a_grid_horiz_advection(G32, u, v, q, dt))(u, v, q)
        finally:
            fvmod._FORCE_NATIVE_GATHER = False
        np.testing.assert_array_equal(np.asarray(out_onehot),
                                      np.asarray(out_native))
