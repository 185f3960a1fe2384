"""Tests for the remaining model variants: giant planet, column, land/topo, dry conv."""

import jax
import jax.numpy as jnp
import numpy as np

from isca_tpu.models.column import ColumnConfig, ColumnModel
from isca_tpu.models.giant import giant_planet_model
from isca_tpu.physics.dry_convection import DryConvectionConfig, dry_convection
from isca_tpu.physics.damping_driver import DampingDriverConfig, damping_driver
from isca_tpu.spectral import transforms as tr
from isca_tpu.utils.topography import band_limit_topography, gaussian_topography, land_mask


class TestDryConvection:
    def test_unstable_profile_adjusts(self):
        L = 16
        sig_h = np.linspace(0, 1, L + 1)[None, :]
        ph = jnp.asarray(sig_h * 1e5)
        pf = 0.5 * (ph[:, 1:] + ph[:, :-1])
        # superadiabatic: potential temperature decreasing with height
        theta = 300.0 + 40.0 * (pf / 1e5 - 1.0)
        t = jnp.asarray(theta * (pf / 1e5) ** (2.0 / 7.0))
        r = dry_convection(DryConvectionConfig(tau=3600.0), t, pf, ph)
        assert float(r.cape[0]) > 0.0
        dt = np.asarray(r.dt_tg)[0]
        assert np.isfinite(dt).all()
        # enthalpy conserved: integral of dT dp ~ 0 over the column
        dp = np.asarray(ph)[0, 1:] - np.asarray(ph)[0, :-1]
        scale = (np.abs(dt) * dp).sum() + 1e-12
        assert abs((dt * dp).sum()) / scale < 1e-6

    def test_stable_profile_untouched(self):
        L = 12
        ph = jnp.asarray(np.linspace(0, 1, L + 1)[None, :] * 1e5)
        pf = 0.5 * (ph[:, 1:] + ph[:, :-1])
        t = jnp.asarray(300.0 * (pf / 1e5) ** 0.1)  # very stable
        r = dry_convection(DryConvectionConfig(), t, pf, ph)
        np.testing.assert_allclose(np.asarray(r.dt_tg), 0.0, atol=1e-12)


class TestDampingDriver:
    def test_sponge_damps_top_only(self):
        cfg = DampingDriverConfig(sponge_pbottom=50.0)
        L = 10
        pf = jnp.asarray(np.logspace(0, 5, L)[None, :])  # 1 Pa .. 1e5 Pa
        u = jnp.full((1, L), 10.0)
        v = jnp.zeros((1, L))
        z = jnp.zeros((1, L))
        r = damping_driver(cfg, 600.0, pf, u, v, z, z, z)
        du = np.asarray(r.dt_u)[0]
        assert (du[np.asarray(pf)[0] < 50.0] < 0).all()
        np.testing.assert_allclose(du[np.asarray(pf)[0] >= 50.0], 0.0)


class TestTopography:
    def test_gaussian_mountain(self):
        lons = np.linspace(0, 360, 128, endpoint=False)
        lats = np.linspace(-87, 87, 64)
        z = gaussian_topography(lons, lats, height=3000.0, olon=90.0, olat=45.0)
        assert abs(z.max() - 3000.0) < 10.0  # grid does not sample the exact peak
        jpk, ipk = np.unravel_index(z.argmax(), z.shape)
        assert abs(lats[jpk] - 45.0) < 3.0 and abs(lons[ipk] - 90.0) < 3.0

    def test_land_masks(self):
        lons = np.linspace(0, 360, 128, endpoint=False)
        lats = np.linspace(-87, 87, 64)
        sq = land_mask(lons, lats, "square", (20, 60, 20, 60))
        assert 0.0 < sq.mean() < 0.2
        conts = land_mask(lons, lats, "continents")
        assert 0.05 < conts.mean() < 0.5

    def test_band_limit(self):
        T = tr.make_transforms("T21", dtype=jnp.float64)
        lats = np.degrees(np.asarray(T.lats))
        lons = np.degrees(np.asarray(T.lons))
        z = gaussian_topography(lons, lats, height=3000.0)
        zb = band_limit_topography(T, z)
        # band-limiting is idempotent
        zb2 = band_limit_topography(T, zb)
        np.testing.assert_allclose(np.asarray(zb2), np.asarray(zb), atol=1e-8)


class TestColumnModel:
    def test_single_column_radiative_convective(self):
        cfg = ColumnConfig(num_levels=16, dt=1200.0, dtype=jnp.float64)
        model = ColumnModel(cfg)
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 72 * 5))(s)  # 5 days
        t = np.asarray(s.t.curr)
        assert np.isfinite(t).all()
        assert 150 < t.min() and t.max() < 400
        # boundary layer should have warmed toward the 285 K surface
        assert t[0, 0, -1] > 270.0

    def test_column_batch(self):
        cfg = ColumnConfig(nlat=4, nlon=1, lat_deg=30.0, num_levels=12, dt=1200.0,
                           dtype=jnp.float64)
        model = ColumnModel(cfg)
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 48))(s)
        assert np.isfinite(np.asarray(s.t.curr)).all()


class TestGiantPlanet:
    def test_jupiter_runs(self):
        model = giant_planet_model(resolution="T21", num_levels=10, dt=600.0,
                                   dtype=jnp.float64)
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 96))(s)
        d = model.diagnostics(s)
        assert np.isfinite(float(d["tmax"]))
        assert 50.0 < float(d["tmin"]) and float(d["tmax"]) < 800.0


import os
import pytest

_ERA5_TOPO = "/root/reference/input/era5_smoothed_topography_land_masks/era-spectral_T42_64x128.nc"
_ERA_LAND = "/root/reference/input/land_masks/era_land_t42.nc"


@pytest.mark.skipif(not os.path.exists(_ERA5_TOPO), reason="reference inputs absent")
class TestRealisticContinents:
    def test_load_and_regrid_era5(self):
        from isca_tpu.utils.input_files import load_topography, read_netcdf
        T = tr.make_transforms("T42", dtype=jnp.float64)
        lats = np.degrees(np.asarray(T.lats))
        lons = np.degrees(np.asarray(T.lons))
        z = load_topography(_ERA5_TOPO, lats, lons)
        assert z.shape == (64, 128)
        assert 1000 < z.max() < 7000   # Himalaya-ish after spectral smoothing
        lm = load_topography(_ERA_LAND, lats, lons, var="land_mask")
        assert 0.2 < lm.mean() < 0.4   # ~30% land
        # orientation check: high topography in the NH (Tibet ~ 30-40N)
        nh = z[lats > 20].max()
        sh = z[(lats < -20) & (lats > -60)].max()
        assert nh > sh

    def test_realistic_earth_model_runs(self):
        """Realistic-Earth configuration: ERA5 topography + land + seasons."""
        from isca_tpu.utils.input_files import load_topography
        from isca_tpu.dycore.primitive import PrimitiveConfig
        from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
        from isca_tpu.physics.moist_driver import MoistPhysicsConfig
        from isca_tpu.physics.two_stream_gray import TwoStreamConfig

        core = PrimitiveConfig(
            resolution="T21", num_levels=12, dt=900.0, dtype=jnp.float64,
            vert_coord_option="uneven_sigma",
            vert_coord_kwargs=(("scale_heights", 6.0), ("surf_res", 0.5),
                               ("exponent", 7.5)),
            do_water_correction=True, water_correction_limit=200.0e2,
            robert_coeff=0.03,
        )
        phys = MoistPhysicsConfig(
            bucket=True,
            radiation=TwoStreamConfig(do_seasonal=True, use_time_average_coszen=True),
        )
        model = GreyMoistModel(GreyMoistConfig(core=core, physics=phys))
        T = model.core.T
        lats = np.degrees(np.asarray(T.lats))
        lons = np.degrees(np.asarray(T.lons))
        z = load_topography(_ERA5_TOPO, lats, lons)
        lm = (load_topography(_ERA_LAND, lats, lons, var="land_mask") > 0.5).astype(float)
        model.set_land(lm, surf_geopotential=np.maximum(z, 0.0) * lm)
        s = model.initial_state()
        s = jax.jit(lambda s: model.run(s, 96))(s)
        d = model.diagnostics(s)
        assert np.isfinite(float(d["tmax"]))
        assert 140.0 < float(d["tmin"]) and float(d["tmax"]) < 350.0
