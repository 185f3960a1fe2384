"""SimCloud diagnostic cloud scheme tests.

Reference behavior: src/atmos_param/cloud_simple/ (cloud_simple.F90,
large_scale_cloud.F90, marine_strat_cloud.F90, cloud_cover_diags.F90).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from isca_tpu.constants import EARTH
from isca_tpu.physics.cloud_simple import (
    CloudSimple,
    CloudSimpleConfig,
    LargeScaleCloudConfig,
    MarineStratConfig,
    cloud_cover_diags,
    large_scale_cloud_fraction,
    lcl_height,
)
from isca_tpu.physics.sat_vapor_pres import SatVaporPres


def make_column(L=20, ps=1.0e5, t_sfc=290.0, rh=0.5):
    """A single (1,1,L) column with uniform RH."""
    p_half = jnp.linspace(100.0, ps, L + 1)
    p_full = 0.5 * (p_half[:-1] + p_half[1:])
    t = t_sfc * (p_full / ps) ** 0.12
    svp = SatVaporPres(constants=EARTH, do_simple=True)
    q = rh * svp.qs(t, p_full)
    z = 8000.0 * jnp.log(ps / p_full)
    return (p_half[None, None, :], p_full[None, None, :], t[None, None, :],
            q[None, None, :], z[None, None, :], svp)


class TestLargeScaleCloud:
    def test_formulas_bounded_and_monotone_in_rh(self):
        L = 20
        p_half, p_full, t, q, z, svp = make_column(L)
        ps = p_half[..., -1]
        w = jnp.zeros_like(p_full)
        qcl = jnp.full_like(p_full, 1e-8)
        qs = svp.qs(t, p_full)
        for formula in ["LINEAR", "SPOOKIE", "SUNDQVIST", "SMITH", "SLINGO", "XR96"]:
            cfg = LargeScaleCloudConfig(formula=formula)
            cf_lo, _ = large_scale_cloud_fraction(cfg, p_full, ps, 0.5 + 0 * p_full,
                                                  0.5 * qs, qs, qcl, w)
            cf_hi, _ = large_scale_cloud_fraction(cfg, p_full, ps, 0.99 + 0 * p_full,
                                                  0.99 * qs, qs, qcl, w)
            assert jnp.all(cf_lo >= 0.0) and jnp.all(cf_lo <= 1.0), formula
            assert jnp.all(cf_hi >= cf_lo - 1e-12), formula
            # saturation -> full cloud for formulas that reach 1 at RH=1
            if formula in ("LINEAR", "SPOOKIE", "SUNDQVIST", "SLINGO"):
                cf_sat, _ = large_scale_cloud_fraction(
                    cfg, p_full, ps, 1.0 + 0 * p_full, qs, qs, qcl, w)
                np.testing.assert_allclose(np.asarray(cf_sat), 1.0, atol=1e-6)

    def test_linear_formula_closed_form(self):
        """cf = a*(rh-1)+1 with a from the exp profile (large_scale_cloud.F90:316-331)."""
        cfg = LargeScaleCloudConfig(formula="LINEAR")
        p_full = jnp.array([[[9.0e4]]])
        ps = jnp.array([[1.0e5]])
        rh = jnp.array([[[0.98]]])
        cf, _ = large_scale_cloud_fraction(cfg, p_full, ps, rh, rh, rh * 0 + 1,
                                           rh * 0, rh * 0)
        a = cfg.linear_a_top + (cfg.linear_a_surf - cfg.linear_a_top) * np.exp(
            1.0 - (1.0e5 / 9.0e4) ** cfg.linear_power)
        expect = np.clip(a * (0.98 - 1.0) + 1.0, 0, 1)
        np.testing.assert_allclose(np.asarray(cf)[0, 0, 0], expect, rtol=1e-6)

    def test_omega_adjustment_removes_subsiding_low_cloud(self):
        cfg = LargeScaleCloudConfig(formula="LINEAR", do_adjust_cld_by_omega=True)
        p_half, p_full, t, q, z, svp = make_column()
        ps = p_half[..., -1]
        rh = jnp.full_like(p_full, 0.995)
        strong_subsidence = jnp.full_like(p_full, 0.5)   # > threshold
        cf, _ = large_scale_cloud_fraction(cfg, p_full, ps, rh, q, q / rh,
                                           q * 0, strong_subsidence)
        low = p_full > cfg.adj_pres_threshold
        assert jnp.all(jnp.where(low, cf, 0.0) == 0.0)

    def test_freezedry_reduces_dry_polar_cloud(self):
        base = LargeScaleCloudConfig(formula="LINEAR")
        fd = LargeScaleCloudConfig(formula="LINEAR", do_freezedry=True)
        p_half, p_full, t, q, z, svp = make_column(t_sfc=250.0)
        ps = p_half[..., -1]
        qdry = jnp.full_like(p_full, 1e-5)   # well below qv_polar_val
        rh = jnp.full_like(p_full, 0.99)
        w = jnp.zeros_like(p_full)
        cf0, _ = large_scale_cloud_fraction(base, p_full, ps, rh, qdry, qdry / rh, q * 0, w)
        cf1, _ = large_scale_cloud_fraction(fd, p_full, ps, rh, qdry, qdry / rh, q * 0, w)
        assert jnp.all(cf1 <= cf0 + 1e-12)
        assert jnp.any(cf1 < cf0 - 1e-3)
        # floor at 0.15 of the unadjusted value
        assert jnp.all(cf1 >= 0.15 * cf0 - 1e-12)


class TestCloudCoverDiags:
    def test_two_separated_blocks_maxrnd(self):
        """Max within contiguous blocks, random between (cloud_cover_diags.F90)."""
        cf = jnp.array([[[0.0, 0.3, 0.5, 0.0, 0.2, 0.4, 0.0]]])
        L = cf.shape[-1]
        p_full = jnp.linspace(2.0e4, 9.5e4, L)[None, None, :]
        p_half = jnp.linspace(1.8e4, 1.0e5, L + 1)[None, None, :]
        out = cloud_cover_diags(cf, p_full, p_half, "MAXIMUM-RANDOM")
        expect = (1.0 - (1.0 - 0.5) * (1.0 - 0.4)) * 100.0
        np.testing.assert_allclose(np.asarray(out["tot_cld_amt"])[0, 0], expect,
                                   rtol=1e-6)

    def test_max_and_random_overlap(self):
        cf = jnp.array([[[0.2, 0.5, 0.1]]])
        p_full = jnp.array([[[3.0e4, 5.0e4, 8.0e4]]])
        p_half = jnp.array([[[2.5e4, 4.0e4, 6.0e4, 1.0e5]]])
        mx = cloud_cover_diags(cf, p_full, p_half, "MAXIMUM")
        rnd = cloud_cover_diags(cf, p_full, p_half, "RANDOM")
        np.testing.assert_allclose(np.asarray(mx["tot_cld_amt"])[0, 0], 50.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(rnd["tot_cld_amt"])[0, 0],
                                   (1 - 0.8 * 0.5 * 0.9) * 100.0, rtol=1e-6)
        # band splits
        np.testing.assert_allclose(np.asarray(mx["high_cld_amt"])[0, 0], 20.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mx["mid_cld_amt"])[0, 0], 50.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mx["low_cld_amt"])[0, 0], 10.0, rtol=1e-6)


class TestCloudSimpleDriver:
    def make(self, **kw):
        cfg = CloudSimpleConfig(**kw)
        svp = SatVaporPres(constants=EARTH, do_simple=True)
        return CloudSimple(cfg, svp)

    def test_phase_partition_and_reff(self):
        scheme = self.make()
        p_half, p_full, t, q, z, svp = make_column(t_sfc=300.0)
        w = jnp.zeros_like(p_full)
        res = scheme(p_half, p_full, t, q, z, w, p_half[..., -1])
        C = EARTH
        warm = t > C.tfreeze + scheme.config.T_max
        cold = t < C.tfreeze + scheme.config.T_min
        assert jnp.all(jnp.where(warm, res.frac_liq, 1.0) == 1.0)
        assert jnp.all(jnp.where(cold, res.frac_liq, 0.0) == 0.0)
        assert jnp.all(res.reff_rad >= scheme.config.reff_liq - 1e-9)
        assert jnp.all(res.reff_rad <= scheme.config.reff_ice + 1e-9)
        # qcl = cf * in-cloud value; zero where cloud-free
        assert jnp.all(jnp.where(res.cf == 0.0, res.qcl_rad, 0.0) == 0.0)

    def test_marine_strat_adds_cloud_under_inversion(self):
        """A subsiding ocean column with a sharp low-level inversion gains cloud."""
        L = 25
        ps = 1.0e5
        p_half = jnp.linspace(100.0, ps, L + 1)[None, None, :]
        p_full = 0.5 * (p_half[..., :-1] + p_half[..., 1:])
        # neutral profile with a strong inversion near 900 hPa
        t = 288.0 * (p_full / ps) ** 0.12
        inv = jnp.exp(-((p_full - 9.0e4) / 2.0e3) ** 2) * 12.0
        t = t + inv
        svp = SatVaporPres(constants=EARTH, do_simple=True)
        q = 0.6 * svp.qs(t, p_full)
        z = 8000.0 * jnp.log(ps / p_full)
        w = jnp.full_like(p_full, 0.05)   # subsiding
        base = self.make(do_add_stratocumulus=False)
        strat = self.make(do_add_stratocumulus=True,
                          marine_strat=MarineStratConfig(method="EIS_WOOD"))
        r0 = base(p_half, p_full, t, q, z, w, p_half[..., -1])
        r1 = strat(p_half, p_full, t, q, z, w, p_half[..., -1])
        assert float(jnp.max(r1.cf - r0.cf)) > 0.05

    def test_park_elf_and_other_methods_run(self):
        p_half, p_full, t, q, z, svp = make_column(L=25)
        w = jnp.full_like(p_full, 0.05)
        for method in ["PARK_ELF", "LTS", "SLINGO", "ECTEI"]:
            scheme = self.make(do_add_stratocumulus=True,
                               marine_strat=MarineStratConfig(method=method))
            res = scheme(p_half, p_full, t, q, z, w, p_half[..., -1])
            assert jnp.all(res.cf >= 0.0) and jnp.all(res.cf <= 1.0), method

    def test_lcl_height_reasonable(self):
        """Bolton LCL: ~0 when saturated; higher when drier; ballpark values."""
        z_sat = lcl_height(jnp.array(290.0), jnp.array(1.0), EARTH)
        z_50 = lcl_height(jnp.array(290.0), jnp.array(0.5), EARTH)
        z_30 = lcl_height(jnp.array(290.0), jnp.array(0.3), EARTH)
        assert float(z_sat) < 30.0
        assert 1000.0 < float(z_50) < 2500.0
        assert float(z_30) > float(z_50)


class TestDriverIntegration:
    def test_moist_driver_emits_cloud_diags(self):
        import dataclasses

        from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel

        cfg = GreyMoistConfig()
        cfg = dataclasses.replace(
            cfg,
            core=dataclasses.replace(cfg.core, resolution="T21", num_levels=10),
            physics=dataclasses.replace(cfg.physics, do_cloud_simple=True),
        )
        model = GreyMoistModel(cfg)
        state = model.initial_state()
        state, diag = model.step_with_diagnostics(state)
        for key in ("cf", "reff_rad", "qcl_rad", "tot_cld_amt"):
            assert key in diag, key
        assert np.all(np.isfinite(np.asarray(diag["cf"])))


class TestCloudSpookie:
    def test_protocols_run_and_bound(self):
        from isca_tpu.physics.cloud_simple import (CloudSpookieConfig,
                                                   cloud_spookie)
        from isca_tpu.physics.sat_vapor_pres import SatVaporPres

        p_half, p_full, t, q, z, svp = make_column(L=20, rh=0.9)
        for proto in (1, 2):
            cfg = CloudSpookieConfig(spookie_protocol=proto)
            cf, cca, reff, qcl, diag = cloud_spookie(cfg, svp, p_full, t, q)
            assert np.all(np.asarray(cf) >= 0.0) and np.all(np.asarray(cf) <= 1.0)
            assert np.all(np.isfinite(np.asarray(qcl)))
            r = np.asarray(reff)
            assert np.all((r >= 10.0 - 1e-6) & (r <= 20.0 + 1e-6))

    def test_protocol2_saturated_full_cloud(self):
        from isca_tpu.physics.cloud_simple import (CloudSpookieConfig,
                                                   cloud_spookie)

        p_half, p_full, t, q, z, svp = make_column(L=20)
        qs = svp.qs(t, p_full)
        cfg = CloudSpookieConfig()
        cf, _, _, _, _ = cloud_spookie(cfg, svp, p_full, t, qs)
        # at the surface rh_min_sfc = rh_max_sfc = 1 -> no cloud by design;
        # above p_base saturation gives full cloud
        above = np.asarray(p_full) < cfg.p_base
        np.testing.assert_allclose(np.asarray(cf)[above], 1.0, atol=1e-5)

    def test_spookie_in_moist_driver(self):
        import dataclasses

        from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel

        cfg = GreyMoistConfig()
        cfg = dataclasses.replace(
            cfg,
            core=dataclasses.replace(cfg.core, resolution="T21", num_levels=10),
            physics=dataclasses.replace(cfg.physics, do_cloud_spookie=True),
        )
        model = GreyMoistModel(cfg)
        state = model.initial_state()
        state, diag = model.step_with_diagnostics(state, first=True)
        assert "cf" in diag and "rh_min" in diag
        assert np.all(np.isfinite(np.asarray(diag["cf"])))
