"""Trip-test analogue: golden regression over the reference's test-case matrix.

The reference's trip tests (exp/test_cases/trip_test/trip_test_functions.py:
151-260) run each covered configuration for 3 days at reduced size on two
code versions and demand bitwise-identical output - its core reproducibility
contract.  XLA does not promise bitwise stability across compiler versions,
so the contract here is numerical: each configuration runs 2 model days at
T21 (float64, CPU), and compact statistics of every prognostic/diagnostic
field (mean / std / min / max + four probe values) are compared against the
goldens in tests/goldens/trip_goldens.json at tight tolerances.

Covered matrix (the full trip_test_functions.py:151-172 set):
held_suarez, axisymmetric, frierson, bucket_model, top_down_test,
giant_planet, mima (RRTM seasonal aquaplanet), variable_co2_grey,
variable_co2_rrtm, ape_aquaplanet, realistic_continents_fixed_sst,
realistic_continents_variable_qflux, simple_clouds,
socrates_aquaplanet, socrates_aquaplanet_with_cloud,
barotropic_vort_eq_stirring, shallow_water_stirring.

Usage:
  python tools/trip_test.py                 # run all, compare to goldens
  python tools/trip_test.py --update        # regenerate goldens
  python tools/trip_test.py --only frierson,held_suarez
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

import jax.numpy as jnp
import numpy as np

# Builders read DTYPE so tools/tpu_smoke.py can rebuild the same matrix at
# float32 for on-chip validation. The golden path (main) uses float64 CPU.
DTYPE = jnp.float64


def _use_cpu_f64():
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "goldens", "trip_goldens.json")
DAYS = 2.0

# tolerances for golden comparison: f64 trajectories over 2 days are stable
# to ~1e-10 relative under compiler changes; chaotic growth from last-bit
# differences stays far below this horizon at T21
RTOL = 1e-7
ATOL_SCALE = 1e-9      # x field scale


def _moist_core(L=8, dt=1200.0, **kw):
    from isca_tpu.dycore.primitive import PrimitiveConfig
    return PrimitiveConfig(
        resolution="T21", num_levels=L, dt=dt, dtype=DTYPE,
        vert_coord_option="uneven_sigma",
        vert_coord_kwargs=(("scale_heights", 6.0), ("surf_res", 0.5),
                           ("exponent", 7.5)),
        do_water_correction=True, water_correction_limit=200.0e2,
        robert_coeff=0.03, **kw)


def _moist(phys_kw=None, core_kw=None, land=False):
    import dataclasses
    from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
    from isca_tpu.physics.moist_driver import MoistPhysicsConfig
    core = _moist_core(**(core_kw or {}))
    phys = MoistPhysicsConfig(**(phys_kw or {}))
    model = GreyMoistModel(GreyMoistConfig(core=core, physics=phys))
    if land:
        from isca_tpu.utils.land_generator import generate_land
        lats = np.degrees(np.asarray(model.core.T.lats))
        lons = np.degrees(np.asarray(model.core.T.lons))
        mask, _ = generate_land(lats, lons, land_mode="square")
        model.set_land(jnp.asarray(mask, DTYPE))
    return model


def _co2_ramp(model):
    from isca_tpu.utils.time_interp import TimeSeries
    model.physics.co2_series = TimeSeries(
        data=jnp.asarray([300.0, 600.0]),
        times=jnp.asarray([0.0, 360.0 * 86400.0]),
        periodic=False, period_seconds=0.0)
    return model


def build_held_suarez():
    from isca_tpu.dycore.primitive import PrimitiveConfig
    from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel
    core = PrimitiveConfig(resolution="T21", num_levels=8, dt=1200.0,
                           dtype=DTYPE)
    return HeldSuarezModel(HeldSuarezConfig(core=core))


def build_axisymmetric():
    from isca_tpu.dycore.primitive import PrimitiveConfig
    from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel
    core = PrimitiveConfig(resolution="T21", num_levels=8, dt=1200.0,
                           dtype=DTYPE, make_symmetric=True)
    return HeldSuarezModel(HeldSuarezConfig(core=core))


def build_held_suarez_substeps():
    """num_steps=2 dycore substepping (spectral_dynamics.F90:832 step_loop;
    giant-planet-class configurations rely on it)."""
    from isca_tpu.dycore.primitive import PrimitiveConfig
    from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel
    core = PrimitiveConfig(resolution="T21", num_levels=8, dt=1200.0,
                           dtype=DTYPE, num_steps=2)
    return HeldSuarezModel(HeldSuarezConfig(core=core))


def build_frierson():
    return _moist()


def build_bucket_model():
    return _moist(phys_kw=dict(bucket=True), land=True)


def build_top_down_test():
    from isca_tpu.physics.two_stream_gray import TwoStreamConfig
    return _moist(phys_kw=dict(radiation=TwoStreamConfig(rad_scheme="byrne")))


def build_giant_planet():
    from isca_tpu.models.giant import giant_planet_model
    return giant_planet_model(resolution="T21", num_levels=8, dt=900.0,
                              dtype=DTYPE)


def build_mima():
    from isca_tpu.physics.rrtm_radiation import RRTMConfig
    return _moist(phys_kw=dict(radiation_scheme="rrtm",
                               rrtm=RRTMConfig(do_seasonal=True)))


def build_variable_co2_grey():
    from isca_tpu.physics.two_stream_gray import TwoStreamConfig
    m = _moist(phys_kw=dict(radiation=TwoStreamConfig(rad_scheme="byrne")))
    return _co2_ramp(m)


def build_variable_co2_rrtm():
    from isca_tpu.physics.rrtm_radiation import RRTMConfig
    m = _moist(phys_kw=dict(radiation_scheme="rrtm", rrtm=RRTMConfig()))
    return _co2_ramp(m)


def build_ape_aquaplanet():
    from isca_tpu.physics.mixed_layer import MixedLayerConfig
    return _moist(phys_kw=dict(mixed_layer=MixedLayerConfig(do_ape_sst=True)))


def build_realistic_continents_fixed_sst():
    from isca_tpu.physics.mixed_layer import MixedLayerConfig
    return _moist(phys_kw=dict(mixed_layer=MixedLayerConfig(do_ape_sst=True)),
                  land=True)


def build_realistic_continents_variable_qflux():
    from isca_tpu.physics.mixed_layer import MixedLayerConfig
    return _moist(phys_kw=dict(mixed_layer=MixedLayerConfig(
        do_qflux=True, qflux_amp=30.0)), land=True)


def build_realistic_continents_topo():
    """Continents + band-limited Sauliere topography + bucket: guards the
    surface-height path (set_land takes METERS; topography must be
    band-limited through the model truncation before use)."""
    import dataclasses

    from isca_tpu.utils.land_generator import generate_land
    from isca_tpu.utils.topography import band_limit_topography

    model = _moist(phys_kw=dict(bucket=True))
    lats = np.degrees(np.asarray(model.core.T.lats))
    lons = np.degrees(np.asarray(model.core.T.lons))
    land, topo = generate_land(lats, lons, "continents",
                               topo_mode="sauliere2012")
    topo = band_limit_topography(model.core.T, np.asarray(topo, np.float64),
                                 n_smooth_passes=2, smooth_fraction=0.02)
    model.set_land(jnp.asarray(land, DTYPE), surf_geopotential=topo)
    return model


def build_simple_clouds():
    return _moist(phys_kw=dict(do_cloud_simple=True))


def build_socrates_aquaplanet():
    from isca_tpu.physics.socrates import SocratesConfig
    return _moist(phys_kw=dict(radiation_scheme="socrates",
                               socrates=SocratesConfig()))


def build_socrates_aquaplanet_with_cloud():
    from isca_tpu.physics.socrates import SocratesConfig
    return _moist(phys_kw=dict(radiation_scheme="socrates",
                               socrates=SocratesConfig(),
                               do_cloud_simple=True))


def build_barotropic_vort_eq_stirring():
    from isca_tpu.models.barotropic import BarotropicConfig, BarotropicModel
    cfg = BarotropicConfig(
        resolution="T21", dt=1200.0, dtype=DTYPE,
        initial_zonal_wind="zero", stirring_amplitude=3.0e-11,
        damping_order=2, damping_coeff_r=1.929e-6)
    return BarotropicModel(cfg)


def build_shallow_water_stirring():
    from isca_tpu.models.shallow import ShallowConfig, ShallowModel
    cfg = ShallowConfig(resolution="T21", dt=1200.0, dtype=DTYPE,
                        stirring_amplitude=1.0e-11)
    return ShallowModel(cfg)


CONFIGS = {
    "held_suarez": build_held_suarez,
    "held_suarez_substeps": build_held_suarez_substeps,
    "axisymmetric": build_axisymmetric,
    "frierson": build_frierson,
    "bucket_model": build_bucket_model,
    "top_down_test": build_top_down_test,
    "giant_planet": build_giant_planet,
    "mima": build_mima,
    "variable_co2_grey": build_variable_co2_grey,
    "variable_co2_rrtm": build_variable_co2_rrtm,
    "ape_aquaplanet": build_ape_aquaplanet,
    "realistic_continents_fixed_sst": build_realistic_continents_fixed_sst,
    "realistic_continents_variable_qflux":
        build_realistic_continents_variable_qflux,
    "realistic_continents_topo": build_realistic_continents_topo,
    "simple_clouds": build_simple_clouds,
    "socrates_aquaplanet": build_socrates_aquaplanet,
    "socrates_aquaplanet_with_cloud": build_socrates_aquaplanet_with_cloud,
    "barotropic_vort_eq_stirring": build_barotropic_vort_eq_stirring,
    "shallow_water_stirring": build_shallow_water_stirring,
}


# ---------------------------------------------------------------------------
# Slow tier (--slow): one configuration at the REFERENCE test-case resolution
# for the reference trip-test run length (3 days, trip_test_functions.py:
# 258-260), mirroring its budget instead of the fast T21 reduction above.
# Weekly/manual: not part of the default pytest suite.
# ---------------------------------------------------------------------------

def build_frierson_fullres():
    """The full frierson_test_case.py configuration: T42L25, Frierson sigma
    ladder, dt=720 s (reference exp/test_cases/frierson/frierson_test_case.py)."""
    import dataclasses
    from isca_tpu.models.moist import GreyMoistModel, frierson_test_case_config
    cfg = frierson_test_case_config()
    cfg = dataclasses.replace(
        cfg, core=dataclasses.replace(cfg.core, dtype=DTYPE))
    return GreyMoistModel(cfg)


def build_held_suarez_fullres():
    """Held-Suarez at the reference's default production shape: T85L25,
    dt=600 s (held_suarez_test_case.py:48-51 runs the default resolution
    exp at T85; the bench configuration matches this shape)."""
    from isca_tpu.dycore.primitive import PrimitiveConfig
    from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel
    core = PrimitiveConfig(resolution="T85", num_levels=25, dt=600.0,
                           dtype=DTYPE)
    return HeldSuarezModel(HeldSuarezConfig(core=core))


def build_giant_fullres():
    """Giant planet at T85L30 (the chip-budget reduction of the reference's
    T213L30 giant_planet_test_case.py shape): Jupiter constants, dry
    convection, S&L09 grey radiation, gp lower boundary — the full-res
    regression net's non-Earth entry (round-4 verdict item 8). cutoff_wn
    scales from the reference's T213 value like the climate gate does."""
    from isca_tpu.models.giant import giant_planet_model
    return giant_planet_model(resolution="T85", num_levels=30,
                              cutoff_wn=max(int(round(100 * 85 / 213)), 8),
                              dtype=DTYPE)


def build_mima_fullres():
    """MiMA at the reference namelist shape (T42, reference level count,
    RRTMG SW+LW with dt_rad substepping) — the full-res regression net's
    RRTM entry. Built through the same namelist-ingestion path as the
    climate gate (exp/namelists/mima.nml)."""
    import warnings

    from tools.from_namelist import model_from_namelist, parse_namelist
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "..", "exp", "namelists", "mima.nml")) as fh:
        nml = parse_namelist(fh.read())
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # synthetic LW tables
        return model_from_namelist(nml, dtype=DTYPE)


SLOW_CONFIGS = {"frierson_fullres": build_frierson_fullres,
                "held_suarez_fullres": build_held_suarez_fullres,
                "giant_fullres": build_giant_fullres,
                "mima_fullres": build_mima_fullres}
SLOW_DAYS = 3.0
SLOW_GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "..", "tests",
                                "goldens", "trip_goldens_slow.json")


def field_stats(a) -> dict:
    a = np.asarray(a, np.float64).ravel()
    n = a.size
    probes = [float(a[i]) for i in (0, n // 3, (2 * n) // 3, n - 1)]
    return {"mean": float(a.mean()), "std": float(a.std()),
            "min": float(a.min()), "max": float(a.max()), "probes": probes}


def run_config(name: str, configs=None, days=None) -> dict:
    model = (configs or CONFIGS)[name]()
    state = model.initial_state()
    dt = getattr(model.config, "dt", None) or model.config.core.dt
    steps = int(round((days or DAYS) * 86400.0 / dt))
    state = jax.jit(lambda s: model.run(s, steps, first=True))(state)
    jax.block_until_ready(state)
    fields = model.diag_fields(state)
    return {fname: field_stats(v) for fname, v in sorted(fields.items())}


def compare(name: str, got: dict, golden: dict) -> list[str]:
    errors = []
    for fname, g in golden.items():
        if fname not in got:
            errors.append(f"{name}.{fname}: missing")
            continue
        o = got[fname]
        scale = max(abs(g["max"]), abs(g["min"]), 1e-30)
        for k in ("mean", "std", "min", "max"):
            if not np.isclose(o[k], g[k], rtol=RTOL, atol=ATOL_SCALE * scale):
                errors.append(
                    f"{name}.{fname}.{k}: {o[k]!r} != golden {g[k]!r}")
        for i, (a, b) in enumerate(zip(o["probes"], g["probes"])):
            if not np.isclose(a, b, rtol=RTOL, atol=ATOL_SCALE * scale):
                errors.append(
                    f"{name}.{fname}.probe[{i}]: {a!r} != golden {b!r}")
    for fname in got:
        if fname not in golden:
            errors.append(f"{name}.{fname}: new field not in golden "
                          "(rerun with --update)")
    return errors


def main():
    _use_cpu_f64()
    p = argparse.ArgumentParser()
    p.add_argument("--update", action="store_true",
                   help="regenerate the goldens")
    p.add_argument("--only", default="",
                   help="comma-separated subset of config names")
    p.add_argument("--slow", action="store_true",
                   help="slow tier: full test-case resolution, 3 days "
                        "(weekly/manual; mirrors the reference trip-test "
                        "budget, trip_test_functions.py:258-260)")
    args = p.parse_args()

    configs = SLOW_CONFIGS if args.slow else CONFIGS
    days = SLOW_DAYS if args.slow else DAYS
    golden_path = SLOW_GOLDEN_PATH if args.slow else GOLDEN_PATH

    names = [n for n in (args.only.split(",") if args.only else configs)
             if n]
    for n in names:
        if n not in configs:
            p.error(f"unknown config {n!r}; known: {', '.join(configs)}")

    goldens = {}
    if os.path.exists(golden_path):
        with open(golden_path) as f:
            goldens = json.load(f)

    failures = []
    for n in names:
        t0 = time.time()
        got = run_config(n, configs=configs, days=days)
        wall = time.time() - t0
        if args.update:
            goldens[n] = got
            print(f"  {n}: updated ({wall:.1f}s)")
        elif n not in goldens:
            failures.append(f"{n}: no golden recorded (run with --update)")
            print(f"  {n}: NO GOLDEN ({wall:.1f}s)")
        else:
            errs = compare(n, got, goldens[n])
            failures.extend(errs)
            print(f"  {n}: {'OK' if not errs else 'FAIL'} ({wall:.1f}s)")
            for e in errs[:8]:
                print(f"    {e}")

    if args.update:
        os.makedirs(os.path.dirname(golden_path), exist_ok=True)
        with open(golden_path, "w") as f:
            json.dump(goldens, f, indent=1, sort_keys=True)
        print(f"goldens written: {golden_path}")
        return 0
    if failures:
        print(f"{len(failures)} golden mismatches")
        return 1
    print("all configs match goldens")
    return 0


if __name__ == "__main__":
    sys.exit(main())
