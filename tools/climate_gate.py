#!/usr/bin/env python
"""Climate gate: long-run climatology checks against published results.

BASELINE.md's correctness targets include a climate gate - the spun-up
zonal-mean circulation must match the literature that defines each test case:

* Held & Suarez (1994, BAMS): eddy-driven midlatitude jets of ~30 m/s near
  sigma~0.25 at 40-50 deg, easterlies aloft in the tropics, surface westerlies
  in midlatitudes, polar-vortex-free (no stratosphere), T ~ 200 K tropopause.
* Frierson et al. (2006, JAS) grey-radiation aquaplanet: a single ITCZ with
  tropical precipitation maximum, subtropical dry zones, midlatitude storm
  tracks, jet near 45 deg, warm (~295-300 K) tropical SST-like t_surf.

Run on TPU (fast: ~1500 model days in under a minute) or CPU:

    python tools/climate_gate.py [--days 1200] [--json out.json]

Prints one PASS/FAIL line per criterion and a JSON summary.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def zonal_time_mean(model, state, nsteps_spinup, nsteps_avg, accum_fields):
    """Run spinup, then accumulate zonal means of requested diagnostics.

    With nsteps_spinup == 0 the state is assumed already integrated (warm
    leapfrog levels) and averaging starts immediately — no first=True
    cold-restart chunk is inserted mid-integration."""

    # Dispatch in ~day-sized jit chunks (very long single scans stall the
    # remote compiler; 1 ms/dispatch is negligible at this chunk size).
    CH = 256
    run_chunk = jax.jit(lambda s: model.run(s, CH, first=False))

    t0 = time.time()
    if nsteps_spinup > 0:
        run_first = jax.jit(lambda s: model.run(s, CH, first=True))
        state = run_first(state)
        for _ in range(max(nsteps_spinup // CH - 1, 0)):
            state = run_chunk(state)
        state = jax.block_until_ready(state)
    print(f"  spinup {nsteps_spinup} steps: {time.time() - t0:.0f}s", flush=True)

    def avg_chunk(carry):
        state, accum = carry

        def body(c, _):
            st, acc = c
            st = model.step(st, first=False)
            acc = jax.tree_util.tree_map(
                lambda a, f: a + f, acc, accum_fields(st))
            return (st, acc), None

        return jax.lax.scan(body, (state, accum), None, length=CH)[0]

    t0 = time.time()
    zero = jax.jit(
        lambda s: jax.tree_util.tree_map(jnp.zeros_like, accum_fields(s))
    )(state)
    chunk = jax.jit(avg_chunk)
    carry = (state, zero)
    nchunks = max(nsteps_avg // CH, 1)
    for _ in range(nchunks):
        carry = chunk(carry)
    state, acc = jax.block_until_ready(carry)
    nsteps_done = nchunks * CH
    print(f"  averaging {nsteps_done} steps: {time.time() - t0:.0f}s", flush=True)
    return state, jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float64) / nsteps_done, acc
    )


# ---------------------------------------------------------------------------
# Criterion bounds registry — the SINGLE source of truth for every gate bound.
#
# Round-4 verdict: the committed artifact mixed entries judged under
# superseded bounds with entries judged under current ones, invisibly. Every
# bound now lives HERE; bcheck() looks its bounds up by criterion name, each
# artifact record is stamped with bounds_version() (a hash of this registry),
# and tests/test_gate_merge.py::test_artifact_bounds_match_code asserts the
# committed CLIMATE_GATE.json agrees with the code — so a future bounds
# change visibly invalidates stale entries instead of silently coexisting.
#
# [lo, hi] with None for an open side. Compound criteria (checked via
# check(), not bcheck()) store their named sub-thresholds as dicts so the
# version hash still covers them.
BOUNDS = {
    # Held & Suarez 1994 (BAMS)
    "hs_jet_strength": [25.0, 40.0],          # NH jet max, m/s (~30)
    "hs_jet_latitude": [35.0, 55.0],          # deg (40-50)
    "hs_jet_height": [None, 0.45],            # sigma of jet max (~0.25)
    "hs_tropical_easterlies": [None, 5.0],    # upper tropical u, m/s
    "hs_surface_westerlies": [0.0, None],     # midlat sfc u, m/s
    "hs_trade_easterlies": [None, 0.0],       # tropical sfc u, m/s
    "hs_tropopause_temp": [180.0, 215.0],     # tropical T min, K (~200)
    "hs_meridional_contrast": [15.0, 70.0],   # sfc eq-pole dT, K (delh=60)
    # Frierson et al. 2006 (JAS) grey aquaplanet
    "fr_tropical_tsurf": [285.0, 310.0],      # K (~295-305)
    "fr_pole_tsurf": [25.0, None],            # tropics-minus-pole t_surf, K
    "fr_humidity_max_tropics": [None, 15.0],  # |lat| of sfc q max, deg
    "fr_humidity_magnitude": [0.008, 0.03],   # sfc q max, kg/kg (~15-20 g/kg)
    "fr_jet": {"strength": [20.0, 45.0], "latitude": [25.0, 55.0]},
    "fr_surface_winds": {"midlat_u": [0.0, None], "tropical_u": [None, 0.0]},
    # Schneider & Liu 2009 (JAS) giant planet
    "gp_equatorial_superrotation": [10.0, 300.0],   # upper eq u, m/s
    "gp_multiple_jets": [4.0, 1000.0],              # off-eq u sign flips
    "gp_equator_dominates": {"eq_over_max_midlat": [0.5, None]},
    "gp_hemispheric_symmetry": [0.2, 1.0],          # NH/SH jet correlation
    # Jucker & Gerber 2017 (J. Climate) MiMA
    "mima_coldpoint_temp": [180.0, 210.0],          # K (fig. 2: ~190-205)
    "mima_coldpoint_pressure": [50.0, 160.0],       # hPa (obs ~100)
    "mima_stratospheric_inversion": [2.0, 120.0],   # K above cold point
    "mima_jet_strength": [20.0, 50.0],              # m/s
    "mima_jet_latitude": [25.0, 55.0],              # deg
    "mima_tropical_tsurf": [285.0, 310.0],          # K
    "mima_humidity": [8.0, 30.0],                   # sfc q max, g/kg
    # Realistic continents (reference test case; continentality signatures)
    "realistic_land_seasonal_amplitude": [6.0, 80.0],    # K
    "realistic_continentality_ratio": [1.4, 50.0],       # land/ocean amp
    "realistic_winter_jet_stronger": [1.02, 10.0],       # winter/summer jet
    "realistic_tsurf_range_winter": [260.0, 310.0],      # K
    "realistic_tsurf_range_summer": [260.0, 310.0],      # K
    "realistic_olr": [200.0, 290.0],                     # W/m2 (obs ~240)
}


def bounds_version():
    """Short content hash of BOUNDS: stamped into every criterion record so
    an artifact entry generated under superseded bounds is detectable."""
    import hashlib
    return hashlib.sha256(
        json.dumps(BOUNDS, sort_keys=True).encode()).hexdigest()[:12]


def check(name, cond, detail, results, value=None, bounds=None):
    """Record one criterion. value/bounds make the artifact auditable:
    every entry carries the measured number and the literature bound."""
    status = "PASS" if cond else "FAIL"
    print(f"[{status}] {name}: {detail}")
    rec = {"pass": bool(cond), "detail": detail,
           "bounds_version": bounds_version()}
    if value is not None:
        rec["value"] = float(value)
    if bounds is None:
        # compound criteria: record the registry's sub-threshold dict
        bounds = BOUNDS.get(name)
    if bounds is not None:
        rec["bounds"] = list(bounds) if not isinstance(bounds, dict) \
            else bounds
    results[name] = rec
    return cond


def bcheck(name, value, detail, results):
    """Bounded criterion: BOUNDS[name][0] <= value <= BOUNDS[name][1]
    (None = open side). Bounds come from the registry ONLY."""
    lo, hi = BOUNDS[name]
    cond = (lo is None or value >= lo) and (hi is None or value <= hi)
    return check(name, cond, detail, results, value=value, bounds=(lo, hi))


def gate_held_suarez(days, results, resolution="T85", precision="highest"):
    from isca_tpu.dycore.primitive import PrimitiveConfig
    from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel

    core = PrimitiveConfig(resolution=resolution, num_levels=25, dt=600.0,
                           transform_precision=precision,
                           dtype=jnp.float32)
    model = HeldSuarezModel(HeldSuarezConfig(core=core))
    state = model.initial_state()
    spd = int(86400 / core.dt)
    spin = (days // 3) * spd
    avg = (days - days // 3) * spd

    def fields(st):
        return {"u": st.ug.curr.mean(axis=-1), "t": st.tg.curr.mean(axis=-1)}

    t0 = time.time()
    state, zm = zonal_time_mean(model, state, spin, avg, fields)
    wall = time.time() - t0
    print(f"Held-Suarez {resolution}L25: {days} days in {wall:.0f}s "
          f"({days * 86400 / wall:,.0f} model-days/day)")

    lats = np.rad2deg(np.asarray(model.core.T.lats))
    # sigma from even levels
    L = zm["u"].shape[0]
    sigma = (np.arange(L) + 0.5) / L

    u, T = zm["u"], zm["t"]
    # jet: max of zonal wind in each hemisphere
    nh = lats > 0
    kjet, jjet = np.unravel_index(np.argmax(u[:, nh]), u[:, nh].shape)
    ujet = u[:, nh].max()
    latjet = lats[nh][jjet]
    sigjet = sigma[kjet]
    bcheck("hs_jet_strength", float(ujet),
           f"NH jet {ujet:.1f} m/s (HS94 ~30)", results)
    bcheck("hs_jet_latitude", float(latjet),
           f"at {latjet:.1f} deg (HS94 40-50)", results)
    bcheck("hs_jet_height", float(sigjet),
           f"at sigma={sigjet:.2f} (HS94 ~0.25)", results)

    # tropical upper-level easterlies
    trop = np.abs(lats) < 10
    utrop_top = u[sigma < 0.3][:, trop].mean()
    bcheck("hs_tropical_easterlies", float(utrop_top),
           f"tropical u(sigma<0.3) mean {utrop_top:.1f} m/s (weak/easterly)",
           results)

    # surface westerlies in midlatitudes, easterlies in tropics (trade winds)
    usfc = u[-1]
    mid = (np.abs(lats) > 35) & (np.abs(lats) < 60)
    bcheck("hs_surface_westerlies", float(usfc[mid].mean()),
           f"midlat sfc u {usfc[mid].mean():.1f} m/s (>0)", results)
    bcheck("hs_trade_easterlies", float(usfc[trop].mean()),
           f"tropical sfc u {usfc[trop].mean():.1f} m/s (<0)", results)

    # temperature: tropopause ~ 200K minimum, no superrotation artifacts
    tmin = T[:, trop].min()
    bcheck("hs_tropopause_temp", float(tmin),
           f"tropical T min {tmin:.0f} K (HS94 ~200)", results)
    # equator-pole surface temperature contrast roughly delh-driven
    dT = T[-1][trop].mean() - T[-1][np.abs(lats) > 75].mean()
    bcheck("hs_meridional_contrast", float(dT),
           f"sfc equator-pole dT {dT:.0f} K (forced by delh=60)", results)


def gate_frierson(days, results, precision="highest"):
    import dataclasses

    from isca_tpu.models.moist import GreyMoistModel, frierson_test_case_config

    cfg = frierson_test_case_config()
    if precision != cfg.core.transform_precision:
        # PRECISION_GATE: climate-validate transform_precision="high" on a
        # MOIST config before any doc claims it beyond Held-Suarez
        # (VERDICT r3 weak #6)
        cfg = dataclasses.replace(cfg, core=dataclasses.replace(
            cfg.core, transform_precision=precision))
    model = GreyMoistModel(cfg)
    state = model.initial_state()
    spd = int(86400 / model.core.config.dt)
    spin = (days // 2) * spd
    avg = (days - days // 2) * spd

    def fields(st):
        d = {"u": st.dyn.ug.curr.mean(axis=-1),
             "ts": st.t_surf.mean(axis=-1),
             "q": st.dyn.tracers["sphum"].curr.mean(axis=-1)}
        return d

    t0 = time.time()
    state, zm = zonal_time_mean(model, state, spin, avg, fields)
    wall = time.time() - t0
    print(f"Frierson T42L25: {days} days in {wall:.0f}s "
          f"({days * 86400 / wall:,.0f} model-days/day)")

    lats = np.rad2deg(np.asarray(model.core.T.lats))
    u, ts, q = zm["u"], zm["ts"], zm["q"]
    L = u.shape[0]
    sigma = (np.arange(L) + 0.5) / L
    trop = np.abs(lats) < 10

    # warm moist tropics
    bcheck("fr_tropical_tsurf", float(ts[trop].mean()),
           f"tropical t_surf {ts[trop].mean():.1f} K (Frierson ~295-305)",
           results)
    # tropics-minus-pole surface contrast (registry: >= 25 K)
    contrast = float(ts[trop].mean() - ts[np.abs(lats) > 70].mean())
    bcheck("fr_pole_tsurf", contrast,
           f"polar t_surf {ts[np.abs(lats) > 70].mean():.1f} K "
           f"(tropics-pole contrast {contrast:.0f} K)", results)
    # boundary-layer specific humidity maximum at the equator
    qsfc = q[-1]
    qmaxlat = lats[np.argmax(qsfc)]
    bcheck("fr_humidity_max_tropics", float(abs(qmaxlat)),
           f"sfc q max at {qmaxlat:.0f} deg ({qsfc.max() * 1e3:.1f} g/kg)",
           results)
    bcheck("fr_humidity_magnitude", float(qsfc.max()),
           f"sfc q max {qsfc.max() * 1e3:.1f} g/kg (Frierson ~15-20)", results)
    # subtropical/midlatitude jet (compound: thresholds from BOUNDS["fr_jet"])
    nh = lats > 0
    kjet, jjet = np.unravel_index(np.argmax(u[:, nh]), u[:, nh].shape)
    fj = BOUNDS["fr_jet"]
    check("fr_jet", fj["strength"][0] <= u[:, nh].max() <= fj["strength"][1]
          and fj["latitude"][0] <= lats[nh][jjet] <= fj["latitude"][1],
          f"NH jet {u[:, nh].max():.1f} m/s at {lats[nh][jjet]:.0f} deg, "
          f"sigma={sigma[kjet]:.2f}", results)
    # surface wind pattern (compound: BOUNDS["fr_surface_winds"])
    usfc = u[-1]
    mid = (np.abs(lats) > 35) & (np.abs(lats) < 60)
    fw = BOUNDS["fr_surface_winds"]
    check("fr_surface_winds",
          usfc[mid].mean() > fw["midlat_u"][0]
          and usfc[trop].mean() < fw["tropical_u"][1],
          f"sfc u: midlat {usfc[mid].mean():.1f}, tropics "
          f"{usfc[trop].mean():.1f} m/s", results)


def gate_mima(days, results, resolution=None, cache=None, deadline=None):
    """MiMA-style seasonal RRTM aquaplanet (Jucker & Gerber 2017, J. Climate).

    Built from the reference MiMA namelist (exp/namelists/mima.nml) with the
    reference's actual ozone_1990 climatology when available.

    ROUND-3 STATE: three real defects were found and fixed on this config —
    unguarded radiation inputs (q<0 NaN'd the correlated-k interpolation),
    a synthetic-LW stratopause with no CO2 cooling-to-space (linear runaway
    through the 370 K clamp), and a missing 8-12um window (OLR ceiling at
    high humidity). With all three fixed the model integrates stably. The
    reference's prescribe_initial_dist STARTS the tropics at ~317 K
    (tconst + delta_T*(1/3 - sin^2 lat), mixed_layer.F90), which a 100 m
    slab relaxes at only ~0.015 K/day — so the slab is cold-started at the
    Jucker-Gerber annual-mean structure below and the gate runs a
    multi-hundred-day spin+average on the chip. Annual-mean criteria: a
    real stratosphere (cold-point tropopause near 100 hPa with temperature
    increasing above it — the structure RRTM+ozone exists to produce),
    subtropical jets, warm moist tropics.

    MEASURED (360-day chip run, 2026-08-21, synthetic-LW v3): 6/7 criteria
    passed — but the cold point froze at 156 K (vs 180-210 K) at 35 hPa.
    ROUND 4: single-column term isolation (tools/calibrate_lw.py) traced the
    failure to the v3 tables' stratospheric N2 continuum (-1.23 K/day of
    spurious emission at 30-100 hPa) and a missing O3 9.6um window heater;
    the v4 tables are calibrated against JG17/observed targets (RCE cold
    point 195 K at 106 hPa, stratopause 256 K). The gate bounds below are
    correspondingly TIGHTENED to literature magnitudes: cold-point pressure
    50-160 hPa (was 30-200, which let a 35 hPa cold point pass), inversion
    upper bound 120 K (was 200).
    """
    from tools.from_namelist import model_from_namelist, parse_namelist

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "..", "exp", "namelists", "mima.nml")) as fh:
        nml = parse_namelist(fh.read())
    overrides = {"resolution": resolution} if resolution else {}
    model = model_from_namelist(nml, dtype=jnp.float32, **overrides)

    # the reference's own ozone input file, if the reference tree is present
    o3_path = "/root/reference/input/rrtm_input_files/ozone_1990.nc"
    if os.path.exists(o3_path):
        from isca_tpu.utils.time_interp import load_pressure_climatology
        lats = np.rad2deg(np.asarray(model.core.T.lats))
        lons = np.rad2deg(np.asarray(model.core.T.lons))
        model.physics.o3_series = load_pressure_climatology(
            o3_path, "ozone_1990", lats, lons)
        print("  ozone: reference ozone_1990.nc climatology")
    else:
        print("  ozone: constant fallback (reference input file not found)")

    state = model.initial_state()
    # Cold-start acceleration (fresh starts only — a chained run resumes its
    # own trajectory). The reference IC (prescribe_initial_dist,
    # mixed_layer.F90) puts the tropical slab at ~317 K; with a 100 m slab
    # (4.2e8 J/K/m^2) the residual TOA imbalance relaxes it at only
    # ~0.015 K/day, so reaching equilibrium from that IC is an O(1000)-day
    # run (the round-2 240-day artifact was visibly under-spun: tropics
    # 315.5 K). Start the slab at the observed Jucker-Gerber annual-mean
    # structure instead (tropics ~300 K, poles ~255 K). Slab statistics only
    # become genuine equilibrium properties once the CHAINED total crosses
    # the slab relaxation scale; until then the artifact flags
    # mima_tropical_tsurf as IC-dominated (see below).
    import dataclasses as _dc
    lat1d = jnp.asarray(model.core.T.lats)          # radians, (nlat,)
    ts0 = 300.0 - 45.0 * jnp.sin(lat1d)[:, None] ** 2
    state = _dc.replace(state, t_surf=jnp.broadcast_to(
        ts0, model.core.T.grid_shape).astype(state.t_surf.dtype))
    dt = model.core.config.dt
    spd = int(86400 / dt)
    spin = (days // 2) * spd
    avg = (days - days // 2) * spd

    # LW k-table provenance goes into the cache fingerprint: resuming a
    # trajectory integrated under different radiation tables would splice
    # incompatible climates.
    import isca_tpu
    _kg = np.load(os.path.join(os.path.dirname(isca_tpu.__file__),
                               "data", "rrtmg_lw_kg.npz"))
    if int(np.asarray(_kg.get("synthetic", 0))) == 1:
        lw_tag = f"synthetic_v{int(np.asarray(_kg.get('synthetic_version', 3)))}"
    else:
        lw_tag = "aer"
    fingerprint = {"config": "mima",
                   "resolution": str(model.core.config.resolution),
                   "num_levels": int(model.core.config.num_levels),
                   "dt": float(dt), "lw_tables": lw_tag}

    # approximate annual-mean pressure ladder for level selection
    ph = np.asarray(model.core.pk) + np.asarray(model.core.bk) * 1.0e5
    p_full = 0.5 * (ph[:-1] + ph[1:])

    def fields(st):
        return {"u": st.dyn.ug.curr.mean(axis=-1),
                "t": st.dyn.tg.curr.mean(axis=-1),
                "ts": st.t_surf.mean(axis=-1),
                "q": st.dyn.tracers["sphum"].curr.mean(axis=-1)}

    t0 = time.time()
    state, zm, total_steps = _chained_spin_and_average(
        model, state, fields, spin, avg, cache=cache,
        fingerprint=fingerprint, deadline=deadline)
    total_days = total_steps / spd
    wall = time.time() - t0
    print(f"MiMA {model.core.config.resolution}L"
          f"{model.core.config.num_levels}: {total_days:.0f} total days "
          f"(target {days}) in {wall:.0f}s this session")

    lats = np.rad2deg(np.asarray(model.core.T.lats))
    u, T, ts, q = zm["u"], zm["t"], zm["ts"], zm["q"]
    trop = np.abs(lats) < 15

    # cold-point tropopause in the tropics (Jucker-Gerber fig. 2: ~190-205 K
    # near 100 hPa)
    Ttrop = T[:, trop].mean(axis=1)
    kcp = int(np.argmin(Ttrop))
    bcheck("mima_coldpoint_temp", float(Ttrop[kcp]),
           f"tropical cold point {Ttrop[kcp]:.0f} K at {p_full[kcp]/100:.0f} hPa",
           results)
    bcheck("mima_coldpoint_pressure", float(p_full[kcp] / 100.0),
           f"cold point at {p_full[kcp]/100:.0f} hPa (obs ~100)", results)
    # stratosphere: temperature increases above the cold point (ozone
    # heating); JG17's observed inversion is ~60-70 K to the stratopause
    strat_warming = float(T[: max(kcp, 1), trop].mean(axis=1).max() - Ttrop[kcp])
    bcheck("mima_stratospheric_inversion", strat_warming,
           f"T rises {strat_warming:.0f} K above cold point", results)
    # subtropical jet
    nh = lats > 0
    kjet, jjet = np.unravel_index(np.argmax(u[:, nh]), u[:, nh].shape)
    bcheck("mima_jet_strength", float(u[:, nh].max()),
           f"NH jet {u[:, nh].max():.1f} m/s at {lats[nh][jjet]:.0f} deg",
           results)
    bcheck("mima_jet_latitude", float(lats[nh][jjet]),
           f"jet latitude {lats[nh][jjet]:.0f} deg", results)
    # warm moist tropics (100 m slab + RRTM: ~295-305 K). The 100 m slab
    # relaxes at ~0.015 K/day per W/m2 of TOA imbalance, so t_surf only
    # becomes a model equilibrium property (rather than an echo of the
    # cold-start IC) once the accumulated integration crosses ~700 days —
    # shorter runs are flagged IC-dominated in the artifact so the PASS is
    # not read as model validation (advisor finding, round 3).
    ic_dominated = total_days < 700
    bcheck("mima_tropical_tsurf", float(ts[trop].mean()),
           f"tropical t_surf {ts[trop].mean():.1f} K after "
           f"{total_days:.0f} accumulated days"
           + (" [IC-dominated: run too short for slab equilibrium]"
              if ic_dominated else ""), results)
    results["mima_tropical_tsurf"]["ic_dominated"] = bool(ic_dominated)
    results["mima_tropical_tsurf"]["accumulated_days"] = round(total_days, 1)
    bcheck("mima_humidity", float(q[-1].max() * 1e3),
           f"sfc q max {q[-1].max()*1e3:.1f} g/kg", results)


class WallBudget(Exception):
    """Raised when --max-wall-seconds is reached. The spinup/averaging state
    has already been checkpointed; the caller exits 0 so chained sessions end
    cleanly (mirrors the reference's segmented exp.run(i) restart discipline,
    extra/python/isca/experiment.py)."""


def _save_state_cache(path, state, steps, fingerprint, avg_steps=0,
                      accum=None):
    """Checkpoint a model-state pytree + RAW step counters to an npz.

    `steps` is the total number of model steps integrated into `state`
    (spinup AND averaging — every step the state actually took), never a
    floor-divided day count: a resumed chain is therefore step-for-step
    identical to an uninterrupted run, counters included. `avg_steps` is how
    many of those steps have been accumulated into the float64 time-mean
    accumulators `accum` (dict name -> np.float64 array, or None before
    averaging starts). `fingerprint` (config dict) is stored and verified on
    load so a cache cannot be resumed with a different resolution/levels/dt.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves = jax.tree_util.tree_leaves(state)
    # The axon TPU backend cannot device->host copy complex arrays
    # (UNIMPLEMENTED — measured on-chip, round 4): split complex leaves to a
    # stacked (2, ...) real/imag float array INSIDE jit, copy floats out.
    split = jax.jit(lambda ls: [
        jnp.stack([jnp.real(l), jnp.imag(l)]) if jnp.iscomplexobj(l) else l
        for l in ls])
    payload = {f"leaf{i}": np.asarray(l) for i, l in enumerate(split(leaves))}
    payload["steps"] = np.int64(steps)
    payload["avg_steps"] = np.int64(avg_steps)
    payload["nleaves"] = np.int64(len(leaves))
    payload["fingerprint"] = np.frombuffer(
        json.dumps(fingerprint, sort_keys=True).encode(), dtype=np.uint8)
    if accum is not None:
        for k, v in accum.items():
            payload[f"acc_{k}"] = np.asarray(v, np.float64)
    tmp = path + ".tmp.npz"
    # uncompressed: a T213L30 state is ~0.4 GB and zlib costs ~20-40 s per
    # save — measured ~8% of chip wall clock at the 5-minute cadence
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def _load_state_cache(path, template, fingerprint):
    """Restore a checkpoint written by _save_state_cache.

    Returns (state, steps, avg_steps, accum-or-None). Raises ValueError with
    a clear message on a fingerprint or leaf-count mismatch instead of
    failing deep inside jit with an opaque shape error."""
    data = np.load(path, allow_pickle=False)
    if "steps" not in data.files:
        raise ValueError(
            f"{path}: legacy cache without raw step counters; delete it and "
            "re-seed (the round-3 format floor-divided days and cannot be "
            "resumed step-exactly)")
    saved_fp = json.loads(bytes(data["fingerprint"]).decode())
    want_fp = json.loads(json.dumps(fingerprint, sort_keys=True))
    if saved_fp != want_fp:
        raise ValueError(
            f"{path}: config fingerprint mismatch — cache was written with "
            f"{saved_fp}, this run is {want_fp}; refusing to splice "
            "incompatible trajectories")
    leaves, treedef = jax.tree_util.tree_flatten(template)
    if int(data["nleaves"]) != len(leaves):
        raise ValueError(
            f"{path}: cache has {int(data['nleaves'])} state leaves, model "
            f"expects {len(leaves)}")
    # Complex leaves were saved as stacked (2, ...) real/imag floats (axon
    # cannot transfer complex either way); rebuild them on device inside jit.
    raw = [np.asarray(data[f"leaf{i}"]) for i in range(len(leaves))]

    def rebuild(flats):
        out = []
        for f, l in zip(flats, leaves):
            if jnp.iscomplexobj(l):
                out.append(jax.lax.complex(f[0], f[1]).astype(l.dtype))
            else:
                out.append(f.astype(l.dtype))
        return jax.tree_util.tree_unflatten(treedef, out)

    state = jax.jit(rebuild)(raw)
    accum = {k[4:]: np.asarray(data[k], np.float64)
             for k in data.files if k.startswith("acc_")}
    return state, int(data["steps"]), int(data["avg_steps"]), (accum or None)


def _chained_spin_and_average(model, state, accum_fields, spin_steps,
                              avg_steps_target, cache=None, fingerprint=None,
                              deadline=None, progress=None):
    """Spinup + time-averaging with kill-safe cross-session chaining.

    Integrates `spin_steps` of spinup then `avg_steps_target` of averaging in
    CH-step jit chunks. If `cache` is given, the state AND the float64
    averaging accumulators checkpoint atomically every ~5 minutes and at
    every phase boundary, so a killed session loses at most that much and a
    resumed chain reproduces an uninterrupted run step-for-step (counters are
    raw steps, never floor-divided days). If `deadline` (epoch seconds)
    passes, checkpoints and raises WallBudget for a clean exit.

    Accumulators live on the host in float64 between chunks (on-device f32
    within a chunk), so a multi-thousand-day mean does not lose precision to
    f32 accumulation. Returns (state, time-mean dict, total_steps).
    """
    CH = 256
    run_chunk = jax.jit(lambda s: model.run(s, CH, first=False))
    steps, avg_done, accum = 0, 0, None
    if cache and os.path.exists(cache):
        state, steps, avg_done, accum = _load_state_cache(
            cache, state, fingerprint)
        print(f"  resumed from {cache}: {steps} steps integrated "
              f"({avg_done} averaged)", flush=True)
    t0 = time.time()
    last_save = [t0]

    def save_cache():
        nonlocal state
        state = jax.block_until_ready(state)
        _save_state_cache(cache, state, steps, fingerprint, avg_done, accum)
        last_save[0] = time.time()

    def checkpoint_maybe(phase):
        if cache and time.time() - last_save[0] > 600:
            save_cache()
            print(f"  checkpoint [{phase}] step {steps} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            if progress:
                progress(state, steps, phase)
        if deadline and time.time() > deadline:
            if cache:
                save_cache()
            raise WallBudget(
                f"wall budget reached at step {steps} ({phase}); "
                + (f"state checkpointed to {cache}" if cache
                   else "no cache configured — progress lost"))

    last_rate = [time.time(), steps]

    def log_rate(phase):
        now = time.time()
        dsteps = steps - last_rate[1]
        if dsteps > 0 and now > last_rate[0]:
            print(f"  [{phase}] step {steps}: "
                  f"{dsteps / (now - last_rate[0]):.1f} steps/s "
                  f"({now - t0:.0f}s)", flush=True)
        last_rate[0], last_rate[1] = now, steps

    if steps == 0 and spin_steps > 0:
        run_first = jax.jit(lambda s: model.run(s, CH, first=True))
        state = run_first(state)
        steps = CH
        state = jax.block_until_ready(state)
        print(f"  first chunk (incl. compile): {time.time() - t0:.0f}s",
              flush=True)
        last_rate = [time.time(), steps]
        checkpoint_maybe("spinup")
    logged_run_variant_compile = False
    while steps < spin_steps:
        chunk_t0 = time.time()
        state = run_chunk(state)
        steps += CH
        # sync each chunk: JAX dispatch is asynchronous, and without this
        # the Python loop races arbitrarily far ahead of the device — the
        # steps counter, the 5-minute checkpoint clock, and the wall-budget
        # deadline all become meaningless, and the "periodic" save blocks
        # on the ENTIRE dispatched queue (measured on the first T213 chip
        # run: 22 min of silence, nothing banked). One tunnel round-trip
        # per 256-step chunk is noise next to the chunk's compute.
        state = jax.block_until_ready(state)
        if not logged_run_variant_compile:
            # the run-variant (first=False) jit compiles inside the FIRST
            # while-iteration, so the first steps/s print can understate the
            # steady rate by >10x — log the compile-bearing chunk explicitly
            # (a healthy MiMA run was once killed for "1.2 steps/s" that was
            # actually this compile window)
            print(f"  run-variant chunk (incl. compile on a fresh process): "
                  f"{time.time() - chunk_t0:.0f}s", flush=True)
            last_rate = [time.time(), steps]
            logged_run_variant_compile = True
        if time.time() - last_rate[0] > 120:
            log_rate("spinup")
        checkpoint_maybe("spinup")
    if avg_done == 0:
        state = jax.block_until_ready(state)
        print(f"  spinup complete at step {steps} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if cache:
            save_cache()

    def avg_chunk(st):
        zero = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, x.dtype), accum_fields(st))

        def body(c, _):
            s2, acc = c
            s2 = model.step(s2, first=False)
            acc = jax.tree_util.tree_map(
                lambda a, f: a + f, acc, accum_fields(s2))
            return (s2, acc), None

        return jax.lax.scan(body, (st, zero), None, length=CH)[0]

    cj = jax.jit(avg_chunk)
    if accum is None:
        shapes = jax.eval_shape(accum_fields, state)
        accum = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, np.float64), shapes)
    while avg_done < avg_steps_target:
        state, cacc = jax.block_until_ready(cj(state))
        accum = jax.tree_util.tree_map(
            lambda h, d: h + np.asarray(d, np.float64), accum, cacc)
        steps += CH
        avg_done += CH
        if time.time() - last_rate[0] > 120:
            log_rate("averaging")
        checkpoint_maybe("averaging")
    if cache:
        save_cache()
    print(f"  averaged {avg_done} steps ({time.time() - t0:.0f}s)",
          flush=True)
    zm = jax.tree_util.tree_map(lambda a: a / max(avg_done, 1), accum)
    return state, zm, steps


def gate_giant(days, results, resolution="T42", cache=None, deadline=None,
               avg_days=None, precision="highest"):
    """Giant planet (Schneider & Liu 2009, JAS): equatorial superrotation and
    multiple alternating off-equator jets.

    RESOLUTION CAVEAT (measured, round 3): the SL09 criteria are NOT
    attainable at T42 — with Jupiter's radius the Rhines jet scale
    (~2000-6000 km) sits at/below the T42 grid spacing (~3400 km), and the
    convectively generated equatorial eddies that drive superrotation are
    unresolved. Two full 30,000-day T42L30 integrations on the chip (one
    with the trip-test cutoff_wn=15, one with the climate-scaled cutoff=20)
    both equilibrate to weak midlatitude jets (|u|max ~ 17-20 m/s), NO
    alternating pattern, and a near-zero time-mean equatorial wind — stably,
    at 1.44M model-days/day. A T85L30 run reached 9,400 spinup days with the
    same pre-superrotation state before the session budget cut it off. The
    reference's own test case integrates 3,600 days at T213L30 — the
    resolution at which the mechanism actually operates. MEASURED round 4
    (PROFILE.json giant_t213): 30.4k model-days/day sustained on the chip
    (step 59.2 ms), so the 3,600-day spinup + averaging is ~4 h of chip,
    chained across sessions through the state cache. The criteria below are intentionally kept at
    SL09 magnitudes; the committed artifact records the honest FAILs at
    reduced resolution rather than bounds tuned to pass a state that does
    not superrotate.

    ROUND-5 MEASURED (the full reference-length chain: T213L30 to 3,605
    days at diabatic_acce=1.0, 900-day averaging window; trajectory
    committed as CLIMATE_GATE.json["gp_spinup_trajectory"]): resolution was
    necessary but 3,600 days is not sufficient. The circulation stays an
    order of magnitude below SL09 amplitudes — 16 weak alternating jets
    (max zonal-mean |u| ~14 m/s, pattern correlation 0.84 across
    hemispheres: both PASS) with the upper-equatorial wind OSCILLATING in
    [-5, +1] m/s, QBO-like, no superrotating trend. This is thermal
    inertia, not dynamics: at p_s = 3 bar, C = cp*p_s/g ~ 1.5e8 J/K/m^2
    against dF/dT = 4*sigma*T^3 ~ 0.4 W/m^2/K at 120 K gives tau_rad ~
    4,000+ days, so the case's own 3,600-day length is ~1 radiative
    e-fold — the SL09 equilibrium cannot be reached at acce=1 regardless
    of chip speed. The reference exposes an acceleration knob for exactly
    this (giant_planet_test_case.py:132: diabatic_acce, "artificially
    accelerate the diabatic processes during spinup"), fully plumbed here
    (TwoStreamConfig.diabatic_acce + GiantPlanetConfig.diabatic_acce); a
    staged protocol (acce >> 1 spinup chained to an acce=1 averaging
    chain, two cache fingerprints) is the route to SL09 magnitudes within
    a bounded chip budget.
    """
    from isca_tpu.models.giant import giant_planet_model

    # climate runs keep eddy scales alive: exponential-cutoff wavenumber
    # scaled from the reference's T213 value (cutoff_wn=100 -> 100*T/213),
    # NOT the trip test's cutoff_wn=15 (that reduction is for a 3-day
    # bitwise check; at T42 it would damp most of the jet-forming eddies)
    trunc = int(str(resolution).lstrip("T"))
    cutoff = max(int(round(100 * trunc / 213)), 8)
    # transform_precision: at T213 the step is Legendre-einsum dominated, so
    # the MXU bf16_3x mode ("high", climate-validated 14/14 on HS and
    # Frierson, PRECISION_GATE.json) buys a large fraction more banked
    # spinup days per chip-minute. Recorded in the cache fingerprint —
    # a chain integrates under ONE precision end to end.
    model = giant_planet_model(resolution=resolution, num_levels=30,
                               cutoff_wn=cutoff,
                               transform_precision=precision)
    state = model.initial_state()
    spd = int(86400 / model.core.config.dt)
    spin = (days * 3 // 4) * spd
    # averaging window is overridable: zonal-mean jet statistics of the
    # statistically steady SL09 state converge in a few hundred days (the
    # paper's own figures average ~100-day windows); the default 25% of the
    # run is generous for single-session runs, long for a chained T213 one
    avg = (avg_days if avg_days else days - days * 3 // 4) * spd
    fingerprint = {"config": "giant", "resolution": str(resolution),
                   "num_levels": 30, "cutoff_wn": cutoff,
                   "dt": float(model.core.config.dt)}
    if precision != "highest":
        # only stamped when non-default so pre-existing "highest" caches
        # (written before this field existed) still fingerprint-match
        fingerprint["transform_precision"] = precision

    def fields(st):
        return {"u": st.dyn.ug.curr.mean(axis=-1),
                "t": st.dyn.tg.curr.mean(axis=-1)}

    # progress logging: the artifact's provenance shows the spinup trajectory
    # of the equatorial jet, not just the end state
    lats_ = np.rad2deg(np.asarray(model.core.T.lats))
    eq_ = np.abs(lats_) < 8

    def progress(st, steps, phase):
        u_eq = float(np.asarray(
            st.dyn.ug.curr[:10].mean(axis=-1))[:, eq_].mean())
        print(f"  [{phase}] day {steps / spd:.1f}: upper equatorial u = "
              f"{u_eq:+.1f} m/s", flush=True)

    t0 = time.time()
    state, zm, total_steps = _chained_spin_and_average(
        model, state, fields, spin, avg, cache=cache,
        fingerprint=fingerprint, deadline=deadline, progress=progress)
    wall = time.time() - t0
    this_days = days  # target; total_steps/spd is the chained total
    print(f"Giant planet {resolution}L30: {total_steps / spd:.0f} total days "
          f"(target {this_days}) in {wall:.0f}s this session")

    lats = np.rad2deg(np.asarray(model.core.T.lats))
    u = zm["u"]
    L = u.shape[0]
    utop = u[: L // 3].mean(axis=0)        # upper-troposphere zonal-mean u
    eq = np.abs(lats) < 8

    bcheck("gp_equatorial_superrotation", float(utop[eq].mean()),
           f"equatorial upper u {utop[eq].mean():.0f} m/s (SL09: strong "
           "prograde)", results)
    # off-equator alternating jet pattern: count sign changes poleward of 10deg
    nh_off = utop[(lats > 10) & (lats < 80)]
    sh_off = utop[(lats < -10) & (lats > -80)]
    flips = int(np.sum(np.abs(np.diff(np.sign(nh_off))) > 0)
                + np.sum(np.abs(np.diff(np.sign(sh_off))) > 0))
    bcheck("gp_multiple_jets", float(flips),
           f"{flips} sign changes of off-equator zonal-mean u (alternating "
           "jets)", results)
    # equator dominates: superrotation exceeds the strongest midlat jet
    # (compound threshold from BOUNDS["gp_equator_dominates"])
    eq_ratio_min = BOUNDS["gp_equator_dominates"]["eq_over_max_midlat"][0]
    check("gp_equator_dominates",
          float(utop[eq].mean())
          > eq_ratio_min * float(np.abs(nh_off).max() + 1e-9),
          f"eq {utop[eq].mean():.0f} m/s vs max |midlat| {np.abs(nh_off).max():.0f}",
          results, value=float(utop[eq].mean()))
    # hemispheric symmetry of the jet pattern (statistical, loose)
    corr = float(np.corrcoef(nh_off[: len(sh_off)], sh_off[::-1][: len(nh_off)])[0, 1])
    bcheck("gp_hemispheric_symmetry", corr,
           f"NH/SH jet-pattern correlation {corr:.2f}", results)


def gate_realistic(days, results, resolution="T42", levels=None,
                   orbit_days_override=None, radiation="rrtm",
                   spin_orbits=None):
    """Realistic continents with a seasonal cycle (the reference
    exp/test_cases/realistic_continents capability: continental outlines +
    Sauliere 2012 topography + bucket hydrology + seasonal insolation +
    slab ocean with shallow land). The land surface follows the reference's
    namelist_basefile.nml:55-59: 20 m slab with land_option='input' and
    land_h_capacity_prefactor=0.1 (NOT land_depth, which mixed_layer.F90:554
    ignores under 'input'), land_albedo_prefactor=1.3 on a 0.25 ocean
    albedo. Radiation defaults to RRTM with seasonal insolation and the
    reference's ozone_1990 climatology — the configuration the reference
    case actually runs (namelist_basefile.nml rrtm_radiation_nml) — with
    an OLR criterion gated on top of the continentality ones;
    radiation="grey" keeps the round-3 two-stream variant.

    Criteria target continentality — the robust signature the configuration
    exists to produce. A full orbit is accumulated as four consecutive
    quarter-orbit windows centered on the solstices/equinoxes; NH winter is
    identified empirically as the window with coldest NH midlatitude land
    (robust to slab-ocean phase lag), summer is the window half an orbit
    away. Checks: (a) a seasonal cycle over NH midlatitude land, (b) land
    amplitude well above ocean amplitude at the same latitudes (low land
    heat capacity), (c) a stronger NH jet in the NH-winter window, (d) sane
    surface temperatures throughout.
    """
    import dataclasses

    from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
    from isca_tpu.utils.land_generator import generate_land

    cfg = GreyMoistConfig()
    phys = dataclasses.replace(
        cfg.physics,
        bucket=True,
        radiation=dataclasses.replace(cfg.physics.radiation, do_seasonal=True),
        mixed_layer=dataclasses.replace(
            cfg.physics.mixed_layer,
            depth=20.0, land_option="input",
            land_h_capacity_prefactor=0.1,
            albedo_value=0.25, land_albedo_prefactor=1.3),
    )
    if radiation == "rrtm":
        # the reference case's own radiation settings
        # (realistic_continents/namelist_basefile.nml rrtm_radiation_nml:
        # dt_rad=4320 = 6*dt, solr_cnst=1360)
        from isca_tpu.physics.rrtm_radiation import RRTMConfig
        phys = dataclasses.replace(
            phys, radiation_scheme="rrtm", dt_rad=4320.0,
            rrtm=RRTMConfig(do_seasonal=True, solr_cnst=1360.0))
    if orbit_days_override is not None:  # fast smoke-test orbits
        phys = dataclasses.replace(
            phys, constants=dataclasses.replace(
                phys.constants,
                orbital_period=orbit_days_override * 86400.0))
    core = dataclasses.replace(cfg.core, resolution=resolution,
                               dtype=jnp.float32,
                               **({"num_levels": levels} if levels else {}))
    model = GreyMoistModel(dataclasses.replace(cfg, core=core, physics=phys))
    lats = np.degrees(np.asarray(model.core.T.lats))
    lons = np.degrees(np.asarray(model.core.T.lons))
    if radiation == "rrtm":
        # the reference's own ozone climatology when its tree is present
        # (realistic_continents namelist_basefile.nml rrtm_radiation_nml)
        o3_path = "/root/reference/input/rrtm_input_files/ozone_1990.nc"
        if os.path.exists(o3_path):
            from isca_tpu.utils.time_interp import load_pressure_climatology
            model.physics.o3_series = load_pressure_climatology(
                o3_path, "ozone_1990", lats, lons)
            print("  ozone: reference ozone_1990.nc climatology")
        else:
            print("  ozone: constant fallback (reference input not found)")
    land, topo = generate_land(lats, lons, "continents",
                               topo_mode="sauliere2012")
    # surface HEIGHT in meters (set_land multiplies by grav itself), and
    # band-limit the raw topography through the model truncation — Gibbs
    # ringing from an un-truncated field destabilizes the dycore
    from isca_tpu.utils.topography import band_limit_topography
    topo = band_limit_topography(model.core.T, np.asarray(topo),
                                 n_smooth_passes=2, smooth_fraction=0.02)
    model.set_land(land, surf_geopotential=topo)

    dt = model.core.config.dt
    spd = int(86400 / dt)
    orbit_s = model.config.physics.constants.orbital_period
    orbit_days = orbit_s / 86400.0
    # four windows tile one orbit; window 0 is centered on t = k*orbit,
    # the NH winter solstice (tsae = 0.25 orbit with equinox_day=0.75)
    window = max(int(round(orbit_days / 4.0 * spd)), 2)
    # spinup to k*orbit - window/2, at least ~1.5 orbits for the 20 m slab
    want_spin_days = max(days, int(1.5 * orbit_days))
    k = max(int(round((want_spin_days + orbit_days / 8.0) / orbit_days)), 2)
    if spin_orbits:
        # explicit session-budget override (recorded in the artifact): the
        # dominant criteria are LAND-driven (2 m effective land slab
        # equilibrates in days; the 20 m ocean slab's e-folding is ~240
        # days, so k=1 starts the windows at 1.3 ocean relaxation times —
        # under-equilibrated ocean biases absolute t_surf/OLR, which the
        # generous bounds absorb, not the land/ocean CONTRAST criteria)
        k = max(int(spin_orbits), 1)
    spin = max(int(round(k * orbit_days * spd - window / 2.0)), 2 * spd)

    CH = 240 if window >= 240 else max(window // 2, 1)
    run_first = jax.jit(lambda s: model.run(s, CH, first=True))
    run_chunk = jax.jit(lambda s: model.run(s, CH, first=False))

    def run_n(state, nsteps, first=False):
        t0, last = time.time(), time.time()
        if first:
            state = run_first(state)
            nsteps -= CH
        done = CH if first else 0
        for _ in range(max(nsteps // CH, 0)):
            state = run_chunk(state)
            # sync + heartbeat: keeps host counters honest under async
            # dispatch and feeds the stall watchdog (tools/run_watchdog.py)
            state = jax.block_until_ready(state)
            done += CH
            if time.time() - last > 120:
                print(f"  ... step {done} ({(time.time() - t0):.0f}s)",
                      flush=True)
                last = time.time()
        return jax.block_until_ready(state)

    def accumulate(state, nsteps):
        def chunk(carry):
            st, acc_ts, acc_u, acc_olr = carry

            def body(c2, _):
                s2, a_ts, a_u, a_olr = c2
                s2 = model.step(s2, first=False)
                return (s2, a_ts + s2.t_surf,
                        a_u + s2.dyn.ug.curr.mean(axis=-1),
                        a_olr + s2.rad_cache.olr), None

            return jax.lax.scan(body, carry, None, length=CH)[0]

        cj = jax.jit(chunk)
        acc_ts = jnp.zeros_like(state.t_surf)
        acc_u = jnp.zeros(state.dyn.ug.curr.shape[:-1], state.dyn.ug.curr.dtype)
        acc_olr = jnp.zeros_like(state.rad_cache.olr)
        carry = (state, acc_ts, acc_u, acc_olr)
        n = max(nsteps // CH, 1)
        for _ in range(n):
            carry = cj(carry)
        state, acc_ts, acc_u, acc_olr = jax.block_until_ready(carry)
        return state, (np.asarray(acc_ts, np.float64) / (n * CH),
                       np.asarray(acc_u, np.float64) / (n * CH),
                       np.asarray(acc_olr, np.float64) / (n * CH))

    t0 = time.time()
    state = model.initial_state()
    state = run_n(state, spin, first=True)
    print(f"  spinup {spin // spd} days: {time.time() - t0:.0f}s", flush=True)
    windows = []
    for w in range(4):
        state, acc = accumulate(state, window)
        windows.append(acc)
        print(f"  window {w} done ({time.time() - t0:.0f}s)", flush=True)
    total_days = (spin + 4 * window) // spd
    wall = time.time() - t0
    print(f"realistic continents {resolution}: {total_days} days in "
          f"{wall:.0f}s ({total_days * 86400 / wall:,.0f} model-days/day)")

    landm = np.asarray(land) > 0.5
    mid_nh = (lats >= 40) & (lats <= 65)
    band = np.zeros_like(landm)
    band[mid_nh, :] = True
    land_pts = landm & band
    ocean_pts = (~landm) & band

    # NH winter = window with coldest NH midlatitude land; summer = +half orbit
    land_means = [float(ts[land_pts].mean()) for ts, _, _ in windows]
    iw = int(np.argmin(land_means))
    isummer = (iw + 2) % 4
    ts_w, u_w, olr_w = windows[iw]
    ts_s, u_s, olr_s = windows[isummer]
    print(f"  window NH-land means {['%.1f' % m for m in land_means]} K "
          f"-> winter=window {iw}", flush=True)

    amp_land = float(np.abs(ts_w - ts_s)[land_pts].mean())
    amp_ocean = float(np.abs(ts_w - ts_s)[ocean_pts].mean())
    bcheck("realistic_land_seasonal_amplitude", amp_land,
           f"NH midlat land |winter-summer| t_surf {amp_land:.1f} K", results)
    bcheck("realistic_continentality_ratio",
           amp_land / max(amp_ocean, 1e-6),
           f"land/ocean seasonal amplitude ratio "
           f"{amp_land / max(amp_ocean, 1e-6):.2f} "
           f"(land {amp_land:.1f} K vs ocean {amp_ocean:.1f} K)", results)

    nh = lats > 20
    jet_w = float(u_w[:, nh].max())
    jet_s = float(u_s[:, nh].max())
    bcheck("realistic_winter_jet_stronger", jet_w / max(jet_s, 1e-6),
           f"NH jet winter {jet_w:.1f} vs summer {jet_s:.1f} m/s", results)
    for nm, (ts, _, _) in (("winter", windows[iw]),
                           ("summer", windows[isummer])):
        bcheck(f"realistic_tsurf_range_{nm}", float(ts.mean()),
               f"global-mean t_surf {nm} window: {ts.mean():.1f} K", results)
    if radiation == "rrtm":
        # RRTM-specific check: annual-mean area-weighted OLR in the
        # observed Earth range (~ERBE/CERES 230-250 W/m2; generous bounds
        # for an idealized continent layout and synthetic-LW tables)
        w = np.cos(np.radians(lats))[:, None]
        olr_ann = 0.5 * (olr_w + olr_s)
        olr_mean = float((olr_ann * w).sum() / (w.sum() * olr_ann.shape[1]))
        bcheck("realistic_olr", olr_mean,
               f"annual-mean OLR {olr_mean:.0f} W/m2 (radiation=rrtm, "
               "obs ~240)", results)


def merge_artifacts(paths, out):
    """Merge per-config gate artifacts (from --only runs) into one file.
    Criteria are unioned (later files win on key collisions), configs_run
    concatenated, wall times summed. Provenance (platform/device/date) is
    taken per-config from each source into a 'runs' list."""
    merged = {"criteria": {}, "configs_run": [], "wall_seconds": 0.0,
              "runs": []}
    for path in paths:
        with open(path) as f:
            art = json.load(f)
        merged["criteria"].update(art.get("criteria", {}))
        merged["configs_run"].extend(
            c for c in art.get("configs_run", [])
            if c not in merged["configs_run"])
        merged.setdefault("transform_precision", {}).update(
            art.get("transform_precision", {}))
        merged["wall_seconds"] += art.get("wall_seconds", 0.0)
        if art.get("runs"):
            # already-merged artifact: carry its per-config provenance through
            merged["runs"].extend(art["runs"])
        else:
            merged["runs"].append({
                "source": os.path.basename(path),
                "configs": art.get("configs_run", []),
                "date": art.get("date"),
                "platform": art.get("platform"),
                "device_kind": art.get("device_kind"),
                "days_arg": art.get("days_arg"),
                "precision": art.get("precision"),
                "transform_precision": art.get("transform_precision"),
                "wall_seconds": art.get("wall_seconds"),
            })
    merged["passed"] = sum(r["pass"] for r in merged["criteria"].values())
    merged["total"] = len(merged["criteria"])
    # bounds provenance: the version every criterion was judged under, plus
    # the code's current one — a mismatch means part of the artifact is stale
    versions = sorted({r.get("bounds_version", "pre-v5")
                       for r in merged["criteria"].values()})
    merged["bounds_version"] = versions[0] if len(versions) == 1 else versions
    merged["bounds_version_code"] = bounds_version()
    merged["date"] = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    merged["platform"] = merged["runs"][0]["platform"] if merged["runs"] else None
    merged["device_kind"] = merged["runs"][0]["device_kind"] if merged["runs"] else None
    merged["wall_seconds"] = round(merged["wall_seconds"], 1)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"merged {len(paths)} artifacts -> {out}: "
          f"{merged['passed']}/{merged['total']} criteria, "
          f"configs {merged['configs_run']}")
    return 0 if merged["passed"] == merged["total"] else 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--days", type=int, default=1200,
                   help="Held-Suarez run length (Frierson/MiMA/giant scale off this)")
    p.add_argument("--json", default="CLIMATE_GATE.json",
                   help="artifact path ('' disables)")
    p.add_argument("--only", default="",
                   help="hs | frierson | mima | giant | realistic")
    p.add_argument("--resolution", default="T85", help="Held-Suarez truncation")
    p.add_argument("--giant-resolution", default="T42",
                   help="giant-planet truncation (T85 approaches the "
                        "SL09 resolutions; T42 cannot resolve the jets)")
    p.add_argument("--giant-cache", default="",
                   help="state-cache npz for chaining the giant-planet "
                        "spinup across sessions (e.g. "
                        "exp/gate_cache/giant_T213.npz — a git-tracked "
                        "path that survives ephemeral build machines); "
                        "resumed if present, "
                        "checkpointed each spinup quarter")
    p.add_argument("--giant-avg-days", type=int, default=0,
                   help="override the giant-planet averaging window "
                        "(days); 0 = default quarter of the run")
    p.add_argument("--giant-precision", default="highest",
                   help="transform_precision for the giant gate (goes into "
                        "the cache fingerprint: one chain = one precision)")
    p.add_argument("--realistic-radiation", default="rrtm",
                   choices=["rrtm", "grey"],
                   help="radiation for the realistic-continents gate (the "
                        "reference case runs RRTM)")
    p.add_argument("--realistic-spin-orbits", type=int, default=0,
                   help="override the realistic gate's spinup length to this "
                        "many orbits before the four averaging windows "
                        "(default 0 = derived from --days, floor 2; 1 is the "
                        "session-budget minimum — see gate_realistic)")
    p.add_argument("--mima-cache", default="",
                   help="state-cache npz for chaining the MiMA spinup across "
                        "sessions (e.g. exp/gate_cache/mima_T42.npz)")
    p.add_argument("--precision", default="highest",
                   help="transform_precision for the hs AND frierson gates "
                        "(gate 'high' before promoting it beyond the bench "
                        "configuration)")
    p.add_argument("--max-wall-seconds", type=float, default=0.0,
                   help="clean-stop budget: chained gates checkpoint and the "
                        "process exits 0 when this much wall clock has "
                        "elapsed (0 = no budget)")
    p.add_argument("--merge", nargs="+", metavar="JSON",
                   help="merge per-config artifacts into --json and exit")
    args = p.parse_args()

    if args.merge:
        return merge_artifacts(args.merge, args.json)

    results = {}
    wanted = args.only.split(",") if args.only else ["hs", "frierson", "mima",
                                                     "giant", "realistic"]
    t0 = time.time()
    deadline = (t0 + args.max_wall_seconds) if args.max_wall_seconds else None
    # mima (the largest RRTMG compile) runs LAST: with incremental artifact
    # writes, a tunnel/compile hang there cannot void the other configs
    gates = [
        ("hs", lambda: gate_held_suarez(args.days, results,
                                        resolution=args.resolution,
                                        precision=args.precision)),
        ("frierson", lambda: gate_frierson(max(args.days // 2, 100), results,
                                           precision=args.precision)),
        ("giant", lambda: gate_giant(max(args.days * 6, 3000), results,
                                     resolution=args.giant_resolution,
                                     cache=args.giant_cache or None,
                                     deadline=deadline,
                                     avg_days=args.giant_avg_days or None,
                                     precision=args.giant_precision)),
        ("realistic", lambda: gate_realistic(
            max(args.days // 2, 300), results,
            radiation=args.realistic_radiation,
            spin_orbits=args.realistic_spin_orbits or None)),
        ("mima", lambda: gate_mima(max(args.days // 2, 100), results,
                                   cache=args.mima_cache or None,
                                   deadline=deadline)),
    ]
    dev = jax.devices()[0]
    done = []

    def write_artifact():
        npass = sum(r["pass"] for r in results.values())
        artifact = {
            "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
            "platform": dev.platform,
            "device_kind": dev.device_kind,
            "days_arg": args.days,
            **({"realistic_spin_orbits": args.realistic_spin_orbits}
               if args.realistic_spin_orbits and "realistic" in done else {}),
            "precision": args.precision,
            # per-config transform_precision provenance: "high" is only
            # climate-validated for configs that appear here (or in
            # PRECISION_GATE.json) with passing criteria — round-4 verdict
            # weak #3 (the giant chain integrates at --giant-precision,
            # which args.precision does not cover)
            "transform_precision": {
                c: (args.giant_precision if c == "giant"
                    else "highest" if c in ("mima", "realistic")
                    else args.precision)
                for c in done},
            "bounds_version": bounds_version(),
            "configs_run": list(done),
            "wall_seconds": round(time.time() - t0, 1),
            "passed": npass,
            "total": len(results),
            "criteria": results,
        }
        with open(args.json, "w") as f:
            json.dump(artifact, f, indent=1)

    wall_stopped = False
    for name, fn in gates:
        if name not in wanted:
            continue
        try:
            fn()
        except WallBudget as e:
            # clean stop: state is checkpointed; no FAIL recorded for an
            # intentionally segmented run, and no further gates started
            print(f"[wall budget] {e}", flush=True)
            wall_stopped = True
            break
        except Exception as e:  # one crashed config must not void the artifact
            import traceback
            traceback.print_exc()
            check(f"{name}_completed", False, f"gate crashed: {e!r}", results)
        done.append(name)
        if args.json:  # incremental: a later hang cannot void earlier configs
            write_artifact()
            print(f"wrote {args.json} ({', '.join(done)})")

    npass = sum(r["pass"] for r in results.values())
    print(f"\n{npass}/{len(results)} criteria passed"
          + (" (wall budget stop — chain incomplete)" if wall_stopped else ""))
    if wall_stopped:
        return 0
    return 0 if npass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
