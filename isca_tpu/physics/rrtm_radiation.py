"""RRTM radiation adapter: RRTMG-SW + RRTMG-LW correlated-k radiation.

Reference: src/atmos_param/rrtm_radiation/rrtm_radiation.F90 (the adapter
that reshapes model fields to RRTMG columns, manages ozone/CO2 inputs, the
radiation timestep and coszen averaging) around the vendored AER RRTMG
(rrtmg_{lw,sw}/gcm_model).

Status of the port:
  - SW: COMPLETE — `physics/rrtmg_sw.py` implements the full 14-band
    112-g-point correlated-k scheme with the reference's own extracted
    k-tables (see tools/extract_rrtmg_sw.py).
  - LW: COMPLETE algorithm — `physics/rrtmg_lw.py` implements the full
    16-band 140-g-point scheme (setcoef/taumol/rtrn/cldprop).  The LW
    k-tables are external data in BOTH frameworks: the reference loads
    `rrtmg_lw.nc` at RUNTIME (rrtmg_lw_read_nc.f90:34; the file is not part
    of the reference repository — AER distributes it separately).  Run
    tools/extract_rrtmg_lw.py with that file to enable RRTMG-LW here; until
    then this adapter pairs RRTMG-SW with the grey two-stream LW
    (Frierson/Byrne/Geen), which is exact parity with what a user of the
    reference can run from a bare checkout.

The adapter exposes the same down()/up() interface as TwoStreamGray so the
moist physics driver can switch schemes by configuration
(idealized_moist_phys.F90:1054-1200 sequencing).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

import isca_tpu.physics.astronomy as astro
from isca_tpu.constants import Constants, EARTH
from isca_tpu.physics.rrtmg_sw import RRTMGSw, RRTMGSwConfig
from isca_tpu.physics.two_stream_gray import (
    RadDownResult,
    RadResult,
    TwoStreamConfig,
    TwoStreamGray,
)


@dataclasses.dataclass(frozen=True)
class RRTMConfig:
    """rrtm_radiation_nml equivalents (rrtm_radiation.F90:150-205)."""
    co2ppmv: float = 300.0
    solr_cnst: float = 1368.22
    do_seasonal: bool = True
    use_time_average_coszen: bool = True
    solday: int = 0
    equinox_day: float = 0.75
    albedo_value: float = 0.25      # used only if driver passes none
    o3_mmr: float = 0.0             # constant ozone mass mixing ratio fallback
    # trace gases for the LW bands (rrtm_radiation.F90 has fixed defaults)
    n2ovmr: float = 3.2e-7
    ch4vmr: float = 1.8e-6
    # radiation-grid cost controls (rrtm_radiation.F90:156-177):
    # input guards before the k-distribution solvers (rrtm_radiation.F90:
    # 147-149): radiation never sees q below h2o_lower_limit or T outside
    # [temp_lower_limit, temp_upper_limit]
    h2o_lower_limit: float = 2.0e-7
    temp_lower_limit: float = 100.0
    temp_upper_limit: float = 370.0
    lonstep: int = 1                # subsample fields along longitude
    do_zm_rad: bool = False         # return only zonal-mean radiation
    do_zm_tracers: bool = False     # feed zonal-mean q to radiation
    # LW scheme selection: "auto" = RRTMG-LW if its k-tables are installed,
    # else grey; "rrtmg" forces RRTMG-LW; "grey" forces the two-stream LW.
    lw_scheme: str = "auto"
    lw_kg_path: str | None = None   # explicit k-table npz (tests)
    # grey-LW companion configuration for the fallback
    lw: TwoStreamConfig = TwoStreamConfig()
    constants: Constants = EARTH


def _lon_expand(a, k, zm=False):
    """Map a lonstep-subsampled (lat, lon/k, ...) field back to the full
    longitude grid: linear interpolation, toroidally closed
    (rrtm_radiation.F90:947-968); with zm, the zonal mean of the subsampled
    columns is broadcast instead (do_zm_rad)."""
    if zm:
        m = jnp.mean(a, axis=1, keepdims=True)
        full = a.shape[:1] + (a.shape[1] * k,) + a.shape[2:]
        return jnp.broadcast_to(m, full)
    if k == 1:
        return a
    a1 = jnp.roll(a, -1, axis=1)
    w = (jnp.arange(k, dtype=a.dtype) / k).reshape(
        (1, 1, k) + (1,) * (a.ndim - 2))
    out = a[:, :, None] * (1.0 - w) + a1[:, :, None] * w
    return out.reshape(a.shape[:1] + (a.shape[1] * k,) + a.shape[2:])


class RRTMRadiation:
    """RRTMG-SW + (RRTMG-LW | grey-LW) radiation, TwoStreamGray interface.

    Supports the reference adapter's radiation-grid cost controls: `lonstep`
    computes radiation every k-th longitude and linearly interpolates the
    heating/fluxes back (k x cheaper); `do_zm_rad` returns the zonal mean;
    `do_zm_tracers` feeds zonally averaged humidity to radiation."""

    def __init__(self, config: RRTMConfig = RRTMConfig()):
        self.config = config
        C = config.constants
        self.sw = RRTMGSw(RRTMGSwConfig(
            scon=config.solr_cnst, co2vmr=config.co2ppmv * 1e-6,
            cp_air=C.cp_air, grav=C.grav))
        # LW scheme selection
        from isca_tpu.physics.rrtmg_lw import (RRTMGLw, RRTMGLwConfig,
                                               kg_available)
        self.lw_rrtmg = None
        use = config.lw_scheme
        if use == "rrtmg" or (use == "auto" and
                              (config.lw_kg_path or kg_available())):
            import logging
            import numpy as _np
            _kg_probe = _np.load(config.lw_kg_path) if config.lw_kg_path \
                else _np.load(str(__import__(
                    "isca_tpu.physics.rrtmg_lw", fromlist=["KG_NPZ"]).KG_NPZ))
            if "synthetic" in getattr(_kg_probe, "files", ()):
                logging.getLogger("isca_tpu").warning(
                    "RRTMG-LW is using SYNTHETIC correlated-k tables "
                    "(shape-correct, physically plausible, NOT AER-accurate). "
                    "Supply AER's rrtmg_lw.nc via tools/extract_rrtmg_lw.py "
                    "for production radiation — the same external data file "
                    "the reference loads at runtime (rrtmg_lw_read_nc.f90).")
            self.lw_rrtmg = RRTMGLw(
                RRTMGLwConfig(co2vmr=config.co2ppmv * 1e-6,
                              n2ovmr=config.n2ovmr, ch4vmr=config.ch4vmr,
                              grav=C.grav, cp_air=C.cp_air),
                kg=config.lw_kg_path)
        # grey companion (always built: fallback + window diagnostics)
        lw_cfg = dataclasses.replace(config.lw, solar_constant=0.0)
        self.grey = TwoStreamGray(lw_cfg)
        self.o3_field = None        # optional (..., L) profile set by driver

    def down(self, lat, lon, p_half, t, q, albedo, gmt=0.0, time_since_ae=0.0,
             dt_rad_avg=None, carbon_conc=None, cloud_fields=None) -> RadDownResult:
        """cloud_fields: optional (cf, reff_rad [um], qcl_rad [kg/kg],
        frac_liq) from SimCloud — converted to in-cloud water paths and fed
        through cldprop into the cloudy solvers (a coupling the reference
        stages but leaves commented out, idealized_moist_phys.F90:1175)."""
        cfg = self.config
        # coszen with the same astronomy options as the reference adapter
        orbit = astro.Orbit()
        dtr = dt_rad_avg if cfg.use_time_average_coszen else None
        coszen, frac, rr = astro.diurnal_solar(
            orbit, lat, lon, gmt, time_since_ae, dtr)
        coszen = coszen * frac      # mean cos over the averaging window
        coszen_full = coszen

        o3 = (self.o3_field if self.o3_field is not None
              else jnp.full_like(t, cfg.o3_mmr))
        if cfg.do_zm_tracers:
            q = jnp.broadcast_to(jnp.mean(q, axis=1, keepdims=True), q.shape)

        # longitude subsampling (rrtm_radiation.F90 lonstep): radiation on
        # every k-th longitude column, interpolated back after the solve
        k = self._k = max(1, int(cfg.lonstep))
        if k > 1:
            if t.shape[1] % k:
                raise ValueError(f"lonstep={k} must divide nlon={t.shape[1]}")
            sub = lambda a: a[:, ::k]
            lat, lon, p_half, t, q, albedo, coszen, o3 = map(
                sub, (lat, lon, p_half, t, q, albedo, coszen, o3))
            if cloud_fields is not None:
                cloud_fields = tuple(map(sub, cloud_fields))

        p_full = 0.5 * (p_half[..., :-1] + p_half[..., 1:])
        co2 = (carbon_conc * 1e-6 if carbon_conc is not None else None)

        # input guards exactly as the reference adapter applies before every
        # RRTMG call (rrtm_radiation.F90:147-149, 855-859): the k-tables are
        # only valid over a finite (T, q) range, and column physics can hand
        # radiation slightly-negative humidity or excursion temperatures at
        # the model top — unguarded, those NaN the correlated-k interpolation
        t = jnp.clip(t, cfg.temp_lower_limit, cfg.temp_upper_limit)
        q = jnp.maximum(q, cfg.h2o_lower_limit)

        cloud_kw = {}
        lw_cloud_kw = {}
        if cloud_fields is not None:
            from isca_tpu.physics.rrtmg_sw import cldprop_sw
            cf, reff, qcl, frac_liq = cloud_fields
            C = cfg.constants
            dp = p_half[..., 1:] - p_half[..., :-1]
            # in-cloud water path [g/m2]: grid-mean qcl / cloud fraction
            cwp = qcl / jnp.maximum(cf, 1e-4) * dp / C.grav * 1.0e3
            cwp = jnp.where(cf > 1e-4, cwp, 0.0)
            clwp = cwp * frac_liq
            ciwp = cwp * (1.0 - frac_liq)
            tauc, ssac, asmc = cldprop_sw(cf, clwp, ciwp, reff, reff)
            cloud_kw = dict(cldfrac=cf, taucld=tauc, ssacld=ssac, asmcld=asmc)
            lw_cloud_kw = dict(cldfrac=cf, clwp=clwp, ciwp=ciwp,
                               rel=jnp.clip(reff, 2.5, 60.0),
                               rei=jnp.clip(reff, 5.0, 131.0))

        # ---- LW ----
        if self.lw_rrtmg is not None:
            # half-level temperatures: interior = mean of adjacent layers,
            # endpoints extrapolated (rrtm_radiation.F90 tz staging)
            t_half = jnp.concatenate([
                t[..., :1],
                0.5 * (t[..., 1:] + t[..., :-1]),
                1.5 * t[..., -1:] - 0.5 * t[..., -2:-1]], axis=-1)
            t_half = jnp.clip(t_half, cfg.temp_lower_limit,
                              cfg.temp_upper_limit)
            lw_down_flux, self._lw_stash = self.lw_rrtmg.down_phase(
                p_half, p_full, t, t_half, q, o3, co2vmr=co2, **lw_cloud_kw)
            surf_lw_down = lw_down_flux[..., -1]
            lw_down = lw_down_flux
            zl = jnp.zeros_like(t)
            grey_fields = dict(lw_dtrans=zl, lw_dtrans_win=zl, b=zl, b_win=zl)
        else:
            down_lw = self.grey.down(lat, lon, p_half, t, q, albedo,
                                     gmt=gmt, time_since_ae=time_since_ae,
                                     dt_rad_avg=dt_rad_avg)
            surf_lw_down = down_lw.surf_lw_down
            lw_down = down_lw.lw_down
            grey_fields = dict(lw_dtrans=down_lw.lw_dtrans,
                               lw_dtrans_win=down_lw.lw_dtrans_win,
                               b=down_lw.b, b_win=down_lw.b_win)
            self._grey_down = down_lw

        # ---- SW ----
        swf = self.sw(p_half, p_full, t, q, o3, coszen,
                      albedo, albedo, co2vmr=co2, **cloud_kw)
        # Earth-sun distance factor scales incident flux (scalar rr)
        sw_down = swf.swdflx * rr
        sw_up_internal = swf.swuflx * rr
        net_surf_sw_down = sw_down[..., -1] - sw_up_internal[..., -1]
        # stored for up() at radiation (subsampled) resolution; down/up are
        # always called within one trace
        self._sw_heat = swf.swhr * rr
        self._sw_up = sw_up_internal
        ex = lambda a: _lon_expand(a, k, cfg.do_zm_rad)
        return RadDownResult(
            net_surf_sw_down=ex(net_surf_sw_down),
            surf_lw_down=ex(surf_lw_down),
            lw_down=ex(lw_down),
            sw_down=ex(sw_down),
            coszen=coszen_full,
            insolation=cfg.solr_cnst * coszen_full,
            **{name: ex(v) for name, v in grey_fields.items()},
        )

    def up(self, down: RadDownResult, p_half, t_surf, albedo) -> RadResult:
        cfg = self.config
        k = getattr(self, "_k", 1)
        if k > 1:
            sub = lambda a: a[:, ::k]
            p_half, t_surf, albedo = map(sub, (p_half, t_surf, albedo))
        ex = lambda a: _lon_expand(a, k, cfg.do_zm_rad)
        if self.lw_rrtmg is not None:
            lwf = self.lw_rrtmg.up_phase(self._lw_stash, t_surf)
            tdt_rad = lwf.hr + self._sw_heat
            net_lw_surf = lwf.uflx[..., -1] - lwf.lw_dn_surf
            return RadResult(
                tdt_rad=ex(tdt_rad), tdt_solar=ex(self._sw_heat),
                olr=ex(lwf.olr), lw_up=ex(lwf.uflx), sw_up=ex(self._sw_up),
                net_lw_surf=ex(net_lw_surf))
        lw = self.grey.up(self._grey_down, p_half, t_surf, albedo)
        # grey up() includes its own (zero-insolation) SW; add RRTMG SW heating
        tdt_rad = lw.tdt_rad + self._sw_heat
        return RadResult(
            tdt_rad=ex(tdt_rad), tdt_solar=ex(self._sw_heat), olr=ex(lw.olr),
            lw_up=ex(lw.lw_up), sw_up=ex(self._sw_up),
            net_lw_surf=ex(lw.net_lw_surf),
        )
