"""Idealized moist physics driver (Frierson grey-radiation tier).

Reference: src/atmos_spectral/driver/solo/idealized_moist_phys.F90:819-1395.
Sequencing (verified against the source; boundary-condition subtlety per
docs/source/isca_structure.rst): convection -> large-scale condensation ->
radiation down-sweep -> surface fluxes -> radiation up-sweep -> boundary-layer
diffusivities -> vertical-diffusion down-sweep -> mixed-layer implicit surface
energy balance -> vertical-diffusion up-sweep.

Prognostic fields are taken at the `previous` time level, pressures/heights at
`current` where the reference does (p at previous for convection/condensation).
The mixed layer advances with dt_real (not the leapfrog 2*dt).

All internal physics arrays are level-LAST (..., L) columns; the driver
converts from the dycore's level-first layout at the boundary.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from isca_tpu.constants import Constants, EARTH
from isca_tpu.physics.betts_miller import BettsMiller, BettsMillerConfig
from isca_tpu.physics.cloud_simple import CloudSimple, CloudSimpleConfig
from isca_tpu.physics.damping_driver import DampingDriverConfig, damping_driver
from isca_tpu.physics.diffusivity import DiffusivityConfig, diffusivity
from isca_tpu.physics.dry_convection import DryConvectionConfig, dry_convection
from isca_tpu.physics.giant_planet import (
    GiantPlanetConfig,
    gp_surface_flux,
    rayleigh_bottom_drag,
)
from isca_tpu.physics.lscale_cond import LscaleCond, LscaleCondConfig
from isca_tpu.physics.my25_turb import MY25Config, my25_turb
from isca_tpu.physics.mixed_layer import (
    MixedLayerConfig,
    analytic_qflux,
    mixed_layer_step,
)
from isca_tpu.physics.qe_moist_convection import QEMoistConvection, QEMoistConvectionConfig
from isca_tpu.physics.ras import RAS, RASConfig
from isca_tpu.physics.sat_vapor_pres import SatVaporPres
from isca_tpu.physics.surface_flux import SurfaceFluxConfig, surface_flux
from isca_tpu.physics.two_stream_gray import TwoStreamConfig, TwoStreamGray
from isca_tpu.physics.vert_diff import gcm_vert_diff_down, gcm_vert_diff_up


@dataclasses.dataclass(frozen=True)
class MoistPhysicsConfig:
    convection_scheme: str = "SIMPLE_BETTS_MILLER"   # | FULL_BETTS_MILLER | RAS | NONE | DRY
    turb: bool = True
    do_damping: bool = False
    mixed_layer_bc: bool = True
    gp_surface: bool = False         # giant-planet lower boundary
    # Manabe bucket hydrology (idealized_moist_phys.F90:147-155)
    bucket: bool = False
    init_bucket_depth: float = 1000.0
    init_bucket_depth_land: float = 20.0
    max_bucket_depth_land: float = 0.15
    robert_bucket: float = 0.04
    raw_bucket: float = 0.53
    radiation_scheme: str = "two_stream"   # | "rrtm" (RRTMG-SW + grey LW)
    do_cloud_simple: bool = False    # SimCloud diagnostic clouds (idealized_moist_phys.F90:120)
    do_cloud_spookie: bool = False   # SPOOKIE-protocol clouds (mutually exclusive)
    do_simple_sat: bool = True          # sat_vapor_pres do_simple (Frierson)
    roughness_mom: float = 0.05
    roughness_heat: float = 0.05
    roughness_moist: float = 0.05
    land_roughness_prefactor: float = 1.0
    gust_const: float = 1.0
    do_conserve_energy_diff: bool = True
    # radiation timestep [s]; <= dt means every step (rrtm_radiation_nml
    # dt_rad). When larger, heating rates and surface radiative fluxes are
    # stored and reused between radiation calls.
    dt_rad: float = 0.0
    convection: QEMoistConvectionConfig = QEMoistConvectionConfig()
    condensation: LscaleCondConfig = LscaleCondConfig(do_simple=False, do_evap=False)
    radiation: TwoStreamConfig = TwoStreamConfig()
    surface: SurfaceFluxConfig = SurfaceFluxConfig()
    # vert_turb_driver.F90:103-122 scheme selection: do_diffusivity /
    # do_mellor_yamada / do_entrain / do_edt / do_stable_bl (+shallow_conv)
    bl_scheme: str = "diffusivity"   # | "mellor_yamada" | "entrain" | "edt"
    #                                | "stable_bl"
    bl: DiffusivityConfig = DiffusivityConfig(do_simple=True, frac_inner=0.1)
    my25: "MY25Config" = None        # type: ignore[assignment]
    entrain: "EntrainConfig" = None  # type: ignore[assignment]
    edt: "EDTConfig" = None          # type: ignore[assignment]
    stable_bl: "StableBLConfig" = None   # type: ignore[assignment]
    do_shallow_conv: bool = False    # add shallow-convection K to diff_t
    shallow_conv: "ShallowConvConfig" = None  # type: ignore[assignment]
    mixed_layer: MixedLayerConfig = MixedLayerConfig()
    dry_convection: DryConvectionConfig = DryConvectionConfig()
    betts_miller: BettsMillerConfig = BettsMillerConfig()
    ras: RASConfig = RASConfig()
    damping: DampingDriverConfig = DampingDriverConfig()
    giant: GiantPlanetConfig = GiantPlanetConfig()
    cloud: CloudSimpleConfig = CloudSimpleConfig()
    spookie: "CloudSpookieConfig" = None     # type: ignore[assignment]
    rrtm: "RRTMConfig | None" = None       # used when radiation_scheme="rrtm"
    socrates: "SocratesConfig | None" = None   # radiation_scheme="socrates"
    constants: Constants = EARTH
    debug_chain: bool = False   # expose BL/vert_diff/mixed-layer intermediates in diag


class RadCache(NamedTuple):
    """Stored radiation results for dt_rad substepping (the reference
    rrtm adapter's stored intermediate fluxes, rrtm_radiation.F90:150-205:
    radiation is recomputed every `dt_rad` seconds and the heating rates and
    surface fluxes reused in between)."""
    tdt_rad: jax.Array          # (..., L)
    tdt_solar: jax.Array        # (..., L)
    olr: jax.Array              # (...)
    net_surf_sw_down: jax.Array
    surf_lw_down: jax.Array
    coszen: jax.Array
    net_lw_surf: jax.Array
    age: jax.Array              # int32 steps since last radiation call


def zero_rad_cache(shape2d, L, dtype):
    z2 = jnp.zeros(shape2d, dtype)
    z3 = jnp.zeros(shape2d + (L,), dtype)
    return RadCache(tdt_rad=z3, tdt_solar=z3, olr=z2, net_surf_sw_down=z2,
                    surf_lw_down=z2, coszen=z2, net_lw_surf=z2,
                    age=jnp.zeros((), jnp.int32))


class MoistPhysicsResult(NamedTuple):
    dt_u: jax.Array
    dt_v: jax.Array
    dt_t: jax.Array
    dt_q: jax.Array
    t_surf: jax.Array
    diagnostics: dict
    rad_cache: "RadCache | None" = None


class MoistPhysics:
    def __init__(self, config: MoistPhysicsConfig, lats, lons):
        """lats (nlat,), lons (nlon,) in radians."""
        self.config = config
        self.C = config.constants
        self.svp = SatVaporPres(constants=self.C, do_simple=config.do_simple_sat)
        self.convection = QEMoistConvection(config.convection, self.svp)
        self.betts_miller = BettsMiller(config.betts_miller, self.svp)
        self.ras = RAS(config.ras, self.svp)
        self.condensation = LscaleCond(config.condensation, self.svp)
        if config.radiation_scheme.lower() == "rrtm":
            from isca_tpu.physics.rrtm_radiation import RRTMConfig, RRTMRadiation
            self.radiation = RRTMRadiation(config.rrtm or RRTMConfig())
        elif config.radiation_scheme.lower() == "socrates":
            from isca_tpu.physics.socrates import (SocratesConfig,
                                                   SocratesRadiation)
            self.radiation = SocratesRadiation(
                config.socrates or SocratesConfig())
        else:
            self.radiation = TwoStreamGray(config.radiation)
        self.cloud = CloudSimple(config.cloud, self.svp) if config.do_cloud_simple else None
        if config.do_cloud_spookie:
            from isca_tpu.physics.cloud_simple import CloudSpookieConfig
            self.spookie_cfg = config.spookie or CloudSpookieConfig()
        self.lat2d = lats[:, None] * jnp.ones_like(lons)[None, :]
        self.lon2d = jnp.ones_like(lats)[:, None] * lons[None, :]
        ml = config.mixed_layer
        self.ocean_qflux = (
            analytic_qflux(ml, self.lat2d) if ml.do_qflux else jnp.zeros_like(self.lat2d)
        )
        if ml.do_warmpool:
            from isca_tpu.physics.mixed_layer import warmpool_qflux
            self.ocean_qflux = self.ocean_qflux + warmpool_qflux(
                ml, self.lon2d, self.lat2d)
        self.land_mask = None   # optional (nlat, nlon) float mask set by the model
        self.zsurf = None       # optional (nlat, nlon) surface height in m
        self.co2_series = None   # optional TimeSeries of CO2 ppmv
        self.sst_series = None   # optional TimeSeries of prescribed SSTs (lat, lon)
        self.ice_series = None   # optional TimeSeries of sea-ice concentration
        self.qflux_series = None  # optional TimeSeries of ocean q-flux (load_qflux)
        self.o3_series = None    # optional PressureTimeSeries of ozone mmr
        self.hprime = jnp.zeros_like(self.lat2d)  # subgrid-orography stdev (mg_drag)
        self.cg_drag = None     # CgDrag instance; see init_cg_drag

    def init_cg_drag(self, pref):
        """Build the convective-GWD source tables from reference full-level
        pressures (cg_drag_init needs pref; called by the model after the
        vertical coordinate exists)."""
        from isca_tpu.physics.gravity_wave_drag import CgDrag
        self.cg_drag = CgDrag(self.config.damping.cg, self.lat2d, pref)

    def __call__(
        self,
        delta_t, dt_real,
        # level-last prognostic fields at `previous`
        u_prev, v_prev, t_prev, q_prev,
        # pressures/heights: previous and current
        p_full_prev, p_half_prev,
        p_full_curr, p_half_curr, z_full_curr, z_half_curr,
        t_surf,
        gmt=0.0, time_since_ae=0.0,
        bucket_depth=None,      # (lat, lon) at `current` when cfg.bucket
        time_seconds=0.0,       # model time for time-varying inputs
        wg_full=None,           # (..., L) pressure velocity for SimCloud
        tke=None,               # (..., L+1) MY2.5 TKE state when bl_scheme
        rad_cache=None,         # RadCache for dt_rad substepping
    ) -> MoistPhysicsResult:
        cfg, C = self.config, self.C
        L = t_prev.shape[-1]
        shape2d = t_prev.shape[:-1]
        dt_u = jnp.zeros_like(u_prev)
        dt_v = jnp.zeros_like(v_prev)
        dt_t = jnp.zeros_like(t_prev)
        dt_q = jnp.zeros_like(q_prev)
        diag = {}

        # ---- convection ----
        if cfg.convection_scheme in ("SIMPLE_BETTS_MILLER", "FULL_BETTS_MILLER"):
            scheme = (self.convection if cfg.convection_scheme == "SIMPLE_BETTS_MILLER"
                      else self.betts_miller)
            conv = scheme(delta_t, t_prev, q_prev, p_full_prev, p_half_prev)
            tg_tmp = t_prev + conv.deltaT
            qg_tmp = q_prev + conv.deltaq
            dt_t = dt_t + conv.deltaT / delta_t
            dt_q = dt_q + conv.deltaq / delta_t
            conv_rain = conv.rain / delta_t
            depth_change_conv = conv.rain / C.dens_h2o
            diag.update(convection_rain=conv_rain, cape=conv.cape, cin=conv.cin)
        elif cfg.convection_scheme == "RAS":
            # Relaxed Arakawa-Schubert (idealized_moist_phys.F90:932)
            rr = self.ras(delta_t, t_prev, q_prev, u_prev, v_prev,
                          p_full_prev, p_half_prev,
                          z_half_curr - z_half_curr[..., -1:])
            tg_tmp = t_prev + rr.dt_t
            qg_tmp = q_prev + rr.dt_q
            dt_t = dt_t + rr.dt_t / delta_t
            dt_q = dt_q + rr.dt_q / delta_t
            dt_u = dt_u + rr.dt_u / delta_t
            dt_v = dt_v + rr.dt_v / delta_t
            conv_rain = (rr.rain + rr.snow) / delta_t
            depth_change_conv = rr.rain / C.dens_h2o
            diag.update(convection_rain=conv_rain, klcl=rr.klcl,
                        ras_precip_ev=rr.precip_ev / delta_t)
        elif cfg.convection_scheme == "DRY":
            dc = dry_convection(cfg.dry_convection, t_prev, p_full_prev, p_half_prev)
            dt_t = dt_t + dc.dt_tg
            tg_tmp = t_prev + dc.dt_tg * delta_t
            qg_tmp = q_prev
            conv_rain = jnp.zeros(shape2d, t_prev.dtype)
            depth_change_conv = jnp.zeros(shape2d, t_prev.dtype)
            diag.update(cape=dc.cape, cin=dc.cin)
        else:
            tg_tmp, qg_tmp = t_prev, q_prev
            conv_rain = jnp.zeros(shape2d, t_prev.dtype)
            depth_change_conv = jnp.zeros(shape2d, t_prev.dtype)

        # ---- large-scale condensation ----
        if cfg.convection_scheme != "DRY":
            cond = self.condensation(tg_tmp, qg_tmp, p_full_prev, p_half_prev)
            dt_t = dt_t + cond.tdel / delta_t
            dt_q = dt_q + cond.qdel / delta_t
            cond_rain = (cond.rain + cond.snow) / delta_t
            depth_change_cond = cond.rain / C.dens_h2o
            diag.update(condensation_rain=cond_rain)
        else:
            cond_rain = jnp.zeros(shape2d, t_prev.dtype)
            depth_change_cond = jnp.zeros(shape2d, t_prev.dtype)
        diag["precipitation"] = conv_rain + cond_rain

        # ---- SimCloud diagnostic clouds (idealized_moist_phys.F90:1016-1033) ----
        if self.cloud is not None:
            ocean = (self.land_mask <= 0.5) if self.land_mask is not None else None
            clouds = self.cloud(
                p_half_curr, p_full_curr, t_prev, q_prev,
                z_full_curr, wg_full if wg_full is not None else jnp.zeros_like(t_prev),
                p_half_curr[..., -1], ocean=ocean,
            )
            diag.update(clouds.diagnostics)
        elif cfg.do_cloud_spookie:
            from isca_tpu.physics.cloud_simple import (CloudSimpleResult,
                                                       cloud_spookie)
            cf_, cca_, reff_, qcl_, spk_diag = cloud_spookie(
                self.spookie_cfg, self.svp, p_full_curr, t_prev, q_prev)
            frac_liq_ = spk_diag["frac_liq"]
            clouds = CloudSimpleResult(cf=cf_, reff_rad=reff_, qcl_rad=qcl_,
                                       frac_liq=frac_liq_,
                                       diagnostics=spk_diag)
            diag.update(spk_diag)

        # ---- radiation: downward pass ----
        from isca_tpu.physics.mixed_layer import albedo_with_ice, surface_albedo
        albedo = jnp.broadcast_to(
            surface_albedo(cfg.mixed_layer, self.lat2d, self.land_mask),
            shape2d).astype(t_prev.dtype)
        if cfg.mixed_layer.update_albedo_from_ice and self.ice_series is not None:
            albedo = albedo_with_ice(cfg.mixed_layer, albedo,
                                     self.ice_series.at(time_seconds))
            diag["albedo"] = albedo
        dt_rad_avg = cfg.radiation.dt_rad_avg if cfg.radiation.dt_rad_avg > 0 else dt_real
        dt_rad_radians = dt_rad_avg / C.seconds_per_day * 2.0 * jnp.pi
        co2 = self.co2_series.at(time_seconds) if self.co2_series is not None else None
        if self.o3_series is not None and hasattr(self.radiation, "o3_field"):
            # time-varying ozone climatology interpolated onto the current
            # model pressures (rrtm_radiation.F90 o3 input via interpolator)
            self.radiation.o3_field = self.o3_series.at(
                time_seconds, p_full_curr)
        rad_kw = {}
        if ((self.cloud is not None or cfg.do_cloud_spookie)
                and cfg.radiation_scheme.lower() in ("rrtm", "socrates")):
            # SimCloud -> RRTMG-SW / SOCRATES cloud optics (set_cld staging;
            # for RRTM a coupling the reference leaves commented out)
            rad_kw["cloud_fields"] = (clouds.cf, clouds.reff_rad,
                                      clouds.qcl_rad, clouds.frac_liq)

        def compute_rad():
            rad_down = self.radiation.down(
                self.lat2d, self.lon2d, p_half_curr, t_prev, q_prev, albedo,
                gmt=gmt, time_since_ae=time_since_ae,
                dt_rad_avg=dt_rad_radians, carbon_conc=co2, **rad_kw,
            )
            rad = self.radiation.up(rad_down, p_half_curr, t_surf, albedo)
            return RadCache(
                tdt_rad=rad.tdt_rad, tdt_solar=rad.tdt_solar, olr=rad.olr,
                net_surf_sw_down=rad_down.net_surf_sw_down,
                surf_lw_down=rad_down.surf_lw_down, coszen=rad_down.coszen,
                net_lw_surf=rad.net_lw_surf, age=jnp.ones((), jnp.int32))

        if cfg.dt_rad > dt_real and rad_cache is not None:
            # dt_rad substepping: recompute radiation every n_rad steps,
            # reuse the stored heating/fluxes otherwise; the exact int32
            # step counter rides in the cache (the reference adapter's
            # dt_last bookkeeping, rrtm_radiation.F90)
            n_rad = max(1, int(round(cfg.dt_rad / dt_real)))
            do_rad = rad_cache.age % n_rad == 0
            rad = jax.lax.cond(
                do_rad, compute_rad,
                lambda: rad_cache._replace(age=rad_cache.age + 1))
        else:
            rad = compute_rad()

        # ---- surface fluxes (lowest level, previous) ----
        z_surf = z_half_curr[..., -1]
        if not cfg.gp_surface:
            land = None
            if self.land_mask is not None:
                land = self.land_mask > 0.5
            rough_mom = jnp.full(shape2d, cfg.roughness_mom, t_prev.dtype)
            rough_heat = jnp.full(shape2d, cfg.roughness_heat, t_prev.dtype)
            rough_moist = jnp.full(shape2d, cfg.roughness_moist, t_prev.dtype)
            if land is not None and cfg.land_roughness_prefactor != 1.0:
                # rougher (or smoother) land (idealized_moist_phys.F90:601-609)
                pf = cfg.land_roughness_prefactor
                rough_mom = jnp.where(land, pf * rough_mom, rough_mom)
                rough_heat = jnp.where(land, pf * rough_heat, rough_heat)
                rough_moist = jnp.where(land, pf * rough_moist, rough_moist)
            sf = surface_flux(
                cfg.surface, self.svp,
                t_prev[..., -1], q_prev[..., -1], u_prev[..., -1], v_prev[..., -1],
                p_full_curr[..., -1], z_full_curr[..., -1] - z_surf,
                p_half_curr[..., -1], t_surf,
                rough_mom,
                rough_heat,
                rough_moist,
                jnp.full(shape2d, cfg.gust_const, t_prev.dtype),
                land=land,
                bucket_depth=bucket_depth if cfg.bucket else None,
                max_bucket_depth_land=cfg.max_bucket_depth_land,
                dt=delta_t,
            )
            diag.update(flux_t=sf.flux_t, flux_lhe=C.hlv * sf.flux_q, u_star=sf.u_star)
        else:
            sf = None

        # ---- radiation heating added to dt_t ----
        dt_t = dt_t + rad.tdt_rad
        diag.update(olr=rad.olr, swdn_sfc=rad.net_surf_sw_down,
                    lwdn_sfc=rad.surf_lw_down, tdt_rad=rad.tdt_rad,
                    coszen=rad.coszen)

        # ---- giant-planet lower boundary: interior heat flux + bottom drag ----
        if cfg.gp_surface:
            dt_t = gp_surface_flux(cfg.giant, dt_t, p_half_curr)
            bd = rayleigh_bottom_drag(
                cfg.giant, delta_t, self.lat2d, u_prev, v_prev,
                p_half_prev, p_full_prev, dt_u, dt_v, dt_t,
            )
            dt_u, dt_v, dt_t = bd.dt_u, bd.dt_v, bd.dt_t

        # ---- upper-atmosphere damping (sponge + mg/cg gravity-wave drag) ----
        if cfg.do_damping:
            dmp = damping_driver(
                cfg.damping, delta_t, p_full_curr, u_prev, v_prev,
                dt_u, dt_v, dt_t,
                temp=t_prev, p_half=p_half_curr,
                z_full=z_full_curr, z_half=z_half_curr,
                hprime=self.hprime, cg=self.cg_drag, lat2d=self.lat2d,
                day_of_year=time_seconds / C.seconds_per_day,
                days_per_year=C.orbital_period / C.seconds_per_day,
            )
            dt_u, dt_v, dt_t = dmp.dt_u, dmp.dt_v, dmp.dt_t
            diag.update(dmp.diagnostics)

        if not cfg.turb:
            return MoistPhysicsResult(dt_u, dt_v, dt_t, dt_q, t_surf, diag,
                                      rad_cache=rad)

        # ---- boundary-layer diffusivities (current == previous fields here;
        #      the driver passes prev since grid lag makes them the same source)
        if sf is not None:
            u_star, b_star = sf.u_star, sf.b_star
        else:
            u_star = jnp.zeros(shape2d, t_prev.dtype)
            b_star = jnp.zeros(shape2d, t_prev.dtype)
        if cfg.bl_scheme.lower() in ("mellor_yamada", "my25"):
            # vert_turb_driver.F90:142 MY2.5 branch: prognostic-TKE closure
            my_cfg = cfg.my25 or MY25Config(grav=C.grav)
            fracland = (self.land_mask if self.land_mask is not None
                        else jnp.zeros(shape2d, t_prev.dtype))
            theta = t_prev * (1.0e5 / p_full_curr) ** C.kappa
            z0 = jnp.full(shape2d, cfg.roughness_mom, t_prev.dtype)
            my = my25_turb(
                my_cfg, dt_real, fracland, p_half_curr, p_full_curr, theta,
                u_prev, v_prev, z_half_curr - z_surf[..., None],
                z_full_curr - z_surf[..., None], z0,
                tke if tke is not None
                else jnp.zeros(shape2d + (L + 1,), t_prev.dtype),
                u_star=u_star,
            )
            bl_km, bl_kt = my.akm, my.akh
            diag["tke"] = my.tke
            diag["el0"] = my.el0
            # PBL top: highest level with TKE above threshold
            zh_ag = z_half_curr - z_surf[..., None]
            active = my.tke[..., 1:] > 1.0e-3
            diag["z_pbl"] = jnp.max(
                jnp.where(active, zh_ag[..., 1:], 0.0), axis=-1)
        elif cfg.bl_scheme.lower() == "edt":
            # vert_turb_driver.F90:107 EDT branch (Grenier-Bretherton TKE)
            from isca_tpu.physics.edt import EDTConfig, edt
            edt_cfg = cfg.edt or EDTConfig(constants=C)
            tdtlw = rad.tdt_rad - rad.tdt_solar
            zeros3 = jnp.zeros_like(t_prev)
            r = edt(edt_cfg, tdtlw, u_star, b_star, t_prev, q_prev,
                    zeros3, zeros3, diag.get("cf", zeros3),
                    u_prev, v_prev, z_full_curr, p_full_curr,
                    z_half_curr, p_half_curr)
            bl_km, bl_kt = r.k_m, r.k_t
            diag["z_pbl"] = r.pblh
            diag["tke_edt"] = r.tke
        elif cfg.bl_scheme.lower() == "entrain":
            # vert_turb_driver.F90:110 entrain branch (Bretherton closure):
            # base diffusivities from the K-profile scheme, overwritten
            # inside detected mixed layers
            from isca_tpu.physics.entrain import EntrainConfig, entrain
            en_cfg = cfg.entrain or EntrainConfig(constants=C)
            base = diffusivity(
                cfg.bl, t_prev, q_prev, u_prev, v_prev,
                p_full_curr, p_half_curr, z_full_curr - z_surf[..., None],
                z_half_curr - z_surf[..., None], u_star, b_star,
            )
            tdtlw = rad.tdt_rad - rad.tdt_solar
            zeros3 = jnp.zeros_like(t_prev)
            r = entrain(en_cfg, tdtlw, jnp.zeros(shape2d, bool),
                        u_star, b_star, t_prev, q_prev, zeros3, zeros3,
                        diag.get("cf", zeros3), u_prev, v_prev,
                        z_full_curr, p_full_curr, z_half_curr, p_half_curr,
                        base.k_m, base.k_t)
            bl_km, bl_kt = r.k_m, r.k_t
            diag["z_pbl"] = jnp.maximum(r.zsml, r.zradtop)
            diag["wentr_pbl"] = r.wentr_pbl
        elif cfg.bl_scheme.lower() == "stable_bl":
            # vert_turb_driver.F90:108 stable-BL branch (Louis/MO local K)
            from isca_tpu.physics.bl_schemes import (StableBLConfig,
                                                     stable_bl_turb)
            sb_cfg = cfg.stable_bl or StableBLConfig(constants=C)
            r = stable_bl_turb(
                sb_cfg, self.lat2d, t_prev, q_prev, u_prev, v_prev,
                z_full_curr - z_surf[..., None],
                z_half_curr - z_surf[..., None], u_star, b_star)
            bl_km, bl_kt = r.akm, r.akh
            diag["z_pbl"] = r.z_sbl
        else:
            bl = diffusivity(
                cfg.bl, t_prev, q_prev, u_prev, v_prev,
                p_full_curr, p_half_curr, z_full_curr - z_surf[..., None],
                z_half_curr - z_surf[..., None], u_star, b_star,
            )
            bl_km, bl_kt = bl.k_m, bl.k_t
            diag["z_pbl"] = bl.h_pbl

        if cfg.do_shallow_conv:
            # vert_turb_driver.F90:103 shallow_conv adds to the heat K
            from isca_tpu.physics.bl_schemes import (ShallowConvConfig,
                                                     shallow_conv)
            sc_cfg = cfg.shallow_conv or ShallowConvConfig(constants=C)
            akhsc, _ = shallow_conv(sc_cfg, self.svp, t_prev, q_prev,
                                    p_full_curr, p_half_curr)
            bl_kt = bl_kt + akhsc
            diag["akhsc"] = akhsc

        # ---- vertical diffusion down / mixed layer / up ----
        zero2 = jnp.zeros(shape2d, t_prev.dtype)
        down = gcm_vert_diff_down(
            C, delta_t,
            u_prev, v_prev, t_prev, q_prev,
            bl_km, bl_kt,
            p_half_curr, p_full_curr, z_full_curr,
            sf.flux_u if sf is not None else zero2,
            sf.flux_v if sf is not None else zero2,
            sf.dtaudu_atm if sf is not None else zero2,
            sf.dtaudv_atm if sf is not None else zero2,
            dt_u, dt_v, dt_t, dt_q,
            do_conserve_energy=cfg.do_conserve_energy_diff,
        )
        dt_u, dt_v = down.dt_u, down.dt_v
        if cfg.debug_chain:
            diag.update(
                dbg_km=bl_km, dbg_kt=bl_kt,
                dbg_dtmass=down.tri.dtmass, dbg_dflux_t=down.tri.dflux_t,
                dbg_dflux_q=down.tri.dflux_q, dbg_delta_t=down.tri.delta_t,
                dbg_delta_q=down.tri.delta_q, dbg_e=down.tri.e,
                dbg_f_t=down.tri.f_t, dbg_f_q=down.tri.f_q,
            )
            if sf is not None:
                diag.update(
                    dbg_dhdt_surf=sf.dhdt_surf, dbg_dedt_surf=sf.dedt_surf,
                    dbg_dhdt_atm=sf.dhdt_atm, dbg_dedq_atm=sf.dedq_atm,
                    dbg_flux_q=sf.flux_q, dbg_drag_q=sf.drag_q
                    if hasattr(sf, "drag_q") else sf.flux_q,
                )

        if cfg.mixed_layer_bc and sf is not None:
            from isca_tpu.physics.mixed_layer import heat_capacity_field
            C_ml = cfg.mixed_layer
            heat_capacity = heat_capacity_field(
                C_ml, self.lon2d, self.lat2d,
                land_mask=self.land_mask, zsurf=self.zsurf)
            ocean_qflux = (self.qflux_series.at(time_seconds)
                           if self.qflux_series is not None else self.ocean_qflux)
            if (C_ml.update_albedo_from_ice and self.qflux_series is not None
                    and self.land_mask is not None):
                # time-varying q-flux is zeroed over land/ice points
                # (mixed_layer.F90:659-666)
                ocean_qflux = jnp.where(self.land_mask > 0.5, 0.0, ocean_qflux)
            ml = mixed_layer_step(
                cfg.mixed_layer, dt_real, t_surf, down.tri,
                sf.flux_t, sf.flux_q, sf.flux_r,
                rad.net_surf_sw_down, rad.surf_lw_down,
                sf.dhdt_surf, sf.dedt_surf, sf.dedq_surf, sf.drdt_surf,
                sf.dhdt_atm, sf.dedq_atm,
                ocean_qflux=ocean_qflux,
                heat_capacity=heat_capacity,
                land_mask=self.land_mask,
                sst_prescribed=(self.sst_series.at(time_seconds)
                                if self.sst_series is not None else None),
                lats=self.lat2d,
            )
            tri = down.tri._replace(delta_t=ml.delta_t, delta_q=ml.delta_q)
            t_surf_out = ml.t_surf
            diag["t_surf"] = ml.t_surf
            if cfg.debug_chain:
                diag.update(dbg_ml_delta_t=ml.delta_t, dbg_ml_delta_q=ml.delta_q,
                            dbg_delta_t_surf=ml.delta_t_surf)
        else:
            # giant-planet / no-slab: zero-exchange closure (reference gp path)
            tri = down.tri
            t_surf_out = t_surf
        dt_t, dt_q = gcm_vert_diff_up(delta_t, tri)
        if cfg.bucket and sf is not None:
            depth_change_lh = sf.flux_q * delta_t / C.dens_h2o
            diag["dt_bucket"] = depth_change_cond + depth_change_conv - depth_change_lh
        return MoistPhysicsResult(dt_u, dt_v, dt_t, dt_q, t_surf_out, diag,
                                  rad_cache=rad)
