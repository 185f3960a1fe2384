"""RRTM radiation interface seam (full correlated-k port planned, round 2+).

Reference: src/atmos_param/rrtm_radiation/rrtm_radiation.F90 (adapter) +
rrtmg_{lw,sw}/gcm_model (93.5k LoC of vendored AER RRTMG: 16 LW + 14 SW
correlated-k bands with mcica cloud sampling). The TPU-native port plan:

1. extract the k-distribution tables from the reference's `*_k_g.f90` data
   statements / netCDF into packed arrays (init-time numpy);
2. per-band transmissivities as batched gather+interpolate kernels over the
   (T, p, eta) table axes — MXU/VPU friendly, one fused pass over bands;
3. two-stream adding with the same cumulative-scan structure as
   two_stream_gray (already exercised at scale);
4. `dt_rad` substepping with stored fluxes (the reference's rad timestep
   machinery) threaded through the model state as a pytree;
5. mcica stochastic cloud sampling via jax.random.

This module currently provides the configuration surface and the driver
seam: enabling it raises with this plan (matching the reference's behavior
when compiled with -DRRTM_NO_COMPILE, idealized_moist_phys.F90:1159-1162).
The ozone/CO2 input files (input/rrtm_input_files/ozone_1990.nc) are read
with utils.input_files.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RRTMConfig:
    do_read_ozone: bool = True
    ozone_file: str = "ozone_1990"
    co2ppmv: float = 300.0
    dt_rad: float = 0.0          # radiation timestep (0 -> every step)
    solr_cnst: float = 1368.22
    lonstep: int = 1
    do_rad_time_avg: bool = True
    use_dyofyr: bool = True


def run_rrtmg(*args, **kwargs):
    raise NotImplementedError(
        "RRTM radiation: the correlated-k port is scheduled for the next "
        "round (see module docstring for the TPU-native plan). Use "
        "two_stream_gray (frierson/byrne/geen/schneider) in the meantime."
    )
