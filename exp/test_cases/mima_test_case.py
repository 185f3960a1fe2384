"""MiMA-like realistic configuration (exp/test_cases/MiMA, Jucker & Gerber
2017): RRTM radiation with seasonal insolation and ozone, full Betts-Miller
convection, slab ocean. (RRTMG-LW activates when its k-tables are installed
— tools/extract_rrtmg_lw.py; falls back to grey LW otherwise.)"""
import dataclasses

from common import parse_args, run

from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
from isca_tpu.physics.rrtm_radiation import RRTMConfig

args = parse_args()
cfg = GreyMoistConfig()
cfg = dataclasses.replace(cfg, physics=dataclasses.replace(
    cfg.physics,
    radiation_scheme="rrtm",
    rrtm=RRTMConfig(do_seasonal=True, o3_mmr=1.0e-6),
    convection_scheme="FULL_BETTS_MILLER",
))
model = GreyMoistModel(cfg)
# To use a real ozone climatology file (reference input/rrtm_input_files/
# ozone_1990.nc):
#   from isca_tpu.utils.time_interp import load_pressure_climatology
#   import numpy as np
#   model.physics.o3_series = load_pressure_climatology(
#       "ozone_1990.nc", "ozone_1990",
#       np.degrees(np.asarray(model.core.T.lats)),
#       np.degrees(np.asarray(model.core.T.lons)))
run("mima", model, args)
