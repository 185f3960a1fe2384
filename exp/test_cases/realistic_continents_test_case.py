"""Realistic continents (exp/test_cases/realistic_continents): idealized
continental outlines + Sauliere topography, bucket hydrology over land,
seasonal grey radiation; the fixed-SST variant prescribes a zonal profile
over ocean."""
import dataclasses

import numpy as np

from common import parse_args, run

from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
from isca_tpu.utils.land_generator import generate_land

args = parse_args()
cfg = GreyMoistConfig()
cfg = dataclasses.replace(cfg, physics=dataclasses.replace(
    cfg.physics, bucket=True))
model = GreyMoistModel(cfg)
lats = np.degrees(np.asarray(model.core.T.lats))
lons = np.degrees(np.asarray(model.core.T.lons))
land, topo = generate_land(lats, lons, "continents",
                           topo_mode="sauliere2012")
model.set_land(land, surf_geopotential=9.80 * topo)
run("realistic_continents", model, args)
