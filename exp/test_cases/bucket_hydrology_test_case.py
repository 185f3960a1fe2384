"""Bucket hydrology over idealized land (exp/test_cases/bucket_hydrology):
Frierson aquaplanet + square continent with bucket moisture."""
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
land, _ = generate_land(lats, lons, "square", boundaries=(20., 60., 20., 60.))
model.set_land(land)
run("bucket_hydrology", model, args)
