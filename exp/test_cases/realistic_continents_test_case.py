"""Realistic continents (exp/test_cases/realistic_continents): idealized
continental outlines + Sauliere topography, bucket hydrology over land,
seasonal grey radiation; the fixed-SST variant prescribes a zonal profile
over ocean."""
import dataclasses

import numpy as np

from common import parse_args, run

from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
from isca_tpu.utils.land_generator import generate_land
from isca_tpu.utils.topography import band_limit_topography

args = parse_args()
cfg = GreyMoistConfig()
cfg = dataclasses.replace(cfg, physics=dataclasses.replace(
    cfg.physics, bucket=True))
model = GreyMoistModel(cfg)
lats = np.degrees(np.asarray(model.core.T.lats))
lons = np.degrees(np.asarray(model.core.T.lons))
land, topo = generate_land(lats, lons, "continents",
                           topo_mode="sauliere2012")
# set_land takes surface HEIGHT in meters (it multiplies by grav itself);
# band-limit the raw topography through the model's own truncation first,
# as the reference does for input topography (Gibbs ringing from an
# un-truncated field destabilizes the semi-implicit step).
topo = band_limit_topography(model.core.T, np.asarray(topo),
                             n_smooth_passes=2, smooth_fraction=0.02)
model.set_land(land, surf_geopotential=topo)
run("realistic_continents", model, args)
