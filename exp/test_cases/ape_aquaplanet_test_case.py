"""Aquaplanet Experiment (APE) prescribed-SST aquaplanet
(exp/test_cases/ape_aquaplanet): the 'qobs' analytic SST profile of
Neale & Hoskins (2000) held fixed through the mixed layer."""
import dataclasses

import numpy as np

from common import parse_args, run

from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
from isca_tpu.utils.time_interp import TimeSeries

import jax.numpy as jnp

args = parse_args()
cfg = GreyMoistConfig()
cfg = dataclasses.replace(cfg, physics=dataclasses.replace(
    cfg.physics, mixed_layer=dataclasses.replace(
        cfg.physics.mixed_layer, do_sc_sst=True)))
model = GreyMoistModel(cfg)
lat = np.asarray(model.core.T.lats)          # radians
phi = np.clip(np.abs(lat) * 3.0 / np.pi, 0.0, 1.0)  # |lat|/60deg capped
sst = 273.15 + 27.0 * (1 - 0.5 * (np.sin(np.pi * phi / 2.0) ** 2
                                  + np.sin(np.pi * phi / 2.0) ** 4))
nlon = model.core.T.lons.shape[0]
sst2d = np.broadcast_to(sst[:, None], (lat.size, nlon)).copy()
model.physics.sst_series = TimeSeries(
    data=jnp.asarray(sst2d[None]), times=jnp.asarray([0.0]),
    periodic=True, period_seconds=360 * 86400.0)
run("ape_aquaplanet", model, args)
