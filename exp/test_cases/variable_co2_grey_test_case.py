"""Time-varying CO2 with Byrne grey radiation (exp/test_cases/
variable_co2_concentration, grey branch): co2 timeseries drives the
Byrne & O'Gorman LW optical depths."""
import dataclasses

import numpy as np

from common import parse_args, run

from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
from isca_tpu.physics.two_stream_gray import TwoStreamConfig
from isca_tpu.utils.time_interp import TimeSeries

import jax.numpy as jnp

args = parse_args()
cfg = GreyMoistConfig()
cfg = dataclasses.replace(cfg, physics=dataclasses.replace(
    cfg.physics, radiation=TwoStreamConfig(rad_scheme="byrne")))
model = GreyMoistModel(cfg)
# linear CO2 ramp 300 -> 600 ppmv over 10 years
years = 10
t = np.linspace(0, years * 360 * 86400.0, 24)
co2 = np.linspace(300.0, 600.0, 24)
model.physics.co2_series = TimeSeries(
    data=jnp.asarray(co2), times=jnp.asarray(t),
    periodic=False, period_seconds=float(t[-1]))
run("variable_co2_grey", model, args)
