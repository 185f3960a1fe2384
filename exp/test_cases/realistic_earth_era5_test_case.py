"""Realistic-Earth configuration (MiMA-style with real boundary conditions):
ERA5 smoothed topography + land mask, the ozone_1990 climatology, RRTM
radiation with seasonal insolation, full Betts-Miller convection, bucket
hydrology over land. Boundary files are read from the reference's `input/`
tree when present (pass --inputdir to point elsewhere); the reference test
case is exp/test_cases/realistic_continents + MiMA."""
import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from common import default_diag, run  # noqa: E402

from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
from isca_tpu.physics.rrtm_radiation import RRTMConfig
from isca_tpu.utils.input_files import load_topography, read_netcdf
from isca_tpu.utils.time_interp import load_pressure_climatology

p = argparse.ArgumentParser()
p.add_argument("--resolution", default="T42")
p.add_argument("--levels", type=int, default=40)
p.add_argument("--days", type=int, default=30)
p.add_argument("--months", type=int, default=1)
p.add_argument("--datadir", default="runs")
p.add_argument("--inputdir", default="/root/reference/input")
args = p.parse_args()

cfg = GreyMoistConfig()
cfg = dataclasses.replace(cfg, core=dataclasses.replace(
    cfg.core, resolution=args.resolution, num_levels=args.levels),
    physics=dataclasses.replace(
        cfg.physics, radiation_scheme="rrtm",
        rrtm=RRTMConfig(do_seasonal=True),
        convection_scheme="FULL_BETTS_MILLER", bucket=True))
model = GreyMoistModel(cfg)

lats = np.degrees(np.asarray(model.core.T.lats))
lons = np.degrees(np.asarray(model.core.T.lons))

topo_file = os.path.join(args.inputdir, "era5_smoothed_topography_land_masks",
                         "era-spectral_T42_64x128.nc")
land_file = os.path.join(args.inputdir, "land_masks", "era_land_t42.nc")
o3_file = os.path.join(args.inputdir, "rrtm_input_files", "ozone_1990.nc")

zsurf = load_topography(topo_file, lats, lons)
land_d = read_netcdf(land_file)
from isca_tpu.utils.input_files import regrid_bilinear
land = regrid_bilinear(land_d["lat"], land_d["lon"], land_d["land_mask"],
                       lats, lons)
land = (land > 0.5).astype(np.float32)
# surface HEIGHT in meters (set_land multiplies by grav itself); the ERA5
# file is already spectrally smoothed at the model truncation
model.set_land(land, surf_geopotential=np.maximum(zsurf, 0.0))
model.physics.o3_series = load_pressure_climatology(o3_file, "ozone_1990",
                                                    lats, lons)
run("realistic_earth_era5", model, args, diag=default_diag())
