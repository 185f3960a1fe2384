"""Top-down planetary test (exp/test_cases/top_down_test): Held-Suarez core
with exoplanet-style diurnal equilibrium temperature (hs_forcing
equilibrium_t_option='exoplanet') and varied obliquity via astronomy."""
import dataclasses

from common import parse_args, run

from isca_tpu.dycore.primitive import PrimitiveConfig
from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel
from isca_tpu.physics.hs_forcing import HSForcingConfig

args = parse_args()
core = PrimitiveConfig(resolution=args.resolution, num_levels=args.levels,
                       dt=600.0)
model = HeldSuarezModel(HeldSuarezConfig(
    core=core, forcing=HSForcingConfig(equilibrium_t_option="exoplanet")))
run("top_down", model, args)
