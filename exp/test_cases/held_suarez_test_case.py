"""Held-Suarez dry dynamical core (exp/test_cases/held_suarez, Held &
Suarez 1994): T42L25 dt=600s, HS Newtonian relaxation + Rayleigh friction."""
from common import parse_args, run

from isca_tpu.dycore.primitive import PrimitiveConfig
from isca_tpu.models.dry import HeldSuarezConfig, HeldSuarezModel

args = parse_args()
core = PrimitiveConfig(resolution=args.resolution, num_levels=args.levels,
                       dt=600.0)
model = HeldSuarezModel(HeldSuarezConfig(core=core))
run("held_suarez_default", model, args)
