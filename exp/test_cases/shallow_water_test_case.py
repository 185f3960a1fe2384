"""Stirred spectral shallow-water model (exp/test_cases/shallow_water)."""
from common import default_diag, parse_args, run

from isca_tpu.models.shallow import ShallowConfig, ShallowModel

args = parse_args(default_resolution="T85")
model = ShallowModel(ShallowConfig(resolution=args.resolution, dt=1200.0))
run("shallow_water", model, args,
    diag=default_diag(fields=("ucomp", "vcomp", "vor", "h")))
