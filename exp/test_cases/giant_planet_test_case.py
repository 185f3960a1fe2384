"""Giant planet (exp/test_cases/giant_planet, Schneider & Liu 2009):
Jupiter constants via constants_nml-equivalent Constants replace; the
reference runs T213L40 (reduced by default here)."""
from common import parse_args, run

from isca_tpu.models.giant import giant_planet_model

args = parse_args()
model = giant_planet_model(resolution=args.resolution,
                           num_levels=max(args.levels, 30), dt=900.0)
run("giant_planet", model, args)
