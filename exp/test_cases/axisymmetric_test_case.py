"""Axisymmetric (zonally symmetric) moist model (exp/test_cases/
axisymmetric): make_symmetric=True zeroes all m>0 spectral modes."""
import dataclasses

from common import parse_args, run

from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel

args = parse_args()
cfg = GreyMoistConfig()
cfg = dataclasses.replace(cfg, core=dataclasses.replace(
    cfg.core, resolution=args.resolution, num_levels=args.levels,
    make_symmetric=True))
model = GreyMoistModel(cfg)
run("axisymmetric", model, args)
