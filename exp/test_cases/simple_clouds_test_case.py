"""SimCloud diagnostic clouds + RRTM (exp/test_cases/simple_clouds):
RH-based large-scale cloud fraction + marine stratocumulus feeding the
RRTMG cloud optics."""
import dataclasses

from common import parse_args, run

from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
from isca_tpu.physics.rrtm_radiation import RRTMConfig

args = parse_args()
cfg = GreyMoistConfig()
cfg = dataclasses.replace(cfg, physics=dataclasses.replace(
    cfg.physics, radiation_scheme="rrtm", rrtm=RRTMConfig(),
    do_cloud_simple=True))
model = GreyMoistModel(cfg)
run("simple_clouds", model, args)
