"""Frierson grey-radiation moist aquaplanet (exp/test_cases/frierson,
Frierson et al. 2006): T42L25 dt=720s, SBM convection, grey radiation,
slab ocean."""
from common import parse_args, run

from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel

args = parse_args()
model = GreyMoistModel(GreyMoistConfig())
run("frierson_aquaplanet", model, args)
