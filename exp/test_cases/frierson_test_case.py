"""Frierson grey-radiation moist aquaplanet (Frierson et al. 2006 JAS;
reference: exp/test_cases/frierson/frierson_test_case.py): T42L25 dt=720s,
SBM convection (rhbm 0.7), Frierson grey radiation with atm_abs 0.2, 2.5 m
slab ocean with albedo 0.31, Frierson's own sigma ladder, upper sponge."""
from common import parse_args, run

from isca_tpu.models.moist import GreyMoistModel, frierson_test_case_config

args = parse_args()
model = GreyMoistModel(frierson_test_case_config())
run("frierson_aquaplanet", model, args)
