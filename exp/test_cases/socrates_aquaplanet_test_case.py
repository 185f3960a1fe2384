"""SOCRATES aquaplanet (exp/test_cases/socrates_test/socrates_aquaplanet.py):
T42L25-style moist aquaplanet with the full SOCRATES correlated-k radiation
(native spectral-file solver; synthetic ga7-like spectra by default, or point
`sw/lw_spectral_filename` at downloaded Met Office files). Pass --clouds for
the socrates_aquaplanet_with_cloud variant (SimCloud feeds set_cld)."""
import dataclasses
import sys

from common import parse_args, run

from isca_tpu.models.moist import GreyMoistConfig, GreyMoistModel
from isca_tpu.physics.socrates import SocratesConfig

with_clouds = "--clouds" in sys.argv
if with_clouds:
    sys.argv.remove("--clouds")
args = parse_args()
cfg = GreyMoistConfig()
cfg = dataclasses.replace(cfg, physics=dataclasses.replace(
    cfg.physics,
    radiation_scheme="socrates",
    socrates=SocratesConfig(stellar_constant=1370.0, co2_ppmv=300.0),
    do_cloud_simple=with_clouds,
))
model = GreyMoistModel(cfg)
run("socrates_aquaplanet" + ("_with_cloud" if with_clouds else ""),
    model, args)
