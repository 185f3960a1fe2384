"""Stirred barotropic vorticity equation (exp/test_cases/
barotropic_vorticity_equation, Vallis et al. 2004 stirring)."""
from common import default_diag, parse_args, run

from isca_tpu.models.barotropic import BarotropicConfig, BarotropicModel

args = parse_args(default_resolution="T85")
model = BarotropicModel(BarotropicConfig(
    resolution=args.resolution, dt=1200.0, initial_zonal_wind="zero",
    stirring_amplitude=3.0e-11, damping_order=2, damping_coeff_r=1.929e-6))
run("barotropic_stirring", model, args,
    diag=default_diag(fields=("ucomp", "vcomp", "vor")))
