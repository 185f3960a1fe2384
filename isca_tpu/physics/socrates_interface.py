"""SOCRATES radiative-transfer interface (re-export of the real scheme).

Reference: src/atmos_param/socrates/interface/*.F90 (3,307 LoC adapter around
the UK Met Office SOCRATES radiance core).  The reference does NOT vendor the
core: the source tree must be supplied externally and symlinked at compile
time via $GFDL_SOC (codebase.py:315-344); without it the build uses
-DSOC_NO_COMPILE and calling the scheme is a fatal error
(idealized_moist_phys.F90:1193 seam).

This framework goes further than the seam: `physics/socrates.py` implements
a spectral-file-driven correlated-k two-stream solver natively (Met Office
spectral-file reader, ESFT gas optics with equivalent-extinction overlap,
PIFM SW + linear-in-tau LW, Slingo cloud parametrizations), with built-in
synthetic ga7-like spectra so the scheme runs without downloaded files.
This module keeps the historical import location:

    from isca_tpu.physics.socrates_interface import SocratesConfig, SocratesRadiation
"""

from isca_tpu.physics.socrates import SocratesConfig, SocratesRadiation

__all__ = ["SocratesConfig", "SocratesRadiation"]
