"""Barotropic vorticity baseline on JAX spherical harmonics."""

from dlwp_cs_tpu.barotropic.model import BarotropicModel
from dlwp_cs_tpu.barotropic.spharm import SphericalHarmonics

__all__ = ["BarotropicModel", "SphericalHarmonics"]
