"""Barotropic vorticity model on spherical harmonics (dynamical baseline).

Capability parity with the reference's ``DLWP/barotropic/`` baseline (pyspharm
/ SPHEREPACK Fortran underneath — SURVEY.md §2 row 19), rebuilt on the JAX
spherical-harmonic transform: the full integration is a ``lax.scan`` of RK4
steps, jittable end-to-end on TPU and differentiable.

Equation: d(zeta)/dt = -V . grad(zeta + f) - nu * (-lap)^k zeta,
with psi = lap^{-1} zeta, u = -(1/a) dpsi/dphi, v = (1/(a cos)) dpsi/dlambda,
advection evaluated pseudo-spectrally (transform method).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp
from jax import lax

from dlwp_cs_tpu.barotropic.spharm import SphericalHarmonics

__all__ = ["BarotropicModel"]

_OMEGA = 7.292e-5  # Earth rotation rate, 1/s


@dataclass
class BarotropicModel:
    """T{lmax} barotropic vorticity model.

    Attributes:
      sht: the transform/grid object.
      dt: time step in seconds.
      hyperdiffusion_order: k in (-lap)^k (2 = del^4).
      hyperdiffusion_time: e-folding time (s) of the smallest resolved scale.
    """

    sht: SphericalHarmonics
    dt: float = 1800.0
    hyperdiffusion_order: int = 2
    hyperdiffusion_time: float = 6 * 3600.0

    def __post_init__(self):
        s = self.sht
        eig = np.abs(s.laplacian_eig)  # per-l positive eigenvalues
        lmax_eig = eig[-1]
        k = self.hyperdiffusion_order
        self._damp = (eig / lmax_eig) ** k / self.hyperdiffusion_time  # (L+1,)
        coslat = np.sqrt(1.0 - s.sinlat**2)
        # planetary vorticity enters the tendency through the beta term only
        self._beta_y = 2.0 * _OMEGA * coslat[:, None] / s.radius

    def tendency(self, zeta_spec):
        """d(zeta_spec)/dt for spectral relative vorticity."""
        s = self.sht
        psi = s.inverse_laplacian(zeta_spec)
        _, dpsi_x, dpsi_y = s.cos_lat_grad(psi)
        u, v = -dpsi_y, dpsi_x
        zeta, dz_x, dz_y = s.cos_lat_grad(zeta_spec)
        adv = u * dz_x + v * (dz_y + jnp.asarray(self._beta_y, zeta.dtype))
        tend = -s.grid_to_spec(adv)
        return tend - zeta_spec * jnp.asarray(self._damp, jnp.float32)

    def step(self, zeta_spec):
        """One RK4 step."""
        dt = self.dt
        k1 = self.tendency(zeta_spec)
        k2 = self.tendency(zeta_spec + 0.5 * dt * k1)
        k3 = self.tendency(zeta_spec + 0.5 * dt * k2)
        k4 = self.tendency(zeta_spec + dt * k3)
        return zeta_spec + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    def integrate(self, zeta0_grid, n_steps: int, *, save_every: int = 1):
        """Integrate from a grid vorticity field; returns grid snapshots.

        ``(nlat, nlon)`` -> ``(n_saves, nlat, nlon)`` (jittable; one scan).
        """
        s = self.sht
        z0 = s.grid_to_spec(jnp.asarray(zeta0_grid))

        def inner(z, _):
            z = self.step(z)
            return z, None

        def outer(z, _):
            z, _ = lax.scan(inner, z, None, length=save_every)
            return z, s.spec_to_grid(z)

        if save_every < 1:
            raise ValueError(f"save_every must be >= 1, got {save_every}")
        if n_steps % save_every:
            raise ValueError(
                f"n_steps={n_steps} not divisible by save_every={save_every} "
                f"— the trailing {n_steps % save_every} steps would be "
                "silently dropped"
            )
        n_saves = n_steps // save_every
        _, snaps = lax.scan(outer, z0, None, length=n_saves)
        return snaps

    # -- helpers -----------------------------------------------------------
    def solid_body_vorticity(self, u0: float = 15.0):
        """Grid relative vorticity of solid-body zonal flow u = u0*cos(lat)."""
        s = self.sht
        return 2.0 * u0 * s.sinlat[:, None] / s.radius * np.ones((1, s.nlon))

    def rossby_haurwitz_vorticity(self, m: int = 4, amp: float = 8e-6):
        """Classic Rossby-Haurwitz-like initial relative vorticity."""
        s = self.sht
        lat = s.lats[:, None]
        lon = s.lons[None, :]
        return amp * np.cos(lat) ** m * np.sin(m * lon) * np.sin(lat) + (
            self.solid_body_vorticity(15.0)
        )
