"""Spherical harmonic transforms in JAX (triangular truncation).

Capability parity with the reference's pyspharm/SPHEREPACK (Fortran)
dependency used by its barotropic baseline (``DLWP/barotropic/`` —
SURVEY.md §2 row 19).  TPU-first design: longitude is an FFT, and the
Legendre transform is a batched matmul against precomputed associated
Legendre tables — both MXU/XLA-friendly, jittable and differentiable.

Grid: Gaussian latitudes (exact quadrature for triangular truncation),
uniform longitudes.  Spectral layout: complex coefficients ``[m, l]`` on a
``(M+1, L+1)`` array with entries zero for ``l < m`` (triangular T{L}).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["SphericalHarmonics"]

_EARTH_RADIUS = 6.371e6


def _gauss_legendre(n: int):
    """Gaussian nodes (sin lat) and weights on [-1, 1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x, w


class SphericalHarmonics:
    """Forward/inverse SHT on a Gaussian grid, truncation T{lmax}.

    ``grid_to_spec(f)``: ``(..., nlat, nlon)`` real -> ``(..., M+1, L+1)``
    complex; ``spec_to_grid`` inverts.  Also provides Laplacian/inverse
    Laplacian eigenvalue arrays and gradient operators used by the
    barotropic model.
    """

    def __init__(self, lmax: int, *, nlat: int | None = None, nlon: int | None = None,
                 radius: float = _EARTH_RADIUS):
        self.lmax = int(lmax)
        self.nlat = nlat or (lmax + 1) * 3 // 2 + 1
        self.nlon = nlon or 2 * self.nlat
        self.radius = float(radius)
        if self.nlon <= 2 * self.lmax:
            # at nlon == 2*lmax the m = lmax mode lands in the rfft Nyquist
            # bin, whose single-real-coefficient convention breaks the
            # half-complex doubling this transform assumes — round-trips
            # would silently corrupt every l at m = lmax
            raise ValueError(
                f"nlon={self.nlon} must exceed 2*lmax={2 * self.lmax} "
                "(Nyquist aliasing of the highest zonal mode)"
            )
        x, w = _gauss_legendre(self.nlat)
        # ascending latitude
        order = np.argsort(x)
        self.sinlat = x[order]
        self.weights = w[order]
        self.lats = np.arcsin(self.sinlat)
        self.lons = np.arange(self.nlon) * 2 * np.pi / self.nlon
        self._plm = self._build_legendre()  # (M+1, L+1, nlat) float64
        l = np.arange(self.lmax + 1)
        self.laplacian_eig = -l * (l + 1) / self.radius**2  # per l
        # device tables are materialized lazily PER REAL DTYPE from the
        # float64 originals: freezing them to f32 at init capped x64
        # round-trips at ~1e-7 (truncated-then-upcast) even though the
        # full-precision table was sitting in memory
        self._tables: dict = {}

    def _tables_for(self, real_dtype):
        """(plm, w) device tables cast from float64 to ``real_dtype``."""
        dt = jnp.dtype(real_dtype)
        if dt not in self._tables:
            self._tables[dt] = (
                jnp.asarray(self._plm, dt),
                jnp.asarray(self.weights, dt),
            )
        return self._tables[dt]

    # -- tables ------------------------------------------------------------
    def _build_legendre(self) -> np.ndarray:
        lmax, x = self.lmax, self.sinlat
        nlat = len(x)
        p = np.zeros((lmax + 1, lmax + 1, nlat))
        sx = np.sqrt(np.maximum(0.0, 1.0 - x * x))
        pmm = np.full(nlat, 1.0 / np.sqrt(4.0 * np.pi))
        p[0, 0] = pmm
        for m in range(1, lmax + 1):
            pmm = -np.sqrt((2.0 * m + 1.0) / (2.0 * m)) * sx * pmm
            p[m, m] = pmm
        for m in range(lmax + 1):
            if m + 1 <= lmax:
                p[m, m + 1] = np.sqrt(2.0 * m + 3.0) * x * p[m, m]
            for l in range(m + 2, lmax + 1):
                a = np.sqrt((4.0 * l**2 - 1.0) / (l**2 - m**2))
                b = np.sqrt(
                    ((l - 1.0) ** 2 - m**2) / (4.0 * (l - 1.0) ** 2 - 1.0)
                )
                p[m, l] = a * (x * p[m, l - 1] - b * p[m, l - 2])
        return p

    # -- transforms --------------------------------------------------------
    def grid_to_spec(self, f):
        """Real field(s) ``(..., nlat, nlon)`` -> complex ``(..., M+1, L+1)``."""
        fm = jnp.fft.rfft(f, axis=-1)[..., : self.lmax + 1]  # (..., nlat, M+1)
        fm = jnp.swapaxes(fm, -1, -2)  # (..., M+1, nlat)
        # quadrature: sum_j f_m(x_j) P_l^m(x_j) w_j
        plm, w = self._tables_for(jnp.zeros((), fm.dtype).real.dtype)
        integrand = fm * w
        spec = jnp.einsum("...mj,mlj->...ml", integrand, plm)
        return spec * (2.0 * jnp.pi / self.nlon)

    def spec_to_grid(self, spec):
        """Complex ``(..., M+1, L+1)`` -> real ``(..., nlat, nlon)``."""
        plm, _ = self._tables_for(jnp.zeros((), spec.dtype).real.dtype)
        fm = jnp.einsum("...ml,mlj->...mj", spec, plm)  # (..., M+1, nlat)
        fm = jnp.swapaxes(fm, -1, -2)  # (..., nlat, M+1)
        full = jnp.zeros(
            fm.shape[:-1] + (self.nlon // 2 + 1,), dtype=fm.dtype
        ).at[..., : self.lmax + 1].set(fm)
        return jnp.fft.irfft(full, n=self.nlon, axis=-1) * self.nlon

    # -- differential operators (spectral) ---------------------------------
    def laplacian(self, spec):
        return spec * jnp.asarray(self.laplacian_eig, spec.dtype)

    def inverse_laplacian(self, spec):
        eig = np.where(self.laplacian_eig == 0, 1.0, self.laplacian_eig)
        out = spec / jnp.asarray(eig, spec.dtype)
        return out.at[..., 0].set(0.0)

    def ddlon(self, spec):
        """d/dlon in spectral space: multiply by i*m."""
        m = jnp.arange(self.lmax + 1, dtype=jnp.float32)[:, None]
        return spec * (1j * m.astype(spec.dtype))

    def cos_lat_grad(self, spec):
        """(u, v)-style gradient components on the grid:
        returns (df/dlon / (a cos), df/dlat-ish via FD of the grid field).

        Longitude derivative is exact (spectral); the latitude derivative is
        computed pseudo-spectrally by centered differences on the Gaussian
        grid (adequate for the baseline's Jacobian; fully spectral
        derivative tables are a refinement).
        """
        f = self.spec_to_grid(spec)
        dflon = self.spec_to_grid(self.ddlon(spec))
        coslat = jnp.asarray(
            np.sqrt(1.0 - self.sinlat**2), f.dtype
        )[..., :, None]
        dx = dflon / (self.radius * coslat)
        lat = jnp.asarray(self.lats, f.dtype)
        dlat = jnp.gradient(f, axis=-2) / jnp.gradient(lat)[:, None]
        dy = dlat / self.radius
        return f, dx, dy
