"""Barotropic baseline tests: SHT correctness + dynamics sanity."""

import numpy as np
import pytest

import jax.numpy as jnp

from dlwp_cs_tpu.barotropic import BarotropicModel, SphericalHarmonics


@pytest.fixture(scope="module")
def sht():
    return SphericalHarmonics(21)  # T21


class TestSphericalHarmonics:
    def test_roundtrip_bandlimited(self, sht):
        # A band-limited field must round-trip exactly (up to float32).
        rng = np.random.default_rng(0)
        spec = np.zeros((sht.lmax + 1, sht.lmax + 1), np.complex64)
        for m in range(5):
            for l in range(m, 8):
                spec[m, l] = rng.normal() + 1j * rng.normal() * (m > 0)
        spec[0] = spec[0].real  # m=0 coefficients of a real field are real
        f = sht.spec_to_grid(jnp.asarray(spec))
        back = sht.grid_to_spec(f)
        mask = np.zeros_like(spec, bool)
        for m in range(sht.lmax + 1):
            mask[m, m:] = True
        np.testing.assert_allclose(
            np.asarray(back)[mask], spec[mask], atol=2e-5
        )

    def test_x64_roundtrip_precision(self):
        """Round 5: device tables are materialized per dtype from the f64
        originals — a float64 round-trip under x64 must reach ~1e-12, not
        the ~1e-7 floor of init-time-frozen f32 tables."""
        import jax

        with jax.enable_x64(True):
            sht = SphericalHarmonics(15)
            rng = np.random.default_rng(1)
            spec = np.zeros((16, 16), np.complex128)
            for m in range(4):
                for l in range(m, 7):
                    spec[m, l] = rng.normal() + 1j * rng.normal() * (m > 0)
            spec[0] = spec[0].real
            f = sht.spec_to_grid(jnp.asarray(spec))
            assert f.dtype == jnp.float64
            back = sht.grid_to_spec(f)
            mask = np.zeros_like(spec, bool)
            for m in range(16):
                mask[m, m:] = True
            np.testing.assert_allclose(
                np.asarray(back)[mask], spec[mask], atol=1e-12
            )

    def test_constant_field(self, sht):
        f = jnp.full((sht.nlat, sht.nlon), 3.0)
        spec = sht.grid_to_spec(f)
        # only the (0,0) coefficient is populated
        s = np.array(spec)
        assert abs(s[0, 0] - 3.0 * np.sqrt(4 * np.pi)) < 1e-4
        s[0, 0] = 0
        assert np.abs(s).max() < 1e-4
        back = sht.spec_to_grid(spec)
        np.testing.assert_allclose(np.asarray(back), 3.0, atol=1e-5)

    def test_laplacian_eigenfunction(self, sht):
        # lap Y_lm = -l(l+1)/a^2 Y_lm
        spec = np.zeros((sht.lmax + 1, sht.lmax + 1), np.complex64)
        spec[2, 3] = 1.0 + 0.5j
        f = sht.spec_to_grid(jnp.asarray(spec))
        lap = sht.spec_to_grid(sht.laplacian(jnp.asarray(spec)))
        expect = sht.laplacian_eig[3] * np.asarray(f)
        np.testing.assert_allclose(np.asarray(lap), expect, rtol=1e-4, atol=1e-18)

    def test_inverse_laplacian(self, sht):
        spec = np.zeros((sht.lmax + 1, sht.lmax + 1), np.complex64)
        spec[1, 2] = 2.0
        out = sht.laplacian(sht.inverse_laplacian(jnp.asarray(spec)))
        np.testing.assert_allclose(np.asarray(out), spec, rtol=1e-5)

    def test_zonal_derivative(self, sht):
        spec = np.zeros((sht.lmax + 1, sht.lmax + 1), np.complex64)
        spec[3, 4] = 1.0
        f = sht.spec_to_grid(jnp.asarray(spec))
        dfl = sht.spec_to_grid(sht.ddlon(jnp.asarray(spec)))
        # numerical check vs FFT derivative of the grid field
        k = np.fft.rfftfreq(sht.nlon, 1.0 / sht.nlon)
        ref = np.fft.irfft(np.fft.rfft(np.asarray(f), axis=-1) * 1j * k, axis=-1)
        np.testing.assert_allclose(np.asarray(dfl), ref, atol=1e-4)


class TestBarotropicModel:
    def test_solid_body_rotation_is_steady(self):
        sht = SphericalHarmonics(21)
        model = BarotropicModel(sht, dt=1800.0, hyperdiffusion_time=1e12)
        z0 = model.solid_body_vorticity(15.0)
        tend = model.tendency(sht.grid_to_spec(jnp.asarray(z0)))
        tend_grid = np.asarray(sht.spec_to_grid(tend))
        # steady state: tendency negligible vs advective scale U*zeta/a
        scale = 15.0 * np.abs(z0).max() / sht.radius
        assert np.abs(tend_grid).max() < 20 * scale * 1e-2

    def test_integration_stable_and_conservative(self):
        sht = SphericalHarmonics(21)
        model = BarotropicModel(sht, dt=1800.0)
        z0 = model.rossby_haurwitz_vorticity()
        snaps = model.integrate(jnp.asarray(z0, jnp.float32), 48, save_every=12)
        out = np.asarray(snaps)
        assert out.shape == (4, sht.nlat, sht.nlon)
        assert np.isfinite(out).all()
        # amplitude bounded (no blow-up) and pattern still correlated with t0
        assert np.abs(out[-1]).max() < 5 * np.abs(z0).max()
        c = np.corrcoef(out[-1].ravel(), np.asarray(z0).ravel())[0, 1]
        assert c > 0.5
