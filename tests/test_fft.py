"""Matmul FFT engine vs numpy.fft."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astroburst_tpu.ops import fft as F


@pytest.mark.parametrize("n", [8, 64, 256, 512, 1024, 4096])
def test_fft_1d_matches_numpy(n, rng):
    x = rng.random((4, n)).astype(np.float32)
    ref = np.fft.fft(x)
    fr, fi = jax.jit(F.fft)(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
    got = np.asarray(fr) + 1j * np.asarray(fi)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)


def test_fft_complex_input(rng):
    xr = rng.random((2, 128)).astype(np.float32)
    xi = rng.random((2, 128)).astype(np.float32)
    ref = np.fft.fft(xr + 1j * xi)
    fr, fi = jax.jit(F.fft)(jnp.asarray(xr), jnp.asarray(xi))
    got = np.asarray(fr) + 1j * np.asarray(fi)
    np.testing.assert_allclose(got, ref, atol=2e-5 * np.abs(ref).max())


@pytest.mark.parametrize("n", [64, 1024])
def test_ifft_roundtrip(n, rng):
    x = rng.random((3, n)).astype(np.float32)
    xr = jnp.asarray(x)
    xi = jnp.zeros_like(xr)
    fr, fi = F.fft(xr, xi)
    br, bi = F.ifft(fr, fi)
    np.testing.assert_allclose(np.asarray(br), x, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bi), 0.0, atol=1e-5)


def test_fft2_matches_numpy(rng):
    x = rng.random((64, 128)).astype(np.float32)
    ref = np.fft.fft2(x)
    fr, fi = jax.jit(F.fft2)(jnp.asarray(x), jnp.zeros((64, 128), jnp.float32))
    got = np.asarray(fr) + 1j * np.asarray(fi)
    np.testing.assert_allclose(got, ref, atol=3e-5 * np.abs(ref).max())


def test_ifft2_scaling(rng):
    x = rng.random((32, 32)).astype(np.float32)
    xr = jnp.asarray(x)
    z = jnp.zeros_like(xr)
    fr, fi = F.fft2(xr, z)
    br, _ = F.ifft2(fr, fi)
    np.testing.assert_allclose(np.asarray(br), x, atol=1e-5)


def test_cross_power_unit_magnitude(rng):
    ar = jnp.asarray(rng.random(64).astype(np.float32))
    ai = jnp.asarray(rng.random(64).astype(np.float32))
    br = jnp.asarray(rng.random(64).astype(np.float32))
    bi = jnp.asarray(rng.random(64).astype(np.float32))
    cr, ci = F.cross_power(ar, ai, br, bi)
    mag = np.asarray(cr) ** 2 + np.asarray(ci) ** 2
    np.testing.assert_allclose(mag, 1.0, atol=1e-4)


def test_find_peak():
    surf = np.zeros((16, 32), np.float32)
    surf[5, 20] = 3.0
    py, px, pv = F.find_peak(jnp.asarray(surf))
    assert (int(py), int(px)) == (5, 20)
    assert float(pv) == 3.0


def test_next_power_of_two():
    assert F.next_power_of_two(1) == 1
    assert F.next_power_of_two(512) == 512
    assert F.next_power_of_two(513) == 1024


def test_shifted_log_magnitude_centers_dc(rng):
    x = np.full((16, 16), 5.0, np.float32)
    fr, fi = F.fft2(jnp.asarray(x), jnp.zeros((16, 16), jnp.float32))
    out = np.asarray(F.shifted_log_magnitude(fr, fi))
    assert out.argmax() == 8 * 16 + 8  # DC moved to center
