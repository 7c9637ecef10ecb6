"""Normalization primitives, boundary modes, point samplers, robust
asinh preview."""

import numpy as np
import jax.numpy as jnp
import pytest

from astroburst_tpu.imaging.normalize import robust_asinh_preview
from astroburst_tpu.ops.boundary import (bicubic_sample, bilinear_sample,
                                         clamp_index, nearest_sample,
                                         reflect_index, wrap_index)
from astroburst_tpu.ops.normalization import (compute_mean_sigma,
                                              compute_snr,
                                              min_max_normalize,
                                              unit_energy_normalize,
                                              z_score_normalize)


def test_min_max_basic():
    out = np.asarray(min_max_normalize(jnp.asarray([1.0, 2, 3, 4, 5])))
    assert out[0] == pytest.approx(0.0, abs=1e-7)
    assert out[-1] == pytest.approx(1.0, abs=1e-7)
    assert out[2] == pytest.approx(0.5, abs=1e-7)


def test_min_max_constant_is_zero():
    out = np.asarray(min_max_normalize(jnp.full(10, 5.0)))
    np.testing.assert_allclose(out, 0.0)


def test_z_score(rng):
    x = rng.normal(10, 3, 10000).astype(np.float32)
    out = np.asarray(z_score_normalize(jnp.asarray(x)))
    assert out.mean() == pytest.approx(0.0, abs=1e-3)
    assert out.std() == pytest.approx(1.0, abs=1e-2)


def test_unit_energy():
    out = np.asarray(unit_energy_normalize(jnp.asarray([3.0, 4.0])))
    np.testing.assert_allclose(out, [0.6, 0.8], rtol=1e-6)


def test_mean_sigma_and_snr(rng):
    x = rng.normal(5, 2, 5000).astype(np.float32)
    mean, sigma = compute_mean_sigma(jnp.asarray(x))
    assert float(mean) == pytest.approx(5.0, abs=0.2)
    assert float(sigma) == pytest.approx(2.0, abs=0.2)
    assert float(compute_snr(jnp.float32(25.0), mean, sigma)) == \
        pytest.approx((25.0 - float(mean)) / float(sigma), rel=1e-5)
    assert float(compute_snr(jnp.float32(5.0), jnp.float32(1.0),
                             jnp.float32(0.0))) == 0.0


def test_boundary_modes():
    idx = jnp.asarray([-2, -1, 0, 5, 9, 10, 11])
    np.testing.assert_array_equal(np.asarray(clamp_index(idx, 10)),
                                  [0, 0, 0, 5, 9, 9, 9])
    np.testing.assert_array_equal(np.asarray(wrap_index(idx, 10)),
                                  [8, 9, 0, 5, 9, 0, 1])
    np.testing.assert_array_equal(np.asarray(reflect_index(idx, 10)),
                                  [2, 1, 0, 5, 9, 8, 7])


def test_point_samplers(rng):
    img = jnp.asarray(np.arange(100, dtype=np.float32).reshape(10, 10))
    assert float(nearest_sample(img, jnp.asarray([0.0]),
                                jnp.asarray([0.6]))[0]) == 1.0
    assert float(bilinear_sample(img, jnp.asarray([0.0]),
                                 jnp.asarray([0.5]))[0]) == pytest.approx(0.5)
    # bicubic on integer coords reproduces the pixel (sampling.rs test)
    assert float(bicubic_sample(img, jnp.asarray([3.0]),
                                jnp.asarray([4.0]))[0]) == pytest.approx(
        34.0, abs=1e-3)
    # constant image invariant
    const = jnp.full((8, 8), 42.0)
    assert float(bicubic_sample(const, jnp.asarray([3.5]),
                                jnp.asarray([4.7]))[0]) == pytest.approx(
        42.0, abs=1e-3)


@pytest.mark.slow
def test_robust_asinh_preview(rng):
    x = (rng.random((64, 64)) * 0.01 + 0.001).astype(np.float32)
    x[0, :] = 0.0      # padding
    x[1, 0] = np.nan
    out = np.asarray(robust_asinh_preview(jnp.asarray(x)))
    assert (out[0] == 0).all()
    assert out[1, 0] == 0.0
    assert np.isfinite(out).all()
    # monotone in the valid interior
    a = float(robust_asinh_preview(jnp.asarray(x))[32, 32])
    assert np.isfinite(a)
