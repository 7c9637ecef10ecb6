"""Shear-decomposed warp parity vs the two-pass and exact samplers.

Reference semantics: affine.rs:663-690 (per-pixel bicubic with
clamp_index taps, outside -> 0).
"""

import math

import numpy as np
import pytest

from astroburst_tpu.alignment.affine import (AffineTransform, _warp_kernel,
                                             _warp_two_pass_kernel,
                                             warp_image)
from astroburst_tpu.alignment.warp_shear import warp_shear

import jax.numpy as jnp


def star_img(shape=(96, 80), seed=5):
    rng = np.random.default_rng(seed)
    img = rng.normal(100.0, 3.0, shape)
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float64)
    for _ in range(12):
        y, x = rng.random(2) * (np.array(shape) - 20) + 10
        img += (200 + rng.random() * 500) * np.exp(
            -((yy - y) ** 2 + (xx - x) ** 2) / 4.0)
    return img.astype(np.float32)


def rot_about_center(deg, cx, cy, scale=1.0):
    th = math.radians(deg)
    ct, st = math.cos(th) * scale, math.sin(th) * scale
    return AffineTransform(a=ct, b=-st, tx=cx - ct * cx + st * cy,
                           c=st, d=ct, ty=cy - st * cx - ct * cy)


def two_pass(img, t, r, c):
    params = jnp.asarray(t.as_tuple(), jnp.float32)
    return np.asarray(_warp_two_pass_kernel(jnp.asarray(img), params, r, c))


def exact(img, t, r, c):
    params = jnp.asarray(t.as_tuple(), jnp.float32)
    return np.asarray(_warp_kernel(jnp.asarray(img), params, r, c))


CASES = [
    ("identity", AffineTransform.identity()),
    ("translate", AffineTransform(tx=3.25, ty=-2.5)),
    ("rot2", rot_about_center(2.0, 40.0, 48.0)),
    ("rot-7", rot_about_center(-7.0, 40.0, 48.0)),
    ("rot25", rot_about_center(25.0, 40.0, 48.0)),
    ("scale0.8", AffineTransform(a=0.8, d=0.8, tx=5.0, ty=3.0)),
    ("scale1.35", AffineTransform(a=1.35, d=1.35, tx=-4.0, ty=2.0)),
    ("full", AffineTransform(a=1.02, b=-0.05, tx=4.5, c=0.04, d=0.97,
                             ty=-3.25)),
    ("rot+scale", rot_about_center(4.0, 40.0, 48.0, scale=1.2)),
]


@pytest.mark.parametrize("name,t", CASES, ids=[c[0] for c in CASES])
def test_matches_two_pass(name, t):
    img = star_img()
    h, w = img.shape
    got = np.asarray(warp_shear(jnp.asarray(img), t, h, w))
    want = two_pass(img, t, h, w)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5)


@pytest.mark.parametrize("name,t", CASES[:4], ids=[c[0] for c in CASES[:4]])
def test_near_exact_sampler_interior(name, t):
    """Separable vs direct 2D sampling differ only by the rotation
    cross-term commutation; small rotations stay close in the interior."""
    img = star_img(seed=7)
    h, w = img.shape
    got = np.asarray(warp_shear(jnp.asarray(img), t, h, w))
    want = exact(img, t, h, w)
    scale = np.max(np.abs(want)) + 1.0
    assert np.max(np.abs(got - want)[4:-4, 4:-4]) / scale < 2e-2


def test_nonsquare_output():
    img = star_img((64, 64))
    t = rot_about_center(3.0, 32.0, 32.0)
    got = np.asarray(warp_shear(jnp.asarray(img), t, 48, 96))
    want = two_pass(img, t, 48, 96)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5)


def test_edge_clamp_matches_reference_taps():
    """Pixels whose taps overhang the border must use edge replication
    (sampling.rs clamp_index), not wraparound or zeros."""
    img = star_img((40, 40), seed=3)
    t = AffineTransform(tx=0.5, ty=0.5)
    got = np.asarray(warp_shear(jnp.asarray(img), t, 40, 40))
    want = exact(img, t, 40, 40)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5)


def test_outside_is_zero():
    img = star_img((40, 40), seed=4)
    t = AffineTransform(tx=30.0, ty=0.0)
    got = np.asarray(warp_shear(jnp.asarray(img), t, 40, 40))
    assert np.all(got[:, 12:] == 0.0)
    want = two_pass(img, t, 40, 40)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5)


def test_warp_image_dispatches_to_shear():
    img = star_img((48, 48), seed=8)
    t = rot_about_center(1.5, 24.0, 24.0)
    via_api = np.asarray(warp_image(img, t, 48, 48))
    direct = np.asarray(warp_shear(jnp.asarray(img), t, 48, 48))
    np.testing.assert_allclose(via_api, direct, atol=1e-6)


def test_degenerate_a_falls_back():
    img = star_img((32, 32), seed=9)
    t = AffineTransform(a=90.0, b=-1.0, tx=16.0, c=1.0, d=0.0, ty=0.0)
    with pytest.raises(ValueError):
        warp_shear(jnp.asarray(img), AffineTransform(a=1e-5), 32, 32)
    out = warp_image(img, t, 32, 32)  # falls back, no raise
    assert np.asarray(out).shape == (32, 32)


def test_bucket_powers_of_two():
    from astroburst_tpu.alignment.warp_shear import _bucket
    assert _bucket(1) == 8 and _bucket(8) == 8
    assert _bucket(9) == 16 and _bucket(100) == 128


def test_span_guard_raises():
    img = star_img((32, 4200))
    # q·W > 4096 → outside the shear envelope
    t = AffineTransform(a=1.0, b=0.0, tx=0.0, c=0.999, d=1.0, ty=0.0)
    with pytest.raises(ValueError, match="span"):
        warp_shear(jnp.asarray(img), t, 32, 4200)


def test_rotation_near_envelope_limit():
    """MAX_ROTATION_DEG=30 is the sanity-gate ceiling; the shear form
    must stay correct there."""
    img = star_img((80, 80), seed=12)
    t = rot_about_center(29.0, 40.0, 40.0)
    got = np.asarray(warp_shear(jnp.asarray(img), t, 80, 80))
    want = two_pass(img, t, 80, 80)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5)


def test_nan_footprint_matches_two_pass():
    """NaN pixels must bleed exactly the reference's 4-tap footprint —
    the shear form's 5-tap union window must not widen it
    (0·NaN = NaN on the branch-excluded tap)."""
    img = star_img((64, 64), seed=13)
    img[30:32, 40:42] = np.nan
    t = rot_about_center(2.0, 32.0, 32.0)
    g = np.asarray(warp_shear(jnp.asarray(img), t, 64, 64))
    w2 = two_pass(img, t, 64, 64)
    assert (np.isnan(g) == np.isnan(w2)).all()
    m = ~np.isnan(g)
    np.testing.assert_allclose(g[m], w2[m], atol=2e-3, rtol=1e-5)
