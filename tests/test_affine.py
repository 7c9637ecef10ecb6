"""Star-based affine alignment tests (affine.rs:727-810 style)."""

import math

import numpy as np
import pytest

from astroburst_tpu.alignment.affine import (AffineTransform,
                                             align_channel_affine,
                                             build_triangles, fit_affine,
                                             fit_rigid, match_triangles,
                                             ransac_affine, warp_image)


def make_star_field(shape=(256, 256), n=40, seed=11, bg=50.0):
    rng = np.random.default_rng(seed)
    img = rng.normal(bg, 1.5, shape)
    pts = rng.random((n, 2)) * (np.array(shape[::-1]) - 40) + 20  # (x, y)
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float64)
    for x, y in pts:
        amp = 300 + rng.random() * 700
        img += amp * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * 1.6 ** 2))
    return img.astype(np.float32), pts


def apply_transform_to_image(img, t: AffineTransform):
    """Generate target = img warped by the INVERSE mapping so that
    target(T·p) = img(p) — stars move by T."""
    return np.asarray(warp_image(img, invert(t), img.shape[0], img.shape[1]))


def invert(t: AffineTransform) -> AffineTransform:
    det = t.a * t.d - t.b * t.c
    ia, ib, ic, id_ = t.d / det, -t.b / det, -t.c / det, t.a / det
    return AffineTransform(a=ia, b=ib, tx=-(ia * t.tx + ib * t.ty),
                           c=ic, d=id_, ty=-(ic * t.tx + id_ * t.ty))


def test_fit_affine_exact():
    t = AffineTransform(a=1.01, b=-0.02, tx=5.0, c=0.02, d=0.99, ty=-3.0)
    rng = np.random.default_rng(0)
    src = rng.random((10, 2)) * 200
    dst = np.stack([t.a * src[:, 0] + t.b * src[:, 1] + t.tx,
                    t.c * src[:, 0] + t.d * src[:, 1] + t.ty], axis=1)
    m = np.concatenate([src, dst], axis=1)
    got = fit_affine(m)
    for a, b in zip(got.as_tuple(), t.as_tuple()):
        assert a == pytest.approx(b, abs=1e-9)


def test_fit_rigid_recovers_rotation():
    theta = math.radians(5.0)
    ct, st = math.cos(theta), math.sin(theta)
    t = AffineTransform(a=ct, b=-st, tx=2.0, c=st, d=ct, ty=-1.0)
    rng = np.random.default_rng(1)
    src = rng.random((8, 2)) * 100
    dst = np.stack([t.a * src[:, 0] + t.b * src[:, 1] + t.tx,
                    t.c * src[:, 0] + t.d * src[:, 1] + t.ty], axis=1)
    got = fit_rigid(np.concatenate([src, dst], axis=1))
    assert got.rotation_deg() == pytest.approx(5.0, abs=1e-6)
    assert got.tx == pytest.approx(2.0, abs=1e-6)


def test_ransac_rejects_outliers():
    t = AffineTransform(tx=4.0, ty=-2.0)
    rng = np.random.default_rng(2)
    src = rng.random((30, 2)) * 300
    dst = src + np.array([4.0, -2.0])
    dst[:6] += rng.random((6, 2)) * 80 + 20  # 20% outliers
    matches = [tuple(r) + tuple(d) for r, d in zip(src, dst)]
    res = ransac_affine(matches, "affine")
    assert res is not None
    assert res.inliers >= 24
    assert res.transform.tx == pytest.approx(4.0, abs=0.1)
    assert res.transform.ty == pytest.approx(-2.0, abs=0.1)


def test_triangle_matching_finds_correspondences():
    rng = np.random.default_rng(3)
    ref = rng.random((30, 2)) * 400 + 20
    shift = np.array([7.0, -4.0])
    tgt = ref + shift
    ref_tris = build_triangles(ref)
    tgt_tris = build_triangles(tgt)
    matches = match_triangles(ref, tgt, ref_tris, tgt_tris)
    assert len(matches) >= 20
    m = np.asarray(matches)
    np.testing.assert_allclose(m[:, 2] - m[:, 0], 7.0, atol=1e-5)
    np.testing.assert_allclose(m[:, 3] - m[:, 1], -4.0, atol=1e-5)


def test_warp_identity():
    img, _ = make_star_field((64, 64), n=5)
    out = np.asarray(warp_image(img, AffineTransform.identity(), 64, 64))
    np.testing.assert_allclose(out[2:-2, 2:-2], img[2:-2, 2:-2], atol=1e-4)


def test_warp_translation():
    img, _ = make_star_field((64, 64), n=5)
    out = np.asarray(warp_image(img, AffineTransform.translation(3.0, 2.0),
                                64, 64))
    np.testing.assert_allclose(out[5:-5, 5:-5], img[7:-3, 8:-2], atol=1e-3)


def test_align_channel_affine_recovers_translation():
    img, _ = make_star_field((256, 256), n=35)
    target = apply_transform_to_image(img, AffineTransform(tx=6.0, ty=-8.0))
    res = align_channel_affine(img, target)
    assert res.method in ("affine", "rigid")
    assert res.transform.tx == pytest.approx(6.0, abs=0.3)
    assert res.transform.ty == pytest.approx(-8.0, abs=0.3)
    assert res.inliers >= 6


def test_align_channel_affine_recovers_rotation():
    theta = math.radians(2.0)
    ct, st = math.cos(theta), math.sin(theta)
    # rotate about image center
    cx = cy = 128.0
    t = AffineTransform(a=ct, b=-st, tx=cx - ct * cx + st * cy,
                        c=st, d=ct, ty=cy - st * cx - ct * cy)
    img, _ = make_star_field((256, 256), n=35, seed=9)
    target = apply_transform_to_image(img, t)
    res = align_channel_affine(img, target)
    assert res.method in ("affine", "rigid")
    assert res.transform.rotation_deg() == pytest.approx(2.0, abs=0.2)


def test_fallback_on_starless_image():
    rng = np.random.default_rng(4)
    a = rng.normal(100, 2, (128, 128)).astype(np.float32)
    b = np.roll(a, (4, 3), axis=(0, 1))
    res = align_channel_affine(a, b)
    assert res.method in ("phase_correlation", "identity")
