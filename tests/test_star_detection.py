"""Star detection on synthetic Gaussian stars with centroid-accuracy
asserts, mirroring star_detection.rs:260-329."""

import numpy as np
import pytest
import jax.numpy as jnp

from astroburst_tpu.analysis import detect_stars, estimate_background


def add_star(img, cy, cx, amp, sigma):
    yy, xx = np.mgrid[0:img.shape[0], 0:img.shape[1]].astype(np.float64)
    img += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma ** 2))


def make_field(shape=(256, 256), stars=((60.3, 80.7, 900.0, 1.8),
                                        (150.0, 40.0, 700.0, 2.2),
                                        (200.5, 200.5, 1200.0, 1.5)),
               bg=100.0, noise=2.0, seed=5):
    rng = np.random.default_rng(seed)
    img = rng.normal(bg, noise, shape)
    for cy, cx, amp, sig in stars:
        add_star(img, cy, cx, amp, sig)
    return img.astype(np.float32)


def test_detects_all_stars_with_accurate_centroids():
    truth = [(60.3, 80.7), (150.0, 40.0), (200.5, 200.5)]
    img = make_field()
    res = detect_stars(img, 5.0)
    assert len(res.stars) == 3
    for ty, tx in truth:
        best = min(res.stars, key=lambda s: (s.y - ty) ** 2 + (s.x - tx) ** 2)
        assert abs(best.y - ty) < 0.3, (best.y, ty)
        assert abs(best.x - tx) < 0.3, (best.x, tx)


def test_fwhm_estimate():
    img = make_field(stars=((128.0, 128.0, 1000.0, 2.0),), noise=0.5)
    res = detect_stars(img, 5.0)
    assert len(res.stars) == 1
    # FWHM = 2.3548 * sigma = 4.71 (threshold truncation biases slightly low)
    assert res.stars[0].fwhm == pytest.approx(4.71, abs=1.2)
    assert res.stars[0].eccentricity < 0.45


def test_background_estimate():
    img = make_field(stars=(), bg=500.0, noise=10.0)
    med, sig = estimate_background(img, 64)
    assert med == pytest.approx(500.0, abs=2.0)
    assert sig == pytest.approx(10.0, rel=0.25)


def test_brightest_first_ordering():
    img = make_field()
    res = detect_stars(img, 5.0)
    fluxes = [s.flux for s in res.stars]
    assert fluxes == sorted(fluxes, reverse=True)


def test_no_stars_in_flat_noise():
    rng = np.random.default_rng(0)
    img = rng.normal(100.0, 3.0, (128, 128)).astype(np.float32)
    res = detect_stars(img, 6.0)
    assert len(res.stars) <= 2  # noise may rarely spike


def test_nan_safe():
    img = make_field()
    img[10:20, 10:20] = np.nan
    img[100, :] = np.inf
    res = detect_stars(img, 5.0)
    assert len(res.stars) >= 3 - 1
    for s in res.stars:
        assert np.isfinite(s.x) and np.isfinite(s.fwhm)


def test_tiny_image_returns_empty():
    res = detect_stars(np.ones((2, 2), np.float32), 5.0)
    assert res.stars == []


def test_elongated_star_eccentricity():
    rng = np.random.default_rng(1)
    img = rng.normal(100.0, 1.0, (128, 128))
    yy, xx = np.mgrid[0:128, 0:128].astype(np.float64)
    img += 800.0 * np.exp(-((yy - 64) ** 2 / (2 * 1.5 ** 2) +
                            (xx - 64) ** 2 / (2 * 4.0 ** 2)))
    res = detect_stars(img.astype(np.float32), 5.0)
    assert len(res.stars) == 1
    assert res.stars[0].eccentricity > 0.7


def test_snr_positive_and_scaled():
    img = make_field(stars=((128.0, 128.0, 1000.0, 2.0),), noise=2.0)
    res = detect_stars(img, 5.0)
    s = res.stars[0]
    assert s.snr == pytest.approx(1000.0 / res.background_sigma, rel=0.15)


def test_tile_sort_pallas_matches_numpy(rng):
    """Per-tile VMEM bitonic sorter == numpy sort with the validity
    masking (+inf tails) and counts."""
    from astroburst_tpu.analysis.tile_sort_kernel import sort_tiles_pallas

    x = rng.normal(100, 10, (32, 64)).astype(np.float32)
    x[x < 88] = np.nan
    x[0, :3] = 0.0  # below the 1e-7 padding threshold
    got, cnt = sort_tiles_pallas(jnp.asarray(x), 32, interpret=True)
    tiles = x.reshape(1, 32, 2, 32).transpose(0, 2, 1, 3).reshape(2, 1024)
    valid = np.isfinite(tiles) & (tiles > 1e-7)
    ref = np.sort(np.where(valid, tiles, np.inf), axis=1)
    np.testing.assert_array_equal(np.asarray(got), ref)
    np.testing.assert_array_equal(np.asarray(cnt), valid.sum(1))


def test_background_pallas_path_matches_xla(rng):
    """_estimate_background_kernel with the Pallas tile sorter ==
    the XLA sort path."""
    from astroburst_tpu.analysis.star_detection import (
        _estimate_background_kernel)

    img = rng.normal(50, 4, (70, 90)).astype(np.float32)
    img[10:12, 20:24] = np.nan
    img[40, 50] = 900.0
    ref = _estimate_background_kernel(jnp.asarray(img), 32,
                                      use_pallas=False)
    got = _estimate_background_kernel(jnp.asarray(img), 32,
                                      use_pallas=True, interpret=True)
    assert float(got[0]) == pytest.approx(float(ref[0]), abs=1e-5)
    assert float(got[1]) == pytest.approx(float(ref[1]), abs=1e-6)


def test_detect_stars_small_image_no_crash(rng):
    """Images whose 2×2 block-max grid is smaller than max_peaks must
    not crash top_k (r3 review finding: 40×40 raised ValueError)."""
    from astroburst_tpu.analysis.star_detection import detect_stars

    img = rng.normal(100, 3, (40, 40)).astype(np.float32)
    yy, xx = np.mgrid[0:40, 0:40].astype(np.float32)
    for sy, sx in [(12, 12), (28, 30)]:
        img += 800.0 * np.exp(-((yy - sy) ** 2 + (xx - sx) ** 2) / 3.0)
    res = detect_stars(img)
    assert len(res.stars) >= 2
    got = {(round(s.y), round(s.x)) for s in res.stars[:2]}
    assert (12, 12) in got and (28, 30) in got


def test_detect_stars_dense_slab_overflow_fallback(rng):
    """>64 peaks inside one 2-image-row slab must all survive: the
    two-level top_k detects per-slab overflow and falls back to the
    lossless full-plane top_k (r3 review finding)."""
    from astroburst_tpu.analysis.star_detection import (_detect_kernel,
                                                        detect_stars)

    h, w = 64, 512
    img = rng.normal(100.0, 0.5, (h, w)).astype(np.float32)
    xs = np.arange(5, 502, 7)  # 71 blobs peaking in rows 2-3 (one slab)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for x in xs:
        # tight blobs: tails must NOT bridge above threshold or the
        # flood fill merges neighbors into one component
        img += 500.0 * np.exp(-((yy - 2.0) ** 2 + (xx - x) ** 2) / 1.0)
    res = detect_stars(img, sigma_threshold=5.0, max_peaks=256)
    found = {(round(s.y), round(s.x)) for s in res.stars}
    missing = [x for x in xs if (2, x) not in found]
    assert not missing, f"lost {len(missing)} slab peaks: {missing[:5]}"


def test_device_dedupe_matches_host_accept_set():
    """dedupe_packed_device must reproduce _postprocess_packed's
    brightest-first 3-px greedy accept set exactly (star_detection.rs:
    215), including chained suppressions (A<3px from B<3px from C)."""
    import jax.numpy as jnp
    from astroburst_tpu.analysis.star_detection import (
        _detect_fused, _postprocess_packed, dedupe_packed_device)

    rng = np.random.default_rng(11)
    h, w = 256, 320
    img = rng.normal(100, 3, (h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # isolated stars + tight pairs/chains within 3 px
    spots = [(40, 40, 900), (41.5, 41.5, 700), (43.0, 43.0, 800),
             (120, 200, 1000), (121.2, 201.0, 950),
             (200, 60, 600), (80, 280, 850), (30, 150, 500)]
    for sy, sx, a in spots:
        img += a * np.exp(-((yy - sy) ** 2 + (xx - sx) ** 2) / 3.0)
    packed = _detect_fused(jnp.asarray(img), 32, 5.0, 256)
    host = _postprocess_packed(np.asarray(packed), 5.0, h, w)
    accepted = np.asarray(dedupe_packed_device(packed))
    pk = np.asarray(packed)
    got = sorted((round(float(y), 3), round(float(x), 3))
                 for y, x, a in zip(pk[0], pk[1], accepted) if a)
    want = sorted((round(s.y, 3), round(s.x, 3)) for s in host.stars)
    assert got == want
    assert len(want) >= 5  # duplicates were actually suppressed


def test_window_kernel_matches_xla_path():
    """The fused DMA window kernel (interpret mode — exact Mosaic
    semantics on CPU) must reproduce the XLA gather+flood+moment path:
    identical accept set, centroids/flux/fwhm to f32 rounding. Ecc is
    compared absolutely — sqrt(1 − l2/l1) near-circular stars amplify
    f32 reduction-order noise unboundedly in relative terms."""
    import jax.numpy as jnp
    from astroburst_tpu.analysis.star_detection import _detect_fused

    rng = np.random.default_rng(5)
    h, w = 512, 640
    img = rng.normal(100, 3, (h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(60):
        sy, sx = rng.uniform(10, h - 10), rng.uniform(10, w - 10)
        a = rng.uniform(200, 2000)
        img += a * np.exp(-((yy - sy) ** 2 + (xx - sx) ** 2) / 3.5)
    img[100:110, 200:210] = np.nan  # dead region crossing windows

    x = jnp.asarray(img)
    ref = np.asarray(_detect_fused(x, 64, 5.0, 256, use_pallas=False))
    got = np.asarray(_detect_fused(x, 64, 5.0, 256, use_pallas=True,
                                   interpret=True))
    assert (got[8] == ref[8]).all()          # identical valid set
    assert int(ref[8].sum()) >= 50
    v = ref[8] > 0.5
    for i in (0, 1, 2, 3, 5, 6, 7):          # cy cx flux fwhm pval npix snr
        rel = np.abs(got[i] - ref[i]) / np.maximum(np.abs(ref[i]), 1e-6)
        assert np.max(np.where(v, rel, 0)) < 1e-4, f"row {i}"
    assert np.max(np.where(v, np.abs(got[4] - ref[4]), 0)) < 0.01  # ecc
