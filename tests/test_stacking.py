"""Sigma-clip stacking: parity against a direct numpy port of the
reference's per-pixel loop (combine.rs:14-91) plus behavioral tests
(combine.rs:195-285 style)."""

import jax.numpy as jnp
import numpy as np
import pytest

from astroburst_tpu.dtypes import StackConfig
from astroburst_tpu.stacking import sigma_clip_combine_stack, stack_images


from tests.reference_impl import ref_sigma_clip_combine as \
    np_sigma_clip_combine  # combine.rs:14-91 oracle, pinned in fixtures


def test_cosmic_ray_rejected(rng):
    # 8 clean frames + cosmic ray spike in one pixel of one frame
    stack = np.full((8, 4, 4), 100.0, np.float32)
    stack += rng.normal(0, 1.0, stack.shape).astype(np.float32)
    stack[3, 2, 2] = 10000.0
    out, rejected = sigma_clip_combine_stack(jnp.asarray(stack), 3.0, 3.0, 5)
    out = np.asarray(out)
    assert abs(out[2, 2] - 100.0) < 5.0
    assert int(rejected) >= 1


def test_clean_data_untouched():
    stack = np.full((6, 3, 3), 50.0, np.float32)
    out, rejected = sigma_clip_combine_stack(jnp.asarray(stack), 3.0, 3.0, 5)
    np.testing.assert_allclose(np.asarray(out), 50.0, atol=1e-5)
    assert int(rejected) == 0


def test_single_frame_passthrough(rng):
    stack = rng.random((1, 4, 4)).astype(np.float32)
    out, rejected = sigma_clip_combine_stack(jnp.asarray(stack), 3.0, 3.0, 5)
    np.testing.assert_allclose(np.asarray(out), stack[0], atol=1e-6)
    assert int(rejected) == 0


def test_nan_frames_excluded(rng):
    stack = np.full((5, 2, 2), 10.0, np.float32)
    stack[0, 0, 0] = np.nan
    stack[1, 0, 0] = np.inf
    out, _ = sigma_clip_combine_stack(jnp.asarray(stack), 3.0, 3.0, 5)
    np.testing.assert_allclose(np.asarray(out), 10.0, atol=1e-5)


def test_all_invalid_pixel():
    stack = np.full((4, 2, 2), np.nan, np.float32)
    stack[:, 1, 1] = 5.0
    out, _ = sigma_clip_combine_stack(jnp.asarray(stack), 3.0, 3.0, 5)
    out = np.asarray(out)
    assert out[0, 0] == 0.0
    assert abs(out[1, 1] - 5.0) < 1e-5


def test_parity_with_reference_loop(rng):
    """Randomized per-pixel parity vs the numpy port, incl. NaNs and
    outliers."""
    n, h, w = 12, 6, 7
    stack = rng.normal(100.0, 5.0, (n, h, w)).astype(np.float32)
    stack[rng.random((n, h, w)) < 0.05] = np.nan
    # inject outliers
    outs = rng.random((n, h, w)) < 0.04
    stack[outs] = 5000.0
    got, got_rej = sigma_clip_combine_stack(jnp.asarray(stack), 2.5, 3.0, 5)
    got = np.asarray(got)
    total_rej = 0
    for y in range(h):
        for x in range(w):
            ref, rej = np_sigma_clip_combine(stack[:, y, x], 2.5, 3.0, 5)
            total_rej += rej
            assert got[y, x] == pytest.approx(ref, abs=2e-3), (y, x)
    assert int(got_rej) == total_rej


def test_stack_images_with_alignment(rng):
    """Aligned stacking recovers a shifted frame set (combine.rs:94-143)."""
    base = np.zeros((96, 96), np.float32)
    yy, xx = np.mgrid[0:96, 0:96]
    for sy, sx in [(30, 40), (60, 20), (50, 70)]:
        base += 100.0 * np.exp(-((yy - sy) ** 2 + (xx - sx) ** 2) / 8.0)
    base += 10.0
    frames = [base]
    for dy, dx in [(3, -2), (-4, 5)]:
        f = np.roll(base, (dy, dx), axis=(0, 1))
        frames.append(f.astype(np.float32))
    res = stack_images(frames, StackConfig(align=True, max_iterations=3))
    assert res.frame_count == 3
    # offsets recovered (sign: frame = ref shifted by (dy,dx))
    assert res.offsets[1] == (3, -2)
    assert res.offsets[2] == (-4, 5)
    out = np.asarray(res.image)
    # stacked image stays close to the reference frame in the interior
    interior = (slice(10, 86), slice(10, 86))
    np.testing.assert_allclose(out[interior], base[interior], atol=1.0)


def test_stack_images_crops_to_min_dims(rng):
    a = rng.random((20, 24)).astype(np.float32)
    b = rng.random((22, 20)).astype(np.float32)
    res = stack_images([a, b], StackConfig(align=False))
    assert np.asarray(res.image).shape == (20, 20)
