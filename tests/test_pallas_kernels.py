"""Pallas kernel parity tests (interpret mode on the CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from astroburst_tpu.ops.resample import shift_bicubic
from astroburst_tpu.stacking.clip_kernel import sigma_clip_pallas
from astroburst_tpu.stacking.combine import sigma_clip_core
from astroburst_tpu.stacking.fused_kernel import shift_clip_fused


def _stack(rng, n=8, h=100, w=150, nan_frac=0.03, outlier_frac=0.03):
    s = rng.normal(100, 5, (n, h, w)).astype(np.float32)
    s[rng.random(s.shape) < nan_frac] = np.nan
    s[rng.random(s.shape) < outlier_frac] = 4000.0
    return s


def test_clip_kernel_matches_xla(rng):
    s = jnp.asarray(_stack(rng))
    ref, ref_rej = jax.jit(lambda x: sigma_clip_core(x, 2.5, 3.0, 5))(s)
    got, got_rej = sigma_clip_pallas(s, 2.5, 3.0, 5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
    assert int(got_rej) == int(ref_rej)


def test_clip_kernel_single_iteration(rng):
    s = jnp.asarray(_stack(rng, n=5))
    ref, _ = jax.jit(lambda x: sigma_clip_core(x, 3.0, 3.0, 1))(s)
    got, _ = sigma_clip_pallas(s, 3.0, 3.0, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.slow
def test_fused_kernel_matches_shift_plus_clip(rng):
    n = 6
    s = jnp.asarray(_stack(rng, n=n, h=130, w=170))
    dys = jnp.asarray(rng.uniform(-12, 12, n).astype(np.float32))
    dxs = jnp.asarray(rng.uniform(-12, 12, n).astype(np.float32))
    shifted = jnp.stack([shift_bicubic(s[k], float(dys[k]), float(dxs[k]))
                         for k in range(n)])
    ref, ref_rej = jax.jit(lambda x: sigma_clip_core(x, 2.5, 3.0, 5))(shifted)
    got, got_rej = shift_clip_fused(s, dys, dxs, 2.5, 3.0, 5,
                                    interpret=True)
    # the fused kernel sums in list order, the XLA path in tree order:
    # f32 means differ ~1e-5 relative (≈1e-3 here at values ~100), and
    # borderline clip decisions may rarely flip
    d = np.abs(np.asarray(got) - np.asarray(ref))
    assert (d < 5e-3).mean() > 0.999
    assert d.max() < 0.1
    assert abs(int(got_rej) - int(ref_rej)) <= int(ref_rej) * 0.02 + 50


def test_fused_kernel_zero_offsets_is_plain_clip(rng):
    s = jnp.asarray(_stack(rng, n=4, h=80, w=90, nan_frac=0.0))
    z = jnp.zeros(4, jnp.float32)
    ref, _ = jax.jit(lambda x: sigma_clip_core(x, 3.0, 3.0, 3))(s)
    got, _ = shift_clip_fused(s, z, z, 3.0, 3.0, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_fused_kernel_large_offsets_clamped(rng):
    # offsets beyond MAX_SHIFT are clamped, not wrapped or crashed
    s = jnp.asarray(_stack(rng, n=3, h=64, w=64, nan_frac=0.0,
                           outlier_frac=0.0))
    dys = jnp.asarray([0.0, 500.0, -500.0], jnp.float32)
    got, _ = shift_clip_fused(s, dys, jnp.zeros(3, jnp.float32),
                              3.0, 3.0, 2, interpret=True)
    assert np.isfinite(np.asarray(got)).all()


def test_fused_kernel_single_frame_identity_shift(rng):
    s = jnp.asarray(_stack(rng, n=1, h=70, w=300, nan_frac=0.0,
                           outlier_frac=0.0))
    got, rej = shift_clip_fused(s, jnp.zeros(1), jnp.zeros(1), 3.0, 3.0, 5,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(s[0]), atol=1e-4)
    assert int(rej) == 0


def test_fused_kernel_moderately_large_integer_shifts(rng):
    # exercises preshift windows far from the content (|k| up to 40)
    n = 4
    s = jnp.asarray(_stack(rng, n=n, h=120, w=200, nan_frac=0.0,
                           outlier_frac=0.0))
    dys = jnp.asarray([0.0, 37.0, -40.0, 13.0], jnp.float32)
    dxs = jnp.asarray([0.0, -33.0, 25.0, -7.0], jnp.float32)
    shifted = jnp.stack([shift_bicubic(s[k], float(dys[k]), float(dxs[k]))
                         for k in range(n)])
    ref, _ = jax.jit(lambda x: sigma_clip_core(x, 3.0, 3.0, 3))(shifted)
    got, _ = shift_clip_fused(s, dys, dxs, 3.0, 3.0, 3, interpret=True)
    d = np.abs(np.asarray(got) - np.asarray(ref))
    assert (d < 5e-3).mean() > 0.999


def test_fused_kernel_fractional_only_shifts(rng):
    n = 3
    s = jnp.asarray(_stack(rng, n=n, h=90, w=140, nan_frac=0.0,
                           outlier_frac=0.0))
    dys = jnp.asarray([0.25, -0.5, 0.75], jnp.float32)
    dxs = jnp.asarray([-0.33, 0.9, 0.0], jnp.float32)
    shifted = jnp.stack([shift_bicubic(s[k], float(dys[k]), float(dxs[k]))
                         for k in range(n)])
    ref, _ = jax.jit(lambda x: sigma_clip_core(x, 3.0, 3.0, 2))(shifted)
    got, _ = shift_clip_fused(s, dys, dxs, 3.0, 3.0, 2, interpret=True)
    d = np.abs(np.asarray(got) - np.asarray(ref))
    assert (d < 5e-3).mean() > 0.999


def test_fused_kernel_ragged_nonmultiple_shape(rng):
    # h, w far from block multiples; also wider than one block column
    n = 5
    s = jnp.asarray(_stack(rng, n=n, h=67, w=515, nan_frac=0.0,
                           outlier_frac=0.0))
    dys = jnp.asarray(rng.uniform(-5, 5, n).astype(np.float32))
    dxs = jnp.asarray(rng.uniform(-5, 5, n).astype(np.float32))
    shifted = jnp.stack([shift_bicubic(s[k], float(dys[k]), float(dxs[k]))
                         for k in range(n)])
    ref, _ = jax.jit(lambda x: sigma_clip_core(x, 3.0, 3.0, 3))(shifted)
    got, _ = shift_clip_fused(s, dys, dxs, 3.0, 3.0, 3, interpret=True)
    d = np.abs(np.asarray(got) - np.asarray(ref))
    assert (d < 5e-3).mean() > 0.999
