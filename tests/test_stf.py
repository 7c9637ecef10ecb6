"""STF/MTF tests mirroring the reference's (stf.rs:157-263)."""

import jax.numpy as jnp
import numpy as np
import pytest

from astroburst_tpu.dtypes import AutoStfConfig, StfParams
from astroburst_tpu.imaging.stf import (apply_stf_f32, apply_stf_u8, auto_stf,
                                        mtf, mtf_balance)
from astroburst_tpu.ops.stats import compute_image_stats


def test_mtf_identity():
    assert mtf(0.5, 0.5) == pytest.approx(0.5, abs=1e-6)


def test_mtf_boundaries():
    assert mtf(0.0, 0.3) == 0.0
    assert mtf(1.0, 0.3) == 1.0


def test_auto_stf_clean_data():
    x = (jnp.arange(1, 10001, dtype=jnp.float32) / 10000.0).reshape(100, 100)
    st = compute_image_stats(x)
    p = auto_stf(st, AutoStfConfig())
    assert 0.0 <= p.shadow
    assert p.highlight <= 1.0
    assert 0.0 < p.midtone < 1.0


def test_auto_stf_with_padding():
    raw = np.zeros(10000, dtype=np.float32)
    raw[3750:3750 + 2500] = (np.arange(2500) + 1) * 0.001
    st = compute_image_stats(jnp.asarray(raw.reshape(100, 100)))
    assert st.valid_count == 2500
    assert st.min > 0.0
    p = auto_stf(st)
    assert p.shadow >= 0.0 and p.midtone > 0.0


def test_shadow_k_aggressiveness():
    x = jnp.asarray((np.arange(10000, dtype=np.float32) * 0.001 + 0.01)
                    .reshape(100, 100))
    st = compute_image_stats(x)
    gentle = auto_stf(st, AutoStfConfig(target_bg=0.25, shadow_k=-1.5))
    aggressive = auto_stf(st, AutoStfConfig(target_bg=0.25, shadow_k=-4.0))
    assert aggressive.shadow <= gentle.shadow


def test_apply_stf_range():
    x = jnp.asarray((np.arange(1, 17, dtype=np.float32) * 100.0).reshape(4, 4))
    st = compute_image_stats(x)
    p = StfParams(shadow=0.0, midtone=0.5, highlight=1.0)
    buf = np.asarray(apply_stf_u8(x, p, st)).ravel()
    assert buf[0] == 0
    assert buf[15] == 255


def test_padding_pixels_rendered_black():
    raw = np.zeros(16, dtype=np.float32)
    raw[8] = 0.5
    raw[9] = 1.0
    x = jnp.asarray(raw.reshape(4, 4))
    st = compute_image_stats(x)
    p = StfParams(shadow=0.0, midtone=0.5, highlight=1.0)
    buf = np.asarray(apply_stf_u8(x, p, st)).ravel()
    assert (buf[:8] == 0).all()


def test_apply_stf_f32_matches_scalar_mtf():
    x = jnp.asarray(np.linspace(0.05, 1.0, 64, dtype=np.float32).reshape(8, 8))
    st = compute_image_stats(x)
    p = StfParams(shadow=0.1, midtone=0.3, highlight=1.0)
    out = np.asarray(apply_stf_f32(x, p, st)).ravel()
    rng = max(st.max - st.min, 1e-30)
    for i, v in enumerate(np.asarray(x).ravel()):
        norm = (float(v) - st.min) / rng
        c = min(max((norm - 0.1) / 0.9, 0.0), 1.0)
        assert out[i] == pytest.approx(mtf(c, 0.3), abs=2e-6)


def test_mtf_balance_guard():
    assert mtf_balance(0.5, 0.5) == 0.5  # denom == 0 → 0.5
