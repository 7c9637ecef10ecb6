"""Rolling-ring one-pass kernel parity (interpret mode, CPU backend).

Oracle: shift_bicubic + sigma_clip_core — the same oracle the
shared-window kernel's tests use (combine.rs:14-91, align.rs:36-57
semantics). Shapes are chosen wide enough that the ring kernel's
column window fits (f_c = 1408 at the default 1152-wide block), and
rows are padded by pad_stack_aligned so the rolling fetch schedule is
eligible through the public dispatcher too.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from astroburst_tpu.ops.resample import shift_bicubic
from astroburst_tpu.stacking.combine import sigma_clip_core
from astroburst_tpu.stacking.onepass_kernel import (pad_stack_aligned,
                                                    shift_clip_onepass)
from astroburst_tpu.stacking.rolling_kernel import (pad_rows_rolling,
                                                    ring_dims,
                                                    shift_clip_rolling_padded)


def _stack(rng, n=5, h=100, w=1300, nan_frac=0.02):
    s = rng.normal(100, 5, (n, h, w)).astype(np.float32)
    s[rng.random(s.shape) < nan_frac] = np.nan
    return s


def _oracle(s, dys, dxs, lo, hi, iters, off_max=16):
    shifted = jnp.stack([
        shift_bicubic(s[k], float(np.clip(dys[k], -off_max, off_max)),
                      float(np.clip(dxs[k], -off_max, off_max)))
        for k in range(s.shape[0])])
    return jax.jit(lambda x: sigma_clip_core(x, lo, hi, iters))(shifted)


def _pad_roll(s, off_max):
    n, h, w = s.shape
    hp = pad_rows_rolling(h, 16, off_max)
    _, f_c, _, _ = ring_dims(16, 1152, off_max)
    wp = max(-(-w // 128) * 128, f_c)
    return jnp.pad(jnp.asarray(s), ((0, 0), (0, hp - h), (0, wp - w)))


def _assert_close(got, ref, got_rej, ref_rej, max_flips=3):
    d = np.abs(np.asarray(got) - np.asarray(ref))
    flips = int((d > 5e-3).sum())
    assert flips <= max_flips, f"{flips} pixels differ, max |d|={d.max()}"
    assert abs(int(got_rej) - int(ref_rej)) <= max_flips


def test_rolling_matches_oracle_small_envelope(rng):
    s = _stack(rng)
    n, h, w = s.shape
    dys = rng.uniform(-5, 5, n).astype(np.float32)
    dxs = rng.uniform(-5, 5, n).astype(np.float32)
    ref, ref_rej = _oracle(s, dys, dxs, 2.5, 3.0, 5, off_max=6)
    got, got_rej = shift_clip_rolling_padded(
        _pad_roll(s, 6), jnp.asarray(dys), jnp.asarray(dxs), h, w,
        2.5, 3.0, 5, off_max=6, interpret=True)
    _assert_close(got, ref, got_rej, ref_rej)


def test_rolling_matches_oracle_wide_envelope(rng):
    # every border-replication path at the clamp (top/bottom/left/right)
    s = _stack(rng, n=4, h=120, w=1300, nan_frac=0.0)
    n, h, w = s.shape
    dys = np.float32([0, 16, -16, 15.75])
    dxs = np.float32([0, -16, 16, -15.3])
    ref, ref_rej = _oracle(s, dys, dxs, 3.0, 3.0, 3, off_max=16)
    got, got_rej = shift_clip_rolling_padded(
        _pad_roll(s, 16), jnp.asarray(dys), jnp.asarray(dxs), h, w,
        3.0, 3.0, 3, off_max=16, interpret=True)
    _assert_close(got, ref, got_rej, ref_rej)


def test_rolling_zero_frames_raw_path(rng):
    # zero_frames compiles the raw-pixel identity path; NaNs must not
    # bleed through CR taps on those frames (align.rs:37-39)
    s = _stack(rng, n=4, h=96, w=1300, nan_frac=0.05)
    n, h, w = s.shape
    z = jnp.zeros(n, jnp.float32)
    ref, _ = jax.jit(lambda x: sigma_clip_core(x, 3.0, 3.0, 3))(
        jnp.asarray(s))
    got, _ = shift_clip_rolling_padded(
        _pad_roll(s, 6), z, z, h, w, 3.0, 3.0, 3, off_max=6,
        interpret=True, zero_frames=tuple(range(n)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4)


def test_dispatcher_routes_to_rolling(rng):
    """The public shift_clip_onepass takes the rolling path when the
    ingest pad is eligible — and its output still matches the oracle."""
    s = _stack(rng, n=4, h=90, w=1300, nan_frac=0.0)
    n, h, w = s.shape
    dys = rng.uniform(-11, 11, n).astype(np.float32)
    dxs = rng.uniform(-11, 11, n).astype(np.float32)
    padded = pad_stack_aligned(jnp.asarray(s))
    # the ingest pad must now satisfy the rolling schedule
    assert padded.shape[1] >= pad_rows_rolling(h, 16, 16)
    ref, ref_rej = _oracle(s, dys, dxs, 3.0, 3.0, 5)
    got, got_rej = shift_clip_onepass(
        padded, jnp.asarray(dys), jnp.asarray(dxs), 3.0, 3.0, 5,
        true_shape=(h, w), interpret=True, rolling=True)
    _assert_close(got, ref, got_rej, ref_rej)
