"""Row-sharded compose (blend + WB + STF) vs the single-device pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from astroburst_tpu.compose.channel_blend import blend_channels
from astroburst_tpu.compose.rgb import process_rgb
from astroburst_tpu.dtypes import (RgbComposeConfig, WhiteBalance,
                                   WhiteBalanceMode)
from astroburst_tpu.parallel import make_mesh
from astroburst_tpu.parallel.compose import make_sharded_compose


def _channels(rng, c=4, h=64, w=48):
    chans = rng.gamma(2.0, 40.0, (c, h, w)).astype(np.float32)
    chans[0, :3, :5] = 0.0          # padding pixels (v <= 1e-7)
    chans[1, 10, 10] = np.nan       # invalid pixel
    return chans


_WEIGHTS = [
    {"channel_idx": 0, "r_weight": 0.8, "g_weight": 0.1, "b_weight": 0.0},
    {"channel_idx": 1, "r_weight": 0.2, "g_weight": 0.7, "b_weight": 0.1},
    {"channel_idx": 2, "r_weight": 0.0, "g_weight": 0.2, "b_weight": 0.6},
    {"channel_idx": 3, "r_weight": 0.0, "g_weight": 0.0, "b_weight": 0.3},
]


def _weight_matrix(n):
    w = np.zeros((n, 3), np.float32)
    for e in _WEIGHTS:
        w[e["channel_idx"], 0] += e["r_weight"]
        w[e["channel_idx"], 1] += e["g_weight"]
        w[e["channel_idx"], 2] += e["b_weight"]
    return w


def _oracle(chans, wb_mode, linked):
    r, g, b = blend_channels(list(chans), _WEIGHTS)
    wb = WhiteBalance(mode=WhiteBalanceMode(wb_mode), r=1.3, g=1.0, b=0.8)
    cfg = RgbComposeConfig(white_balance=wb, align=False,
                           auto_stretch=True, linked_stf=linked)
    return process_rgb(np.asarray(r), np.asarray(g), np.asarray(b), cfg)


_CACHE = {}


def _run_sharded(chans, wb_mode, linked):
    # one compile per (wb_mode, linked) config — every test reuses the
    # same deterministic input, so cache the composed output
    key = (wb_mode, linked)
    if key in _CACHE:
        return _CACHE[key]
    mesh = make_mesh(8, ("rows",), (8,))
    compose = make_sharded_compose(mesh, "rows", wb_mode=wb_mode,
                                   linked_stf=linked, exact_pair=True)
    sharded = jax.device_put(jnp.asarray(chans),
                             NamedSharding(mesh, P(None, "rows", None)))
    out = compose(sharded, jnp.asarray(_weight_matrix(len(chans))),
                  jnp.asarray([1.3, 1.0, 0.8], jnp.float32))
    _CACHE[key] = out
    return out


def test_sharded_compose_linked_auto_matches_process_rgb(rng):
    chans = _channels(rng)
    ref = _oracle(chans, "auto", True)
    out = _run_sharded(chans, "auto", True)
    got = np.asarray(out["rgb"])
    for k, plane in enumerate([ref.r, ref.g, ref.b]):
        np.testing.assert_allclose(got[k], np.asarray(plane), atol=2e-5)
    stf = np.asarray(out["stf"])
    assert np.allclose(stf[0], stf[1]) and np.allclose(stf[1], stf[2])
    np.testing.assert_allclose(stf[0], [ref.stf_r.shadow, ref.stf_r.midtone],
                               atol=1e-5)


@pytest.mark.slow
def test_sharded_compose_unlinked_manual_matches(rng):
    chans = _channels(rng)
    ref = _oracle(chans, "manual", False)
    out = _run_sharded(chans, "manual", False)
    got = np.asarray(out["rgb"])
    for k, plane in enumerate([ref.r, ref.g, ref.b]):
        np.testing.assert_allclose(got[k], np.asarray(plane), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["wb"]), [1.3, 1.0, 0.8])


def test_sharded_compose_wb_picks_stable_reference(rng):
    chans = _channels(rng)
    out = _run_sharded(chans, "auto", True)
    wb = np.asarray(out["wb"])
    assert (wb == 1.0).any()
    assert np.isfinite(wb).all() and (wb > 0).all()


def test_sharded_compose_invalid_pixels_render_black(rng):
    chans = _channels(rng)
    out = _run_sharded(chans, "auto", True)
    got = np.asarray(out["rgb"])
    # the NaN pixel in channel 1 feeds G strongly; every blended plane
    # containing it is NaN there pre-STF, so the composite rule zeroes it
    assert got[0, 10, 10] == 0.0
    assert np.isfinite(got).all()
    prev = np.asarray(out["preview"])
    assert prev.dtype == np.uint8
    np.testing.assert_array_equal(
        prev, np.clip(np.round(got * 255.0), 0, 255).astype(np.uint8))


@pytest.mark.slow
def test_sharded_compose_reductions_only_no_reshard(rng):
    """The compiled HLO must not contain all-to-all OR gather-style
    resharding — the compose is elementwise + psum reductions. The
    all-gather assertion is the load-bearing one: the flat stats path
    (stats_core flatten=True) compiles to 8 full-plane all-gathers on
    this mesh (the chunk pad+reshape defeats GSPMD), which
    flatten=False exists to prevent."""
    chans = _channels(rng)
    mesh = make_mesh(8, ("rows",), (8,))
    compose = make_sharded_compose(mesh, "rows", exact_pair=True)
    sharded = jax.device_put(jnp.asarray(chans),
                             NamedSharding(mesh, P(None, "rows", None)))
    lowered = compose.lower(sharded, jnp.asarray(_weight_matrix(len(chans))),
                            jnp.ones(3, jnp.float32))
    hlo = lowered.compile().as_text()
    assert "all-to-all" not in hlo
    assert "all-gather" not in hlo
