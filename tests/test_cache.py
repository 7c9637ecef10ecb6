"""Cache semantics (reference: infra/cache.rs:312-468)."""

import jax.numpy as jnp
import numpy as np

from astroburst_tpu.constants import COMPOSITE_KEY_R, STAR_MASK_KEY
from astroburst_tpu.dtypes import ImageStats
from astroburst_tpu.runtime.cache import ImageCache


def _img(v=1.0, shape=(4, 4)):
    return jnp.full(shape, v, dtype=jnp.float32)


def test_lru_eviction():
    c = ImageCache(max_entries=3)
    for i in range(3):
        c.insert(f"k{i}", _img(i + 1))
    c.get("k0")  # refresh k0
    c.insert("k3", _img(9))
    assert c.contains("k0")      # refreshed → survived
    assert not c.contains("k1")  # oldest → evicted
    assert c.contains("k2") and c.contains("k3")


def test_pinned_keys_never_evicted():
    c = ImageCache(max_entries=2)
    c.insert(COMPOSITE_KEY_R, _img())
    c.insert(STAR_MASK_KEY, _img())
    c.insert("a", _img())
    c.insert("b", _img())
    assert c.contains(COMPOSITE_KEY_R)
    assert c.contains(STAR_MASK_KEY)
    # non-pinned got squeezed
    assert not (c.contains("a") and c.contains("b"))


def test_all_pinned_no_infinite_loop():
    c = ImageCache(max_entries=1)
    c.insert(COMPOSITE_KEY_R, _img())
    c.insert("__composite_g", _img())
    c.insert("__wizard_ch_ha_aligned", _img())
    assert len(c.keys()) == 3  # over cap, but all pinned → no eviction


def test_byte_cap():
    c = ImageCache(max_entries=100, max_bytes=4 * 4 * 4 * 2)  # two 4x4 planes
    c.insert("a", _img())
    c.insert("b", _img())
    c.insert("c", _img())
    assert len(c.keys()) == 2


def test_zero_copy_shared_device_buffer():
    c = ImageCache()
    a = _img(3.0)
    e1 = c.insert("x", a)
    e2 = c.insert("y", e1.image)
    assert e1.image is e2.image  # same device buffer (Arc equality analog)


def test_stats_upgrade():
    c = ImageCache()
    c.insert("k", _img())
    assert c.get("k").stats is None
    st = ImageStats(min=0, max=1, valid_count=16)
    c.upgrade_stats("k", st)
    assert c.get("k").stats is st
    # upgrade never overwrites
    c.upgrade_stats("k", ImageStats())
    assert c.get("k").stats is st


def test_get_or_load():
    c = ImageCache()
    calls = []

    def loader():
        calls.append(1)
        return np.ones((2, 2), np.float32), None, None

    e1 = c.get_or_load("k", loader)
    e2 = c.get_or_load("k", loader)
    assert len(calls) == 1
    assert e1 is e2


def test_remove_prefix():
    c = ImageCache()
    c.insert("__wizard_ch_ha_aligned", _img())
    c.insert("__wizard_ch_o3_aligned", _img())
    c.insert("other", _img())
    n = c.remove_prefix("__wizard_ch_")
    assert n == 2
    assert c.contains("other")
