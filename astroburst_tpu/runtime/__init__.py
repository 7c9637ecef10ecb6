"""Host runtime: device-array cache, progress events, config, output dir."""

from astroburst_tpu.runtime.cache import ImageCache, GLOBAL_IMAGE_CACHE, CacheEntry
from astroburst_tpu.runtime.progress import ProgressHandle

__all__ = ["ImageCache", "GLOBAL_IMAGE_CACHE", "CacheEntry", "ProgressHandle"]
