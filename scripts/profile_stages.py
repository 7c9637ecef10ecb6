"""Stage breakdown of the headline pipeline, measured the reliable way:
K pipelined dispatches per host sync (same as bench.py), distinct
inputs to defeat result caching. Each stage is its own jitted program.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import make_frames, N_FRAMES, H, W  # noqa: E402


def timeit(fn, args_fn, k=6, trials=3):
    out = fn(*args_fn(0))
    _ = jax.tree_util.tree_map(
        lambda x: np.asarray(x).ravel()[0], out)
    best = 1e9
    for t in range(trials):
        t0 = time.perf_counter()
        outs = [fn(*args_fn(1 + t * k + i)) for i in range(k)]
        _ = [jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], o)
             for o in outs]
        best = min(best, (time.perf_counter() - t0) / k)
    return best


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from astroburst_tpu.alignment.phase_correlation import \
    _phase_correlate_traced  # noqa: E402
from astroburst_tpu.imaging.stf import apply_stf_traced, \
    auto_stf_traced  # noqa: E402
from astroburst_tpu.ops.stats import stats_core  # noqa: E402
from astroburst_tpu.stacking.fused_kernel import shift_clip_fused  # noqa: E402

print("devices:", jax.devices(), file=sys.stderr)
frames = jnp.asarray(make_frames(N_FRAMES, H, W))
jax.block_until_ready(frames)
dys = jnp.zeros(N_FRAMES, jnp.float32)
dxs = jnp.zeros(N_FRAMES, jnp.float32)
combined = frames[0]


@jax.jit
def stage_align(stack, eps):
    s = stack + eps
    ref = s[0]
    dys1, dxs1, confs = jax.vmap(
        lambda f: _phase_correlate_traced(ref, f))(s[1:])
    return dys1.sum() + dxs1.sum()


@jax.jit
def stage_fused(stack, eps):
    c, r = shift_clip_fused(stack + eps, dys, dxs, 3.0, 3.0, 5)
    return c[0, 0] + r.astype(jnp.float32)


@jax.jit
def stage_stats(img, eps):
    mn, mx, _t, count, med, mad = stats_core(img + eps, False)
    return mn + mx + med + mad


@jax.jit
def stage_stf_render(img, eps):
    x = img + eps
    mn, mx, _t, count, med, mad = stats_core(x, False)
    sigma = jnp.maximum(mad * 1.4826, 1e-30)
    sh, mt = auto_stf_traced(mn, mx, med, sigma, count)
    prev = apply_stf_traced(x, mn, mx, sh, mt, as_u8=True)
    return prev[0, 0].astype(jnp.float32) + sh


for name, fn, args in [
    ("align(15 frames)", stage_align, lambda i: (frames, jnp.float32(i * 1e-6))),
    ("fused shift+clip", stage_fused, lambda i: (frames, jnp.float32(i * 1e-6))),
    ("stats(median/MAD)", stage_stats, lambda i: (combined, jnp.float32(i * 1e-6))),
    ("stats+stf+render", stage_stf_render, lambda i: (combined, jnp.float32(i * 1e-6))),
]:
    t = timeit(fn, args)
    print(f"{name:22s} {t * 1e3:7.1f} ms", file=sys.stderr)
