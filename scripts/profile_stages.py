"""Stage breakdown of the headline pipeline, measured the reliable way:
K dispatches with distinct inputs, checksums reduced ON DEVICE, one
scalar fetch per batch (each fetch through the axon tunnel costs
~31 ms and fetches serialize — see CLAUDE.md). Reported times have
the single-fetch floor subtracted out by K-amortization.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import make_frames, N_FRAMES, H, W  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from astroburst_tpu.alignment.phase_correlation import \
    _phase_correlate_traced  # noqa: E402
from astroburst_tpu.imaging.stf import apply_stf_traced, \
    auto_stf_traced  # noqa: E402
from astroburst_tpu.ops.stats import stats_core  # noqa: E402
from astroburst_tpu.parallel.pipeline import align_stack_stretch  # noqa: E402
from astroburst_tpu.stacking.fused_kernel import shift_clip_fused  # noqa: E402

K = 12
_reduce = jax.jit(lambda *xs: sum(xs))


def timeit(name, fn, args_fn, trials=3):
    _ = float(_reduce(fn(*args_fn(0))))
    best = 1e9
    for t in range(trials):
        t0 = time.perf_counter()
        cs = [fn(*args_fn(1 + t * K + i)) for i in range(K)]
        _ = float(_reduce(*cs))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:30s} {best * 1e3:7.1f} ms/run", file=sys.stderr)
    return best


print("devices:", jax.devices(), file=sys.stderr)
frames = jnp.asarray(make_frames(N_FRAMES, H, W))
jax.block_until_ready(frames)
rng = np.random.default_rng(0)
dys_c = jnp.asarray(rng.uniform(-12, 12, N_FRAMES).astype(np.float32))
dxs_c = jnp.asarray(rng.uniform(-12, 12, N_FRAMES).astype(np.float32))
combined = frames[0]


def _align(s):
    ref = s[0]
    dys1, dxs1, confs = jax.vmap(
        lambda f: _phase_correlate_traced(ref, f))(s[1:])
    dys = jnp.concatenate([jnp.zeros(1, jnp.float32), dys1])
    dxs = jnp.concatenate([jnp.zeros(1, jnp.float32), dxs1])
    return dys, dxs


@jax.jit
def s_align(stack, eps):
    dys, dxs = _align(stack + eps)
    return dys.sum() + dxs.sum()


@jax.jit
def s_fused(stack, eps):
    c, r = shift_clip_fused(stack + eps, dys_c, dxs_c, 3.0, 3.0, 5)
    return c[0, 0] + r.astype(jnp.float32)


@jax.jit
def s_align_fused(stack, eps):
    s = stack + eps
    dys, dxs = _align(s)
    c, r = shift_clip_fused(s, dys, dxs, 3.0, 3.0, 5)
    return c[0, 0] + r.astype(jnp.float32)


@jax.jit
def s_align_fused_stats(stack, eps):
    s = stack + eps
    dys, dxs = _align(s)
    c, r = shift_clip_fused(s, dys, dxs, 3.0, 3.0, 5)
    mn, mx, _t, count, med, mad = stats_core(c, False)
    sigma = jnp.maximum(mad * 1.4826, 1e-30)
    sh, mt = auto_stf_traced(mn, mx, med, sigma, count)
    prev = apply_stf_traced(c, mn, mx, sh, mt, as_u8=True)
    return c[0, 0] + prev[0, 0].astype(jnp.float32) + sh


_full = jax.jit(lambda s, eps: align_stack_stretch(
    s + eps, sigma_low=3.0, sigma_high=3.0, max_iter=5, align=True))


@jax.jit
def _full_checksum(o):
    return (o["stf"][0] + o["rejected"].astype(jnp.float32)
            + o["preview"][0, 0].astype(jnp.float32))


def s_full(stack, eps):
    return _full_checksum(_full(stack, eps))


@jax.jit
def s_stats(img, eps):
    mn, mx, _t, count, med, mad = stats_core(img + eps, False)
    return mn + mx + med + mad


if __name__ == "__main__":
    af = lambda i: (frames, jnp.float32(i * 1e-6))  # noqa: E731
    cf = lambda i: (combined, jnp.float32(i * 1e-6))  # noqa: E731
    timeit("align (15 PC)", s_align, af)
    timeit("fused shift+clip", s_fused, af)
    timeit("align + fused", s_align_fused, af)
    timeit("align + fused + stats/stf", s_align_fused_stats, af)
    timeit("full align_stack_stretch", s_full, af)
    timeit("stats(median/MAD) alone", s_stats, cf)
