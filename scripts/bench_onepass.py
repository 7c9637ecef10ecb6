"""TPU micro-bench: one-pass shift+clip kernel vs the two-stage path.

Measurement protocol per CLAUDE.md: K dispatches with distinct inputs,
checksums reduced on device, ONE scalar fetch per batch.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import make_frames, N_FRAMES, H, W  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from astroburst_tpu.parallel.pipeline import align_stack_stretch  # noqa: E402
from astroburst_tpu.stacking.fused_kernel import shift_clip_fused  # noqa: E402
from astroburst_tpu.stacking.onepass_kernel import (  # noqa: E402
    pad_stack_aligned, shift_clip_onepass)

K = 12
_reduce = jax.jit(lambda *xs: sum(xs))


def timeit(name, fn, args_fn, trials=3):
    t0 = time.perf_counter()
    _ = float(_reduce(fn(*args_fn(0))))
    print(f"{name:34s} compile {time.perf_counter()-t0:6.1f} s",
          file=sys.stderr, flush=True)
    best = 1e9
    for t in range(trials):
        t0 = time.perf_counter()
        cs = [fn(*args_fn(1 + t * K + i)) for i in range(K)]
        _ = float(_reduce(*cs))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:34s} {best * 1e3:7.1f} ms/run", file=sys.stderr,
          flush=True)
    return best


print("devices:", jax.devices(), file=sys.stderr, flush=True)
frames = jnp.asarray(make_frames(N_FRAMES, H, W))
padded = pad_stack_aligned(frames)
jax.block_until_ready((frames, padded))
print("padded shape:", padded.shape, file=sys.stderr, flush=True)
rng = np.random.default_rng(0)
dys_c = jnp.asarray(rng.uniform(-12, 12, N_FRAMES).astype(np.float32))
dxs_c = jnp.asarray(rng.uniform(-12, 12, N_FRAMES).astype(np.float32))


@jax.jit
def s_two_stage(stack, eps):
    c, r = shift_clip_fused(stack + eps, dys_c, dxs_c, 3.0, 3.0, 5)
    return c[0, 0] + r.astype(jnp.float32)


@jax.jit
def s_onepass_prepad(stack, eps):
    c, r = shift_clip_onepass(stack + eps, dys_c, dxs_c, 3.0, 3.0, 5,
                              true_shape=(H, W))
    return c[0, 0] + r.astype(jnp.float32)


@jax.jit
def s_onepass_autopad(stack, eps):
    c, r = shift_clip_onepass(stack + eps, dys_c, dxs_c, 3.0, 3.0, 5)
    return c[0, 0] + r.astype(jnp.float32)


_full = jax.jit(lambda s, eps: align_stack_stretch(
    s + eps, sigma_low=3.0, sigma_high=3.0, max_iter=5, align=True,
    true_shape=(H, W)))


@jax.jit
def _cs(o):
    return (o["stf"][0] + o["rejected"].astype(jnp.float32)
            + o["preview"][0, 0].astype(jnp.float32))


def s_full_onepass(stack, eps):
    return _cs(_full(stack, eps))


if __name__ == "__main__":
    af = lambda i: (frames, jnp.float32(i * 1e-6))  # noqa: E731
    pf = lambda i: (padded, jnp.float32(i * 1e-6))  # noqa: E731
    timeit("two-stage shift+clip", s_two_stage, af)
    timeit("one-pass (prepadded)", s_onepass_prepad, pf)
    timeit("one-pass (autopad)", s_onepass_autopad, af)
    timeit("FULL pipeline one-pass prepad", s_full_onepass, pf)
