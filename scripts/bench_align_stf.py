"""TPU micro-bench: align stage packed vs unpacked; STF render breakdown."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import make_frames, N_FRAMES, H, W  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from astroburst_tpu.alignment.phase_correlation import (  # noqa: E402
    _phase_correlate_traced, phase_correlate_stack)

K = 8
_reduce = jax.jit(lambda *xs: sum(xs))


def timeit(name, fn, trials=3):
    t0 = time.perf_counter()
    _ = float(_reduce(fn(0)))
    print(f"{name:36s} compile {time.perf_counter()-t0:6.1f} s",
          file=sys.stderr, flush=True)
    best = 1e9
    for t in range(trials):
        t0 = time.perf_counter()
        cs = [fn(1 + t * K + i) for i in range(K)]
        _ = float(_reduce(*cs))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:36s} {best * 1e3:7.1f} ms/run", file=sys.stderr,
          flush=True)
    return best


print("devices:", jax.devices(), file=sys.stderr, flush=True)
frames = jnp.asarray(make_frames(N_FRAMES, H, W))
jax.block_until_ready(frames)


@jax.jit
def align_unpacked(stack, eps):
    s = stack + eps
    ref = s[0]
    dys, dxs, confs = jax.vmap(
        lambda f: _phase_correlate_traced(ref, f))(s[1:])
    return jnp.sum(dys) + jnp.sum(dxs) + jnp.sum(confs)


@jax.jit
def align_packed(stack, eps):
    s = stack + eps
    dys, dxs, confs = phase_correlate_stack(s[0], s[1:])
    return jnp.sum(dys) + jnp.sum(dxs) + jnp.sum(confs)


af = lambda i: (frames, jnp.float32(i * 1e-6))  # noqa: E731
timeit("align unpacked (r1)", lambda i: align_unpacked(*af(i)))
timeit("align packed (rfft pairs)", lambda i: align_packed(*af(i)))

# ---- STF breakdown on a 4096² plane ----
from astroburst_tpu.imaging.stf import apply_stf_traced  # noqa: E402
from astroburst_tpu.ops.ipc import nearest_downsample  # noqa: E402

rng = np.random.default_rng(0)
plane = jnp.asarray(rng.normal(1000, 300, (4096, 4096)).astype(np.float32))
jax.block_until_ready(plane)
mn, mx = jnp.float32(0.0), jnp.float32(4000.0)


@jax.jit
def stf_f32(x, sh):
    out = apply_stf_traced(x, mn, mx, sh, jnp.float32(0.3))
    return out[0, 0] + out[-1, -1]


@jax.jit
def stf_u8(x, sh):
    out = apply_stf_traced(x, mn, mx, sh, jnp.float32(0.3), as_u8=True)
    return (out[0, 0] + out[-1, -1]).astype(jnp.float32)


@jax.jit
def stf_u8_ds(x, sh):
    out = apply_stf_traced(x, mn, mx, sh, jnp.float32(0.3), as_u8=True)
    small = nearest_downsample(out, 2048)
    return (small[0, 0] + small[-1, -1]).astype(jnp.float32)


pf = lambda i: (plane, jnp.float32(0.01 + i * 1e-5))  # noqa: E731
timeit("stf f32 4096^2", lambda i: stf_f32(*pf(i)))
timeit("stf u8 4096^2", lambda i: stf_u8(*pf(i)))
timeit("stf u8 + 2048 downsample", lambda i: stf_u8_ds(*pf(i)))
