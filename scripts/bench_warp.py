"""TPU micro-bench: shear-decomposed warp vs two-pass gather warp.

16 Mpx plane (4096x4096), small rotation + scale (the compose channel
align case). Measurement protocol per CLAUDE.md: K dispatches with
distinct inputs, checksums reduced on device, ONE scalar fetch.
"""

import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from astroburst_tpu.alignment.affine import (AffineTransform,  # noqa: E402
                                             _warp_two_pass_kernel)
from astroburst_tpu.alignment.warp_shear import warp_shear  # noqa: E402

H = W = 4096
K = 12
_reduce = jax.jit(lambda *xs: sum(xs))


def rot(deg, scale=1.0):
    th = math.radians(deg)
    ct, st = math.cos(th) * scale, math.sin(th) * scale
    cx = cy = H / 2
    return AffineTransform(a=ct, b=-st, tx=cx - ct * cx + st * cy,
                           c=st, d=ct, ty=cy - st * cx - ct * cy)


def timeit(name, fn, trials=3):
    t0 = time.perf_counter()
    _ = float(_reduce(fn(0)))
    print(f"{name:34s} compile {time.perf_counter()-t0:6.1f} s",
          file=sys.stderr, flush=True)
    best = 1e9
    for t in range(trials):
        t0 = time.perf_counter()
        cs = [fn(1 + t * K + i) for i in range(K)]
        _ = float(_reduce(*cs))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:34s} {best * 1e3:7.1f} ms/run", file=sys.stderr, flush=True)
    return best


print("devices:", jax.devices(), file=sys.stderr, flush=True)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(100, 10, (H, W)).astype(np.float32))
jax.block_until_ready(img)

for name, t in [("rot1deg", rot(1.0)), ("rot5deg", rot(5.0)),
                ("rot1+scale1.1", rot(1.0, 1.1))]:
    params = jnp.asarray(t.as_tuple(), jnp.float32)

    def shear_fn(i, t=t):
        out = warp_shear(img + jnp.float32(i * 1e-6), t, H, W)
        return out[0, 0] + out[H // 2, W // 2]

    def twopass_fn(i, params=params):
        out = _warp_two_pass_kernel(img + jnp.float32(i * 1e-6), params, H, W)
        return out[0, 0] + out[H // 2, W // 2]

    timeit(f"shear {name}", shear_fn)
    timeit(f"two-pass {name}", twopass_fn)
