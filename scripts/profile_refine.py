"""Stage-dissection profile of the align refine (VERDICT r3 task 5).

The 512² refine was ~7 ms of the ~13 ms align at 15×16 Mpx with no
breakdown. Times each sub-stage K-batched with one scalar fetch:
crops → +window+FFT → +cross-power+inverse → +peak/confidence, plus a
four-step lane-split A/B (512 = 16×32 leaves half of each 128-lane
register idle; 4×128 fills them at the same FLOPs).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from astroburst_tpu.alignment import phase_correlation as PC
from astroburst_tpu.ops import fft as F

N, H, W = 15, 5655, 2206
CROP = PC.REFINE_CROP_SIZE


def timeit(fn, *args, K=8, trials=3):
    reduce_all = jax.jit(lambda *xs: sum(xs))
    _ = float(fn(*args, jnp.float32(0.0)))
    best = 1e9
    for t in range(trials):
        t0 = time.perf_counter()
        cs = [fn(*args, jnp.float32((t * K + i + 1) * 1e-6)) for i in range(K)]
        _ = float(reduce_all(*cs))
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    frames = rng.normal(100, 6, (N, H, W)).astype(np.float32)
    stack = jnp.asarray(frames)
    ref = stack[0]
    jax.block_until_ready(stack)
    cys = jnp.asarray(rng.integers(H // 2 - 12, H // 2 + 12, N), jnp.int32)
    cxs = jnp.asarray(rng.integers(W // 2 - 12, W // 2 + 12, N), jnp.int32)

    @jax.jit
    def crops_only(stack, cys, cxs, eps):
        def one(f, cy, cx):
            return PC._dynamic_crop(f, cy, cx, CROP)
        crops = jax.vmap(one)(stack, cys, cxs)
        return jnp.sum(crops[:, 0, 0]) + crops[0, -1, -1] + eps

    print(f"crops only (15x dyn slice 512^2): "
          f"{timeit(crops_only, stack, cys, cxs):.2f} ms", flush=True)

    @jax.jit
    def crops_fft(stack, cys, cxs, eps):
        def one(f, cy, cx):
            c = PC._dynamic_crop(f, cy, cx, CROP)
            p = PC._windowed_padded(c, 512, 512)
            fr, fi = F.fft2_real(p)
            return fr[0, 0] + fi[5, 5]
        return jnp.sum(jax.vmap(one)(stack, cys, cxs)) + eps

    print(f"crops+window+fft2_real: "
          f"{timeit(crops_fft, stack, cys, cxs):.2f} ms", flush=True)

    @jax.jit
    def full_corr(stack, cys, cxs, eps):
        refc = PC._centered_crop_static(ref, CROP)
        rp = PC._windowed_padded(refc, 512, 512)
        rr, ri = F.fft2_real(rp)

        def one(f, cy, cx):
            c = PC._dynamic_crop(f, cy, cx, CROP)
            p = PC._windowed_padded(c, 512, 512)
            fr, fi = F.fft2_real(p)
            cr, ci = F.cross_power(fr, fi, rr, ri, PC.EPSILON)
            corr = F.ifft2_real(cr, ci)
            return corr[0, 0] + corr[100, 100]
        return jnp.sum(jax.vmap(one)(stack, cys, cxs)) + eps

    print(f"+cross-power+ifft: "
          f"{timeit(full_corr, stack, cys, cxs):.2f} ms", flush=True)

    @jax.jit
    def full_refine(stack, cys, cxs, eps):
        refc = PC._centered_crop_static(ref, CROP)

        def one(f, cy, cx):
            c = PC._dynamic_crop(f, cy, cx, CROP)
            dy, dx, conf = PC.correlate_single(refc, c)
            return dy + dx + conf
        return jnp.sum(jax.vmap(one)(stack, cys, cxs)) + eps

    print(f"full refine (correlate_single): "
          f"{timeit(full_refine, stack, cys, cxs):.2f} ms", flush=True)

    @jax.jit
    def full_align(stack, eps):
        def est(frame):
            dy, dx, c = PC._phase_correlate_traced(ref, frame)
            return dy + dx + c
        return jnp.sum(jax.vmap(est)(stack[1:])) + eps

    print(f"FULL align (coarse+refine, 15 frames): "
          f"{timeit(full_align, stack):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
