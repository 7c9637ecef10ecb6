"""Device-side dissection of the affine chain's dispatches: background
kernel, detect kernel, fused pair detect, vote kernel — K-batched with
eps-differentiated inputs, one scalar fetch."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench_ops
from astroburst_tpu.alignment import affine as A
from astroburst_tpu.analysis import star_detection as SD

H, W = 5655, 2206
TILE = min(max(min(H, W) // 8, 32), 256)


def timeit(label, fn, K=8, trials=3):
    reduce_all = jax.jit(lambda *xs: sum(xs))
    _ = float(fn(0))
    best = 1e9
    for t in range(trials):
        t0 = time.perf_counter()
        cs = [fn(t * K + i + 1) for i in range(K)]
        _ = float(reduce_all(*cs))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label}: {best * 1e3:.1f} ms", flush=True)


def main():
    base = bench_ops._star_field(H, W, 90, seed=8, amp=5000.0, fwhm=3.0,
                                 halos=True)
    img = jnp.asarray(base)
    jax.block_until_ready(img)

    @jax.jit
    def bg_only(x, eps):
        m, s = SD._estimate_background_kernel(x + eps, TILE)
        return m + s
    timeit("background kernel", lambda i: bg_only(img, jnp.float32(i * 1e-6)))

    @jax.jit
    def norm_only(x, eps):
        return A._normalize_kernel(x + eps)[0][0, 0]
    timeit("normalize kernel", lambda i: norm_only(img, jnp.float32(i * 1e-6)))

    @jax.jit
    def det_only(x, eps):
        packed = SD._detect_kernel(x + eps, jnp.float32(100.0),
                                   jnp.float32(5.0), 3.5, 1024)
        return packed[0, 0] + packed[8].sum()
    timeit("detect kernel (given bg)", lambda i: det_only(
        img, jnp.float32(i * 1e-6)))

    @jax.jit
    def det_only_256(x, eps):
        packed = SD._detect_kernel(x + eps, jnp.float32(100.0),
                                   jnp.float32(5.0), 3.5, 256)
        return packed[0, 0] + packed[8].sum()
    timeit("detect kernel (256 peaks)", lambda i: det_only_256(
        img, jnp.float32(i * 1e-6)))

    @jax.jit
    def fused_one(x, eps):
        p = SD._detect_fused(x + eps, TILE, 3.5, 1024)
        return p[0, 0] + p[8].sum()
    timeit("fused bg+detect (1 plane)", lambda i: fused_one(
        img, jnp.float32(i * 1e-6)))

    # vote kernel with distinct inputs via ratio eps
    n = 60
    rng = np.random.default_rng(0)
    stars = rng.random((n, 2)).astype(np.float64) * 2000
    verts, ratios = A.build_triangles(stars)
    rv, rr = A._pad_tris(verts, ratios)
    rvj, rrj = jnp.asarray(rv), jnp.asarray(rr)

    @jax.jit
    def vote(eps):
        return A._vote_kernel(rrj + eps, rvj, rrj, rvj,
                              A._STAR_CAP, A._STAR_CAP).sum()
    timeit("vote kernel", lambda i: vote(jnp.float32(i * 1e-9)))


if __name__ == "__main__":
    main()
