"""Time each stage of the fused align chain on TPU as separate jits
(K-batched, single scalar fetch per timing) to find the hot stages."""

import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench_ops
from astroburst_tpu.alignment import affine as A
from astroburst_tpu.alignment import fused_chain as FC
from astroburst_tpu.analysis import star_detection as SD

H, W = 5655, 2206
K = 6


def timed(name, fn, args_list):
    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list]
    red = jax.jit(lambda xs: sum(jnp.sum(jnp.atleast_1d(o))
                                 for x in xs for o in jax.tree.leaves(x)))(
        outs)
    float(red)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"{name:40s} {dt / K:7.2f} ms/run", flush=True)
    return outs[0]


def main():
    base = bench_ops._star_field(H, W, 90, seed=8, amp=5000.0, fwhm=3.0,
                                 halos=True)
    planes = [jnp.asarray(base + i * 1e-6) for i in range(K)]
    jax.block_until_ready(planes)
    print("backend:", jax.default_backend(), flush=True)

    tile = min(max(min(H, W) // 8, 32), 256)
    mp = SD.MAX_PEAKS
    print("tile:", tile, "max_peaks:", mp, flush=True)

    norm = jax.jit(lambda p: A._normalize_kernel(p)[0])
    bg = jax.jit(lambda p: SD._estimate_background_kernel(p, tile))
    det = jax.jit(lambda p, bm, bs: SD._detect_kernel(
        p, bm, bs, A.DETECTION_SIGMA, mp))
    dedupe = jax.jit(FC._dedupe_topk)
    tri = jax.jit(FC._device_triangles)

    n_list = timed("normalize", norm, [(p,) for p in planes])
    bg_list = [bg(norm(p)) for p in planes]
    jax.block_until_ready(bg_list)
    timed("background estimate", bg, [(norm(p),) for p in planes])
    packed = timed("detect kernel", det,
                   [(norm(p),) + bg(norm(p)) for p in planes])
    dd = timed(f"dedupe scan ({mp} steps)", dedupe,
               [(det(norm(p), *bg(norm(p))),) for p in planes])
    xs, ys, n = dd
    timed("triangles", tri, [(xs, ys)] * K)

    rr_t, rv_t = tri(xs, ys)
    from astroburst_tpu.alignment.vote_kernel import vote_pallas
    vote = jax.jit(lambda a, b, c, d: vote_pallas(a, b, c, d))
    votes = timed("vote kernel", vote, [(rr_t, rv_t, rr_t, rv_t)] * K)

    gm = jax.jit(FC._greedy_match)
    timed("greedy match (64-step scan)", gm, [(votes,)] * K)

    ris, tis, cnt = gm(votes)
    mvalid = jnp.arange(FC.STAR_CAP) < cnt
    mx = jnp.where(mvalid, jnp.take(xs, ris), 0.0)
    my = jnp.where(mvalid, jnp.take(ys, ris), 0.0)

    rans = jax.jit(lambda a, b, c, d, e, f: FC._ransac_device(
        a, b, c, d, e, f, H, W, "affine"))
    timed("ransac (2000 hyp)", rans,
          [(mx, my, mx, my, mvalid, cnt)] * K)


if __name__ == "__main__":
    main()
