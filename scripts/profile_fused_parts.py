"""Time each stage of the fused align chain on TPU: K-batched
dispatches with per-dispatch eps inputs, checksums reduced on device,
ONE scalar fetch (block_until_ready does not wait on axon)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench_ops
from astroburst_tpu.alignment import affine as A
from astroburst_tpu.alignment import fused_chain as FC
from astroburst_tpu.alignment.vote_kernel import vote_pallas
from astroburst_tpu.analysis import star_detection as SD

H, W = 5655, 2206
K = 8
SALT = (os.getpid() % 1000) * 1e-5


def timed(name, fn, arg, trials=3):
    def cs(x, e):
        out = fn(x + e)
        return sum(jnp.sum(o.astype(jnp.float32))
                   for o in jax.tree.leaves(out))
    cs_fn = jax.jit(cs)
    red = jax.jit(lambda *c: sum(c))
    w = cs_fn(arg, jnp.float32(SALT))
    _ = float(red(w, w))
    best = 1e9
    for t in range(trials):
        t0 = time.perf_counter()
        c = [cs_fn(arg, jnp.float32(SALT + (t * K + i + 1) * 1e-6))
             for i in range(K)]
        _ = float(red(*c))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:40s} {best * 1e3:7.2f} ms/run", flush=True)


def main():
    base = bench_ops._star_field(H, W, 90, seed=8, amp=5000.0, fwhm=3.0,
                                 halos=True)
    plane = jnp.asarray(base)
    jax.block_until_ready(plane)
    print("backend:", jax.default_backend(), flush=True)

    tile = min(max(min(H, W) // 8, 32), 256)
    mp = SD.MAX_PEAKS
    print("tile:", tile, "max_peaks:", mp, flush=True)

    norm = lambda p: A._normalize_kernel(p)[0]
    timed("normalize", norm, plane)
    timed("norm+background", lambda p: SD._estimate_background_kernel(
        norm(p), tile), plane)

    def to_packed(p):
        pn = norm(p)
        bm, bs = SD._estimate_background_kernel(pn, tile)
        return SD._detect_kernel(pn, bm, bs, A.DETECTION_SIGMA, mp)

    timed("+detect kernel", to_packed, plane)
    timed("+dedupe scan", lambda p: FC._dedupe_topk(to_packed(p)), plane)

    def to_tri(p):
        xs, ys, n = FC._dedupe_topk(to_packed(p))
        return FC._device_triangles(xs, ys)

    timed("+triangles", to_tri, plane)

    def to_votes(p):
        rt, vt = to_tri(p)
        return vote_pallas(rt, vt, rt, vt)

    timed("+vote kernel (self)", to_votes, plane)
    timed("+greedy match", lambda p: FC._greedy_match(to_votes(p)), plane)

    def full(p):
        w, info = FC._fused_align_warp(
            p, p + 0.5, tile, mp, 128, 128, 7, 7)
        return info

    timed("FULL fused chain (incl warp)", full, plane)


if __name__ == "__main__":
    main()
