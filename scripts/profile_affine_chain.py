"""Wall-clock dissection of the end-to-end affine alignment chain
(bench_ops.bench_affine_align workload): detect pair → star lists →
triangles → vote → RANSAC → warp. Each stage timed host-side over the
best of 3 repeats, since the chain is fetch/host/dispatch interleaved.
"""

import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench_ops
from astroburst_tpu.alignment import affine as A
from astroburst_tpu.alignment.warp_shear import warp_shear
from astroburst_tpu.analysis.star_detection import detect_stars_pair

H, W = 5655, 2206


def best3(fn):
    b = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn()
        b = min(b, time.perf_counter() - t0)
    return b * 1e3, r


def main():
    base = bench_ops._star_field(H, W, 90, seed=8, amp=5000.0, fwhm=3.0,
                                 halos=True)
    th = math.radians(0.4)
    ct, st = math.cos(th), math.sin(th)
    cy, cx = H / 2.0, W / 2.0
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    sx = ct * (xx - cx) - st * (yy - cy) + cx + 3.2
    sy = st * (xx - cx) + ct * (yy - cy) + cy - 2.1
    xi = np.clip(sx.astype(np.int32), 0, W - 1)
    yi = np.clip(sy.astype(np.int32), 0, H - 1)
    target = base[yi, xi] + np.random.default_rng(9).normal(
        0, 1.5, (H, W)).astype(np.float32)

    ref_d = jnp.asarray(base)
    tgt_d = jnp.asarray(target)
    jax.block_until_ready((ref_d, tgt_d))

    # warm everything once
    res = A.align_channel_affine(ref_d, tgt_d)
    w = warp_shear(tgt_d, res.transform, H, W)
    w.block_until_ready()
    print("method:", res.method, flush=True)

    ms, dets = best3(lambda: detect_stars_pair(
        A.normalize_for_detection(ref_d), A.normalize_for_detection(tgt_d),
        A.DETECTION_SIGMA))
    print(f"detect_pair (incl fetch): {ms:.1f} ms", flush=True)
    ref_det, tgt_det = dets

    ms, lists = best3(lambda: (
        np.array([(s.x, s.y) for s in ref_det.stars[:A.MAX_STARS]]),
        np.array([(s.x, s.y) for s in tgt_det.stars[:A.MAX_STARS]])))
    print(f"star lists: {ms:.2f} ms  (n={len(lists[0])},{len(lists[1])})",
          flush=True)
    ref_stars, tgt_stars = lists

    ms, tris = best3(lambda: (A.build_triangles(ref_stars),
                              A.build_triangles(tgt_stars)))
    print(f"build_triangles x2: {ms:.1f} ms "
          f"(T={len(tris[0][0])},{len(tris[1][0])})", flush=True)
    ref_tris, tgt_tris = tris

    ms, matches = best3(lambda: A.match_triangles(
        ref_stars, tgt_stars, ref_tris, tgt_tris))
    print(f"match_triangles (vote+fetch+greedy): {ms:.1f} ms "
          f"(matches={len(matches)})", flush=True)

    # vote kernel device-side alone (no fetch): dispatch + sync via
    # one-scalar checksum
    rv, rr = A._pad_tris(*ref_tris)
    tv, tr = A._pad_tris(*tgt_tris)
    args = [jnp.asarray(x) for x in (rr, rv, tr, tv)]
    cs = jax.jit(lambda *a: A._vote_kernel(*a, A._STAR_CAP, A._STAR_CAP
                                           ).sum())
    _ = float(cs(*args))
    K = 8
    t0 = time.perf_counter()
    vals = [A._vote_kernel(*args, A._STAR_CAP, A._STAR_CAP).sum()
            for _ in range(K)]
    _ = float(jax.jit(lambda *xs: sum(xs))(*vals))
    print(f"vote kernel device (K-batched): "
          f"{(time.perf_counter() - t0) / K * 1e3:.1f} ms", flush=True)

    ms, result = best3(lambda: A.ransac_affine(matches, "affine"))
    print(f"ransac_affine: {ms:.1f} ms", flush=True)

    def do_warp():
        o = warp_shear(tgt_d, result.transform, H, W)
        o.block_until_ready()
        return o
    ms, _ = best3(do_warp)
    print(f"warp (block_until_ready): {ms:.1f} ms", flush=True)

    ms, _ = best3(lambda: A.align_channel_affine(ref_d, tgt_d))
    print(f"FULL align_channel_affine: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
