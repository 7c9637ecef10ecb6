"""Measure the fused align+warp chain on TPU at bench scale
(5655×2206, 90 stars, 0.4° rotation) vs the host-orchestrated chain."""

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

H, W = 5655, 2206


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
    print("backend:", jax.default_backend(), flush=True)

    t0 = time.perf_counter()
    warped, res = FC.align_and_warp(ref_d, tgt_d)
    warped.block_until_ready()
    print(f"compile+run: {time.perf_counter() - t0:.1f} s", flush=True)
    print("method:", res.method, "matches:", res.matched_stars,
          "inliers:", res.inliers, "resid:", round(res.residual_px, 3),
          "rot:", round(res.transform.rotation_deg(), 4), flush=True)

    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        warped, res = FC.align_and_warp(ref_d, tgt_d)
        warped.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"fused align_and_warp best-of-5: {best * 1e3:.1f} ms",
          flush=True)

    # host chain for comparison
    def run_host():
        r = A.align_channel_affine(ref_d, tgt_d)
        w = A.warp_image(tgt_d, r.transform, H, W)
        w.block_until_ready()
        return r
    run_host()
    bh = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        run_host()
        bh = min(bh, time.perf_counter() - t0)
    print(f"host chain best-of-3: {bh * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
