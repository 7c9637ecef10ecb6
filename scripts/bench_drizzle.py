"""Drizzle benchmark at the reference's published config.

Reference row (BASELINE.md / tex:614): "Drizzle 2×, 10×64 MB (flat
accumulator) — 4.2 s" on a Ryzen 9 7950X. Here: 10 frames of
4096×4096 f32, scale 2.0, default pixfrac 0.7, square kernel,
5 sigma-clip iterations, EXACT push-list parity mode
(stacking/drizzle.py:_drizzle_kernel_exact).

Measured the tunnel-safe way: K dispatches with distinct inputs,
checksums reduced on device, ONE scalar fetch.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(n=10, size=4096, scale=2.0, pixfrac=0.7, iters=5, K=3,
         exact=True, band_rows=64):
    import jax
    import jax.numpy as jnp

    from astroburst_tpu.dtypes import DrizzleKernel
    from astroburst_tpu.stacking.drizzle import (_drizzle_kernel,
                                                 _drizzle_kernel_exact)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(5)
    frames = rng.normal(100.0, 8.0, (n, size, size)).astype(np.float32)
    stack = jnp.asarray(frames)
    d_ys = jnp.asarray(rng.uniform(-2, 2, n), jnp.float32)
    d_xs = jnp.asarray(rng.uniform(-2, 2, n), jnp.float32)
    out_dim = int(size * scale)

    kern = _drizzle_kernel_exact if exact else _drizzle_kernel
    kw = dict(band_rows=band_rows) if exact else {}

    def run(s, eps):
        img, wgt, rej = kern(s + eps, d_ys, d_xs, scale, pixfrac,
                             DrizzleKernel.SQUARE, out_dim, out_dim,
                             3.0, 3.0, iters, **kw)
        return img[0, 0] + img[-1, -1] + wgt[100, 100] + \
            rej.astype(jnp.float32)

    run_j = jax.jit(run)
    t0 = time.perf_counter()
    c = float(run_j(stack, jnp.float32(0.0)))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s  cs={c:.3f}",
          file=sys.stderr)

    reduce_all = jax.jit(lambda *xs: sum(xs))
    times = []
    for trial in range(3):
        t0 = time.perf_counter()
        cs = [run_j(stack, jnp.float32((trial * K + i + 1) * 1e-6))
              for i in range(K)]
        _ = float(reduce_all(*cs))
        times.append((time.perf_counter() - t0) / K)
    best = min(times)
    print(f"per-run: {[f'{t:.3f}s' for t in times]}", file=sys.stderr)
    mpx_in = n * size * size / 1e6
    print(f"drizzle {'exact' if exact else 'preavg'} {n}x{size}^2 -> "
          f"{out_dim}^2 scale={scale} pixfrac={pixfrac} iters={iters} "
          f"band={band_rows}: {best:.3f} s  ({mpx_in / best:.1f} Mpx/s in, "
          f"ref 4.2 s)")
    return best


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--size", type=int, default=4096)
    p.add_argument("--scale", type=float, default=2.0)
    p.add_argument("--pixfrac", type=float, default=0.7)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--K", type=int, default=3)
    p.add_argument("--band", type=int, default=64)
    p.add_argument("--preavg", action="store_true")
    a = p.parse_args()
    main(a.n, a.size, a.scale, a.pixfrac, a.iters, a.K,
         exact=not a.preavg, band_rows=a.band)
