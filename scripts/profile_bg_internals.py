"""Dissect background-estimation + normalize internals on TPU."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from astroburst_tpu.analysis import star_detection as SD
from astroburst_tpu.analysis.tile_sort_kernel import sort_tiles_pallas

H, W = 5655, 2206
STEP = 256


def timeit(label, fn, K=8, trials=3):
    reduce_all = jax.jit(lambda *xs: sum(xs))
    _ = float(fn(0))
    best = 1e9
    for t in range(trials):
        t0 = time.perf_counter()
        cs = [fn(t * K + i + 1) for i in range(K)]
        _ = float(reduce_all(*cs))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label}: {best * 1e3:.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(100, 8, (H, W)).astype(np.float32))
    jax.block_until_ready(img)
    ty = -(-H // STEP)
    tx = -(-W // STEP)
    pad_shape = (ty * STEP, tx * STEP)

    @jax.jit
    def pad_only(x, eps):
        p = jnp.pad(x + eps, ((0, pad_shape[0] - H), (0, pad_shape[1] - W)),
                    constant_values=jnp.nan)
        return p[0, 0] + p[-1, -1]
    timeit("pad", lambda i: pad_only(img, jnp.float32(i * 1e-6)))

    @jax.jit
    def sort_only(x, eps):
        p = jnp.pad(x + eps, ((0, pad_shape[0] - H), (0, pad_shape[1] - W)),
                    constant_values=jnp.nan)
        rows, cnt = sort_tiles_pallas(p, STEP)
        return rows[0, 0] + rows[-1, -1] + cnt.sum().astype(jnp.float32)
    timeit("pad+sort_tiles(incl count)", lambda i: sort_only(
        img, jnp.float32(i * 1e-6)))

    from astroburst_tpu.analysis.tile_sort_kernel import _make_tile_sort_kernel
    from jax.experimental import pallas as pl

    @jax.jit
    def sort_kernel_only(x, eps):
        p = jnp.pad(x + eps, ((0, pad_shape[0] - H), (0, pad_shape[1] - W)),
                    constant_values=jnp.nan)
        kernel = _make_tile_sort_kernel(STEP)
        out = pl.pallas_call(
            kernel, grid=(ty, tx),
            in_specs=[pl.BlockSpec((STEP, STEP), lambda i, j: (i, j))],
            out_specs=pl.BlockSpec((1, 1, STEP, STEP),
                                   lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((ty, tx, STEP, STEP),
                                           jnp.float32),
        )(p)
        return out[0, 0, 0, 0] + out[-1, -1, -1, -1]
    timeit("pad+sort kernel (no count)", lambda i: sort_kernel_only(
        img, jnp.float32(i * 1e-6)))

    @jax.jit
    def stats_only(rows, cnt, eps):
        med, sig = SD._tile_sigma_clipped(rows + eps, cnt)
        return med.sum() + sig.sum()
    p = jnp.pad(img, ((0, pad_shape[0] - H), (0, pad_shape[1] - W)),
                constant_values=jnp.nan)
    rows, cnt = sort_tiles_pallas(p, STEP)
    jax.block_until_ready((rows, cnt))
    timeit("tile_sigma_clipped stats", lambda i: stats_only(
        rows, cnt, jnp.float32(i * 1e-9)))

    # normalize internals
    from astroburst_tpu.alignment import affine as A

    @jax.jit
    def sample_sort(x, eps):
        rows_, cols = x.shape
        n_rows = max(min(-(-100_000 // cols), rows_), 1)
        ridx = jnp.minimum(
            (jnp.arange(n_rows) * (rows_ / n_rows)).astype(jnp.int32),
            rows_ - 1)
        samples = jnp.take(x + eps, ridx, axis=0).reshape(-1)
        finite = jnp.isfinite(samples)
        svals = jnp.sort(jnp.where(finite, samples, jnp.inf))
        return svals[0] + svals[-1]
    timeit("normalize: sample+sort", lambda i: sample_sort(
        img, jnp.float32(i * 1e-6)))

    @jax.jit
    def clip_write(x, lo, rng_, eps):
        out = jnp.clip((x + eps - lo) / rng_, 0.0, 1.0)
        return out[0, 0] + out[-1, -1]
    timeit("normalize: clip write", lambda i: clip_write(
        img, jnp.float32(90.0), jnp.float32(30.0), jnp.float32(i * 1e-6)))


if __name__ == "__main__":
    main()
