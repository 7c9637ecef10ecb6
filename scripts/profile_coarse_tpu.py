"""Profile the coarse box-downsample internals on TPU: cast pass vs
lane-stage matmul vs row-stage einsum. K-batched dispatches with
distinct inputs, checksums reduced on device, ONE scalar fetch
(block_until_ready does NOT wait for remote completion on axon)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from astroburst_tpu.alignment import phase_correlation as PC

F, R, C = 15, 5656, 2304
K = 10
SALT = (os.getpid() % 1000) * 1e-5   # dodge the server result cache


def timed(name, fn, stack, trials=3):
    cs_fn = jax.jit(lambda x, e: jnp.sum(fn(x + e)))
    red = jax.jit(lambda *cs: sum(cs))
    w = cs_fn(stack, jnp.float32(SALT))
    _ = float(red(w, w))
    best = 1e9
    for t in range(trials):
        t0 = time.perf_counter()
        cs = [cs_fn(stack, jnp.float32(SALT + (t * K + i + 1) * 1e-6))
              for i in range(K)]
        _ = float(red(*cs))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:35s} {best * 1e3:7.2f} ms/run", flush=True)


def main():
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.normal(0.2, 0.05, (F, R, C)).astype(np.float32))
    jax.block_until_ready(stack)
    print("backend:", jax.default_backend(), flush=True)

    by = -(-R // 512)
    bx = -(-C // 512)
    ds_r, ds_c = R // by, C // bx
    print("box:", by, bx, "ds:", ds_r, ds_c, flush=True)
    mr = PC._box_matrix(ds_r, by, R)
    mc = PC._box_matrix(ds_c, bx, C)
    mr16 = jnp.asarray(mr, jnp.bfloat16)
    mc16 = jnp.asarray(mc, jnp.bfloat16)

    def cast_only(x):
        return x.astype(jnp.bfloat16)

    def lane_stage(x):
        x16 = x.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            x16, mc16.T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def full(x):
        ds, _, _ = PC._coarse_box_downsample(x, 512)
        return ds

    def full_f32_default(x):
        tmp = jax.lax.dot_general(
            x, jnp.asarray(mc, jnp.float32).T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        return jnp.einsum("rh,fhc->frc", jnp.asarray(mr, jnp.float32), tmp,
                          precision=jax.lax.Precision.DEFAULT)

    def row_first(x):
        tmp = jnp.einsum("rh,fhc->frc", mr16, x.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            tmp, jnp.asarray(mc, jnp.float32).T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    timed("cast f32->bf16 only", cast_only, stack)
    timed("cast + lane matmul", lane_stage, stack)
    timed("full coarse (current bf16)", full, stack)
    timed("full coarse f32 DEFAULT", full_f32_default, stack)
    timed("full coarse row-first bf16", row_first, stack)


if __name__ == "__main__":
    main()
