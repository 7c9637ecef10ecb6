"""Profile the coarse box-downsample internals on TPU: cast pass vs
lane-stage matmul vs row-stage einsum, K-batched single-fetch."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from astroburst_tpu.alignment import phase_correlation as PC

F, R, C = 15, 5656, 2304
K = 8


def timed(name, fn, stacks):
    outs = [fn(s) for s in stacks]  # warm/compile
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(s) for s in stacks]
    red = jax.jit(lambda xs: sum(jnp.sum(x) for x in xs))(outs)
    float(red)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"{name:35s} {dt / K:7.2f} ms/run", flush=True)


def main():
    rng = np.random.default_rng(0)
    base = rng.normal(0.2, 0.05, (F, R, C)).astype(np.float32)
    stacks = [jnp.asarray(base + i * 1e-6) for i in range(K)]
    jax.block_until_ready(stacks)
    print("backend:", jax.default_backend(), flush=True)

    by = -(-R // 512)
    bx = -(-C // 512)
    ds_r, ds_c = R // by, C // bx
    mr = PC._box_matrix(ds_r, by, R)
    mc = PC._box_matrix(ds_c, bx, C)
    mr16 = jnp.asarray(mr, jnp.bfloat16)
    mc16 = jnp.asarray(mc, jnp.bfloat16)

    @jax.jit
    def cast_only(x):
        return x.astype(jnp.bfloat16)

    @jax.jit
    def lane_stage(x):
        x16 = x.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            x16, mc16.T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @jax.jit
    def full(x):
        ds, _, _ = PC._coarse_box_downsample(x, 512)
        return ds

    @jax.jit
    def lane_f32_direct(x):
        # no cast pass: f32 input, DEFAULT precision (bf16 MXU passes)
        return jax.lax.dot_general(
            x, jnp.asarray(mc, jnp.float32).T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @jax.jit
    def full_f32_default(x):
        tmp = jax.lax.dot_general(
            x, jnp.asarray(mc, jnp.float32).T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.einsum("rh,fhc->frc", jnp.asarray(mr, jnp.float32), tmp)

    @jax.jit
    def row_first(x):
        # contract the sublane axis first: [ds_r, R] @ [F, R, C]
        tmp = jnp.einsum("rh,fhc->frc", mr16,
                         x.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            tmp, jnp.asarray(mc, jnp.float32).T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    timed("cast f32->bf16 only", cast_only, stacks)
    timed("cast + lane matmul", lane_stage, stacks)
    timed("lane matmul f32 DEFAULT (no cast)", lane_f32_direct, stacks)
    timed("full coarse (current bf16)", full, stacks)
    timed("full coarse f32 DEFAULT", full_f32_default, stacks)
    timed("full coarse row-first bf16", row_first, stacks)


if __name__ == "__main__":
    main()
