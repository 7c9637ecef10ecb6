"""A/B the Pallas coarse box-downsample + padded align path vs the XLA
matmul / view path at the headline shape (16×5655×2206).

Methodology per CLAUDE.md: K batched dispatches with distinct salted
inputs, checksums folded INTO each jitted call, reduced on device, ONE
scalar fetch; best of 3 trials.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N, H, W = 16, 5655, 2206
_SALT = (os.getpid() % 1000) * 1e-5
K = 10


def bench(name, fn, *args):
    _ = float(fn(*args, jnp.float32(0.0)))
    reduce_all = jax.jit(lambda *xs: sum(xs))
    best = 1e9
    for t in range(3):
        t0 = time.perf_counter()
        cs = [fn(*args, jnp.float32(_SALT + (t * K + i + 1) * 1e-6))
              for i in range(K)]
        _ = float(reduce_all(*cs))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name}: {best * 1e3:.2f} ms", flush=True)
    return best * 1e3


def main():
    from astroburst_tpu.alignment.coarse_kernel import (
        coarse_downsample_stack, plan)
    from astroburst_tpu.alignment.phase_correlation import (
        COARSE_MAX_DIM, _coarse_box_downsample,
        phase_correlate_stack_padded, phase_correlate_stack_traced)
    from astroburst_tpu.stacking.onepass_kernel import pad_stack_aligned

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(3)
    base = rng.normal(1000, 50, (H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H:8, 0:W:8].astype(np.float32)
    frames = np.stack([
        np.roll(np.roll(base, int(dy), 0), int(dx), 1)
        + rng.normal(0, 5, (H, W)).astype(np.float32)
        for dy, dx in rng.uniform(-5, 5, (N, 2))])
    stack = pad_stack_aligned(jnp.asarray(frames))
    jax.block_until_ready(stack)
    print("padded:", stack.shape, "plan:",
          plan(N, stack.shape[1], stack.shape[2], H, W, COARSE_MAX_DIM),
          flush=True)

    view = stack[:, :H, :W]
    ref = view[0]
    tgts = view[1:]
    jax.block_until_ready((ref, tgts))

    @jax.jit
    def coarse_xla(r, t, eps):
        r_ds, by, bx = _coarse_box_downsample(r, COARSE_MAX_DIM)
        t_ds, _, _ = _coarse_box_downsample(t, COARSE_MAX_DIM)
        return jnp.sum(r_ds) + jnp.sum(t_ds) * 1e-3 + eps

    @jax.jit
    def coarse_pallas(s, eps):
        ds, by, bx = coarse_downsample_stack(s, (H, W), COARSE_MAX_DIM)
        return jnp.sum(ds[0]) + jnp.sum(ds[1:]) * 1e-3 + eps

    @jax.jit
    def align_old(r, t, eps):
        dys, dxs, confs = phase_correlate_stack_traced(r, t)
        return jnp.sum(dys) + jnp.sum(dxs) + jnp.sum(confs) + eps

    @jax.jit
    def align_new(s, eps):
        dys, dxs, confs = phase_correlate_stack_padded(s, (H, W))
        return jnp.sum(dys) + jnp.sum(dxs) + jnp.sum(confs) + eps

    t0 = time.perf_counter()
    a = bench("coarse_pallas (16 frames, one kernel)", coarse_pallas, stack)
    print(f"  (first compile+3 trials took {time.perf_counter()-t0:.0f}s)",
          flush=True)
    b = bench("coarse_xla (ref + 15 tgts, matmuls)", coarse_xla, ref, tgts)
    d = bench("align_new (padded, pallas coarse)", align_new, stack)
    c = bench("align_old (view, matmul coarse)", align_old, ref, tgts)

    # parity: offsets must agree
    o_new = phase_correlate_stack_padded(stack, (H, W))
    o_old = phase_correlate_stack_traced(ref, tgts)
    dy_diff = float(jnp.max(jnp.abs(o_new[0] - o_old[0])))
    dx_diff = float(jnp.max(jnp.abs(o_new[1] - o_old[1])))
    print(f"offset parity: max|dy diff|={dy_diff:.4f} "
          f"max|dx diff|={dx_diff:.4f}", flush=True)
    print(f"SUMMARY coarse {b:.2f}->{a:.2f} ms, align {c:.2f}->{d:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
