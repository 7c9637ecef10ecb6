"""Pallas per-tile sorter for the background estimator.

The star-detection background (star_detection.rs:60 semantics) needs
every 256² tile's pixels in sorted order for interval median/MAD
statistics. XLA's generic sort over 65536-element rows is a ~256-round
comparator loop materializing in HBM — measured ~36 ms of the ~75 ms
device-side detection at 5655×2206. Here each tile is loaded once into
VMEM and sorted by a full bitonic network where EVERY stage is a
single-axis XOR shuffle: element i = r·256 + c lives at (sublane r,
lane c), so stride 2^s partners are lane rolls for s < 8 and sublane
rolls for s ≥ 8 — two rolls + three selects per stage, all on
registers.

Invalid pixels (non-finite or ≤ the 1e-7 padding threshold) are mapped
to +inf before sorting, so each output row is [valid ascending, +inf
tail] and the valid count is returned per tile — exactly the contract
of the XLA path in star_detection._estimate_background_kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from astroburst_tpu.constants import PADDING_THRESHOLD


def _xor_shuffle(x, k: int, axis: int):
    """x[..., i ^ k, ...] along ``axis`` for power-of-two k, as two
    rolls + an iota select (Mosaic has no arbitrary shuffle; negative
    dynamic rolls are banned, static negatives are fine via the
    positive complement)."""
    n = x.shape[axis]
    fwd = pltpu.roll(x, n - k, axis)   # x[i + k]
    bwd = pltpu.roll(x, k, axis)       # x[i - k]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    take_fwd = (idx & k) == 0          # bit clear → partner above
    return jnp.where(take_fwd, fwd, bwd)


def _make_tile_sort_kernel(step: int):
    k_lane = step.bit_length() - 1  # lane bits (minor axis)
    total_bits = 2 * k_lane

    def kernel(plane_ref, out_ref, cnt_ref):
        x = plane_ref[...]
        valid = jnp.isfinite(x) & (x > PADDING_THRESHOLD)
        # per-tile valid count, computed while the tile is already in
        # registers (a separate XLA reshape-sum re-reads the plane)
        cnt = jnp.sum(valid.astype(jnp.float32))
        cnt_ref[...] = jnp.full(cnt_ref.shape, cnt, jnp.float32)
        x = jnp.where(valid, x, jnp.inf)
        idx_r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        idx_c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        # global element index i = r·step + c
        gidx = idx_r * step + idx_c
        for stage in range(1, total_bits + 1):
            block = 1 << stage
            for s in reversed(range(stage)):
                stride = 1 << s
                if s < k_lane:
                    p = _xor_shuffle(x, stride, 1)
                else:
                    p = _xor_shuffle(x, 1 << (s - k_lane), 0)
                mn = jnp.minimum(x, p)
                mx = jnp.maximum(x, p)
                # final stage: block = step² > any gidx ⇒ all ascending
                ascending = (gidx & block) == 0
                low_half = (gidx & stride) == 0
                x = jnp.where(ascending == low_half, mn, mx)
        out_ref[...] = x[None, None]

    return kernel


@partial(jax.jit, static_argnames=("step", "interpret"))
def sort_tiles_pallas(padded: jax.Array, step: int,
                      interpret: bool = False):
    """[ty·step, tx·step] plane → (sorted tiles [ty·tx, step²] with
    +inf tails, valid counts [ty·tx]). ``step`` must be a power of two
    and divide both plane dims."""
    rows, cols = padded.shape
    if step & (step - 1) or rows % step or cols % step:
        raise ValueError(f"step {step} must be pow2 dividing {rows}x{cols}")
    ty, tx = rows // step, cols // step
    kernel = _make_tile_sort_kernel(step)
    out, cnt = pl.pallas_call(
        kernel,
        grid=(ty, tx),
        in_specs=[pl.BlockSpec((step, step), lambda i, j: (i, j))],
        out_specs=[
            pl.BlockSpec((1, 1, step, step), lambda i, j: (i, j, 0, 0)),
            # a full (8, 128) tile per grid cell carrying the broadcast
            # count (a scalar per-tile output violates TPU block tiling)
            pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ty, tx, step, step), jnp.float32),
            jax.ShapeDtypeStruct((ty, tx, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(padded)
    counts = cnt[:, :, 0, 0].astype(jnp.int32)
    return out.reshape(ty * tx, step * step), counts.reshape(ty * tx)
