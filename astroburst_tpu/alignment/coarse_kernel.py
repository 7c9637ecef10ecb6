"""Pallas box-mean downsample for the coarse alignment pass.

The XLA coarse path (`phase_correlation._coarse_box_downsample`) runs
the box mean as two banded matmuls; its measured cost at the headline
shape (16×5655×2206) is ~4.6-6.2 ms against a ~1.0 ms mandatory-read
roofline (one 800 MB pass at 819 GB/s). Two structural overheads the
matmul form cannot shed:

- the [N, H, ds_c] intermediate between the column and row
  contractions is materialized in HBM (~160 MB write + read);
- the pipeline feeds a `stack[:, :h, :w]` SLICE of the ingest-padded
  stack, and XLA materializes a full ~750 MB copy of that view the
  moment any non-fusing consumer (a Pallas crop kernel, a dot operand)
  reads it.

This kernel removes both: it reads the PADDED [N, Hp, Wp] stack
blockwise — one HBM pass, no intermediate, no view copy — and runs
both box contractions on the MXU inside the block:

- column boxes: `block[RB, Wp] @ MC[Wp, DCp]`, where MC is a 0/1
  bf16 band matrix (column j contributes to output column j // bx;
  columns past ds_c·bx — including the ingest pad — carry weight 0,
  so pad content never reaches a result);
- row boxes: `MR[GR, RB] @ t`, MR the 0/1 f32 row-group matrix built
  from iotas in-kernel (row r of the block belongs to group r // by);
- the 1/(by·bx) mean scale is applied once in f32 afterwards — the
  0/1 matrices are exact in bf16, so the only rounding is the input's
  own f32→bf16 cast (the XLA path runs DEFAULT precision, the same
  one-pass-bf16 product class).

Blocks of RB = GR·by rows (GR a multiple of 8 so the [GR, DCp] output
block meets the (8, 128) tile floor). Row groups ≥ ds_r land in the
output pad and are sliced off; when the grid over-reads past Hp the
garbage rows are zero-selected before the matmul (`grow < ds_r·by`),
because the 0-weight row matmul would still propagate NaNs.

Reference semantics: the coarse pass area-average of
phase_correlation.rs:10 + sampling.rs (area path), identical region
arithmetic to `_coarse_box_downsample` (largest divisible region,
ds = dim // box).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# scoped-VMEM budget for the double-buffered input blocks + resident
# column matrix + intermediates (the ~16 MB accounting of the onepass
# kernel applies here too; stay well clear)
_VMEM_BUDGET = 10 * 1024 * 1024


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def plan(n: int, hp: int, wp: int, h: int, w: int, max_dim: int):
    """Static kernel plan, or None when the shape doesn't fit VMEM
    (very wide planes — the mosaic scale — keep the XLA matmul path).

    Returns (by, bx, ds_r, ds_c, dcp, gr, rb, nb, need_row_mask).
    """
    by = -(-h // max_dim)
    bx = -(-w // max_dim)
    if by == 1 and bx == 1:
        return None  # no downsample — callers correlate directly
    ds_r = h // by
    ds_c = w // bx
    if ds_r < 8 or ds_c < 128:
        return None  # tiny planes: tile floors beat any Pallas win
    dcp = _ceil_to(ds_c, 128)
    # MC stays VMEM-resident across the whole grid (constant index)
    mc_bytes = wp * dcp * 2
    gr = None
    for cand in (32, 24, 16, 8):
        rb = cand * by
        blk = rb * wp * 4
        t_bytes = rb * dcp * 4 + rb * wp * 2
        if 2 * blk + mc_bytes + t_bytes <= _VMEM_BUDGET:
            gr = cand
            break
    if gr is None:
        return None
    rb = gr * by
    nb = -(-ds_r // gr)
    need_row_mask = nb * rb > hp
    return by, bx, ds_r, ds_c, dcp, gr, rb, nb, need_row_mask


def _make_kernel(by: int, ds_r: int, gr: int, rb: int,
                 need_row_mask: bool, scale: float,
                 stats_hw: tuple | None = None):
    def kernel(dummy_ref, img_ref, mc_ref, out_ref, *stat_refs):
        del dummy_ref
        i = pl.program_id(1)
        x = img_ref[0]                                    # [RB, Wp] f32

        if stats_hw is not None:
            # fold the per-frame finite-count/min/max of
            # phase_correlation._is_constant_or_zero into this pass —
            # the separate fused variadic reduce re-read the full
            # 750 MB stack (~1.1 ms of the headline align stage)
            h, w = stats_hw
            mn_ref, mx_ref, cnt_ref = stat_refs
            rr = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            ok = ((rr + i * rb < h) & (cc < w) & jnp.isfinite(x))
            wp = x.shape[1]

            def fold2(plane, fill, red):
                p = red(jnp.where(ok, plane, fill)
                        .reshape(rb // 8, 8, wp), axis=0)
                return red(p.reshape(8, wp // 128, 128), axis=1)

            mn_b = fold2(x, jnp.inf, jnp.min)
            mx_b = fold2(x, -jnp.inf, jnp.max)
            ct_b = fold2(jnp.ones_like(x), 0.0, jnp.sum)

            @pl.when(i == 0)
            def _init():
                mn_ref[0] = mn_b
                mx_ref[0] = mx_b
                cnt_ref[0] = ct_b

            @pl.when(i > 0)
            def _acc():
                mn_ref[0] = jnp.minimum(mn_ref[0], mn_b)
                mx_ref[0] = jnp.maximum(mx_ref[0], mx_b)
                cnt_ref[0] = cnt_ref[0] + ct_b

        if need_row_mask:
            rr2 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
            x = jnp.where(rr2 + i * rb < ds_r * by, x, 0.0)
        t = jax.lax.dot_general(
            x.astype(jnp.bfloat16), mc_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [RB, DCp]
        ig = jax.lax.broadcasted_iota(jnp.int32, (gr, rb), 0)
        ir = jax.lax.broadcasted_iota(jnp.int32, (gr, rb), 1)
        mr = jnp.where(ir // by == ig, 1.0, 0.0)
        s = jax.lax.dot_general(mr, t, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[0] = s * scale

    return kernel


@partial(jax.jit, static_argnames=("true_shape", "max_dim", "interpret",
                                   "with_stats"))
def coarse_downsample_stack(stack: jax.Array, true_shape: tuple,
                            max_dim: int, interpret: bool = False,
                            with_stats: bool = False):
    """Box-mean downsample of every frame of a padded [N, Hp, Wp]
    stack to [N, ds_r, ds_c] in one blockwise HBM pass.

    ``true_shape=(h, w)`` is the un-padded plane size; the box grid is
    computed from it exactly as `_coarse_box_downsample` does, and
    padded rows/cols never contribute. Returns (ds, by, bx); with
    ``with_stats`` additionally (mn, mx, cnt) — per-frame finite
    min/max/count over the TRUE region (rows<h, cols<w), accumulated
    as (8, 128) register tiles across blocks and reduced here, so the
    `_is_constant_or_zero` gate costs no second full-stack read.
    Raises ValueError when `plan` rejects the shape — callers fall
    back to the XLA matmul path.
    """
    n, hp, wp = stack.shape
    h, w = true_shape
    p = plan(n, hp, wp, h, w, max_dim)
    if p is None:
        raise ValueError(f"no VMEM-feasible plan for {stack.shape} "
                         f"true={true_shape} max_dim={max_dim}")
    by, bx, ds_r, ds_c, dcp, gr, rb, nb, need_row_mask = p
    if with_stats:
        # stats must see every true row; the coarse groups only span
        # rows < ds_r·by (up to by-1 rows short of h)
        nb = max(nb, -(-h // rb))
        need_row_mask = nb * rb > ds_r * by or need_row_mask

    # 0/1 column band matrix, bf16-exact; columns ≥ ds_c*bx (the
    # dropped remainder and the ingest pad) carry weight 0
    j = jnp.arange(wp, dtype=jnp.int32)[:, None]
    c = jnp.arange(dcp, dtype=jnp.int32)[None, :]
    mc = (((j >= c * bx) & (j < (c + 1) * bx) & (j < ds_c * bx))
          .astype(jnp.bfloat16))

    out_specs = [pl.BlockSpec((1, gr, dcp), lambda fn, i, *_: (fn, i, 0))]
    out_shapes = [jax.ShapeDtypeStruct((n, nb * gr, dcp), jnp.float32)]
    if with_stats:
        for _ in range(3):
            out_specs.append(
                pl.BlockSpec((1, 8, 128), lambda fn, i, *_: (fn, 0, 0)))
            out_shapes.append(
                jax.ShapeDtypeStruct((n, 8, 128), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, rb, wp), lambda fn, i, *_: (fn, i, 0)),
            pl.BlockSpec((wp, dcp), lambda fn, i, *_: (0, 0)),
        ],
        out_specs=out_specs,
    )
    res = pl.pallas_call(
        _make_kernel(by, ds_r, gr, rb, need_row_mask,
                     1.0 / float(by * bx),
                     stats_hw=(h, w) if with_stats else None),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(jnp.zeros(1, jnp.int32), stack, mc)
    ds = res[0][:, :ds_r, :ds_c]
    if not with_stats:
        return ds, by, bx
    mn = jnp.min(res[1], axis=(1, 2))
    mx = jnp.max(res[2], axis=(1, 2))
    cnt = jnp.sum(res[3], axis=(1, 2))
    return ds, by, bx, mn, mx, cnt
