"""Tile-aligned multi-crop Pallas kernel.

The phase-correlation refine stage cuts one ``size``² crop per frame
out of a [N, H, W] stack at per-frame dynamic origins. XLA's
``dynamic_slice`` on tiled TPU layouts runs ~45 GB/s (a relayout, not
a copy) — measured ~4.3 ms for 15 crops whose raw bytes are ~15 MB
(phase_correlation.py refine notes), ~80× the memory cost. The crop
origins are already forced to (8, 128)-tile alignment by
``_refine_origin``, which is exactly the precondition for a direct
HBM→VMEM DMA: this kernel issues ONE aligned async copy per frame and
nothing else, so the crops move at copy speed.

Semantics match ``jax.lax.dynamic_slice(stack, (k, y0s[k], x0s[k]),
(1, size_r, size_c))`` per frame, for origins that are in-range and
(8, 128)-aligned — the caller's contract (origins outside the plane or
unaligned raise at trace time where detectable; runtime values are
trusted, as with dynamic_slice's clamping the caller already performs).

Reference context: the refine crop implements the coarse-to-fine
window selection of phase_correlation.rs:50-89; this kernel changes
only how the bytes move.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(n: int, frame0: int):
    def kernel(y0_ref, x0_ref, stack_hbm, out_ref, sem):
        k = pl.program_id(0)
        y0 = pl.multiple_of(y0_ref[k], 8)
        x0 = pl.multiple_of(x0_ref[k], 128)
        size_r = out_ref.shape[1]
        size_c = out_ref.shape[2]
        src = stack_hbm.at[k + frame0, pl.ds(y0, size_r), pl.ds(x0, size_c)]
        pltpu.make_async_copy(src, out_ref.at[0], sem).start()
        pltpu.make_async_copy(src, out_ref.at[0], sem).wait()

    return kernel


@partial(jax.jit, static_argnames=("size_r", "size_c", "interpret",
                                   "frame0"))
def gather_crops(stack: jax.Array, y0s: jax.Array, x0s: jax.Array,
                 size_r: int, size_c: int,
                 interpret: bool = False,
                 frame0: int = 0) -> jax.Array:
    """[N - frame0, size_r, size_c] crops of ``stack`` [N, H, W], crop
    k from frame ``frame0 + k`` at origin (y0s[k], x0s[k]).

    Origins must be in-range ([0, H - size_r] × [0, W - size_c]) and
    (8, 128)-aligned — ``_refine_origin`` guarantees both. ``size_r``
    must be a multiple of 8 and ``size_c`` of 128 (DMA slice shapes are
    tile-aligned); callers with ragged sizes use the XLA path.
    ``frame0`` lets the padded-stack align path crop targets straight
    out of the ingest-padded buffer — a `stack[1:]` slice operand here
    would make XLA materialize a full copy of the view.
    """
    n, h, w = stack.shape
    n = n - frame0
    if size_r % 8 or size_c % 128:
        raise ValueError(f"crop size must be (8,128)-aligned, got "
                         f"({size_r},{size_c})")
    if size_r > h or size_c > w:
        raise ValueError(f"crop ({size_r},{size_c}) exceeds plane "
                         f"({h},{w})")
    y0s = jnp.asarray(y0s, jnp.int32)
    x0s = jnp.asarray(x0s, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, size_r, size_c),
                               lambda k, *_: (k, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _make_kernel(n, frame0),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, size_r, size_c), stack.dtype),
        interpret=interpret,
    )(y0s, x0s, stack)
    return out
