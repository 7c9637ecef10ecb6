"""Pallas triangle-vote kernel for the affine aligner.

votes[a, b] = number of (ref-triangle, tgt-triangle) pairs whose two
side-ratio descriptors agree within TRIANGLE_TOLERANCE and whose p-th
vertices are stars a and b, summed over the three vertex positions p
(affine.rs:320-384 vote semantics).

The XLA formulation (`affine._vote_kernel`) scans 256-row ref chunks,
materializing a [256, T] match matrix and three [64, T] accumulators
in HBM per step — ~10.5 ms at T≈34k on v5e, almost all of it HBM
round-trips of intermediates. Here the match tile, the one-hot
factors, and the [64, 64] accumulator all live in VMEM:

- grid (T/RB, T/TB); each cell builds the bf16 match tile
  m[RB, TB] from two ratio row-vectors (registers), builds the
  stacked ref one-hot aT[192, RB] from the vertex ids (192 = 3
  vertex positions × 64 star slots), and runs ONE MXU contraction
  [192, RB]·[RB, TB].
- the three [64, TB] slices are contracted against the tgt one-hots
  in f32 (counts ≤ RB per product are f32-exact; the running
  [64, 64] accumulator stays exact to 2^24 ≫ T).
- HBM traffic is the ratio/vertex vectors only (~1 MB total vs
  ~7 GB of scan intermediates).

Exactness: every count is an integer sum of 0/1 products accumulated
in f32 — exact as long as totals stay < 2^24, and totals are bounded
by T < 2^16.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TRIANGLE_TOLERANCE = 0.02
STAR_CAP = 64
_RB = 1024   # ref triangles per block (contraction depth)
_TB = 2048   # tgt triangles per block (lane width)


def _vote_pallas_kernel(rr_ref, rv_ref, tr_ref, tv_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    # both triangle lists arrive sorted ascending by ratio[0] (+inf
    # padding last), so a block pair whose ratio[0] ranges are more
    # than the tolerance apart cannot contain any match — skip its
    # compare + contractions entirely. min() of a sorted block is its
    # first (finite when any row is real); max() is +inf on blocks
    # reaching into the padding, which keeps them conservatively.
    r0 = rr_ref[0, :]
    r1 = rr_ref[1, :]
    t0 = tr_ref[0, :]
    t1 = tr_ref[1, :]
    overlap = ((jnp.min(r0) - TRIANGLE_TOLERANCE <= jnp.max(t0)) &
               (jnp.min(t0) - TRIANGLE_TOLERANCE <= jnp.max(r0)) &
               jnp.isfinite(jnp.min(r0)) & jnp.isfinite(jnp.min(t0)))

    @pl.when(overlap)
    def _work():
        # match tile from two ratio row-vectors; padded rows carry
        # +inf ratios (|inf - x| = inf, inf - inf = nan: both fail
        # the <= test)
        m = ((jnp.abs(r0[:, None] - t0[None, :]) <= TRIANGLE_TOLERANCE) &
             (jnp.abs(r1[:, None] - t1[None, :]) <= TRIANGLE_TOLERANCE))
        mb = m.astype(jnp.bfloat16)

        # stacked ref one-hot [3·64, RB]: row r selects vertex
        # position r // 64, star id r % 64
        row = jax.lax.broadcasted_iota(jnp.int32, (3 * STAR_CAP, _RB), 0)
        star = row % STAR_CAP
        pos = row // STAR_CAP
        v0 = rv_ref[0, :][None, :]
        v1 = rv_ref[1, :][None, :]
        v2 = rv_ref[2, :][None, :]
        vsel = jnp.where(pos == 0, v0, jnp.where(pos == 1, v1, v2))
        a_t = (vsel == star).astype(jnp.bfloat16)

        # per-(star, tgt-triangle) counts: [192, TB], exact
        # (counts <= RB)
        s = jax.lax.dot_general(a_t, mb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

        # contract against tgt one-hots in f32 (exact int products)
        col = jax.lax.broadcasted_iota(jnp.int32, (_TB, STAR_CAP), 1)
        acc = out_ref[...]
        for p in range(3):
            b_oh = (tv_ref[p, :][:, None] == col).astype(jnp.float32)
            sp = s[p * STAR_CAP:(p + 1) * STAR_CAP, :]
            acc = acc + jax.lax.dot_general(
                sp, b_oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[...] = acc


@partial(jax.jit, static_argnames=("interpret",))
def vote_pallas(ref_ratios_t: jax.Array, ref_verts_t: jax.Array,
                tgt_ratios_t: jax.Array, tgt_verts_t: jax.Array,
                interpret: bool = False) -> jax.Array:
    """Triangle vote table [64, 64].

    Inputs are TRANSPOSED: ratios [2, T] f32, verts [3, T] int32, with
    T a multiple of lcm(RB, TB) = 2048; padded triangles must carry
    +inf ratios (their vertex ids are ignored — no ratio match means
    no vote).
    """
    t = ref_ratios_t.shape[1]
    if t % _TB or t % _RB:
        raise ValueError(f"T={t} must be a multiple of {_TB}")
    grid = (t // _RB, t // _TB)
    return pl.pallas_call(
        _vote_pallas_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, _RB), lambda i, j: (0, i)),
            pl.BlockSpec((3, _RB), lambda i, j: (0, i)),
            pl.BlockSpec((2, _TB), lambda i, j: (0, j)),
            pl.BlockSpec((3, _TB), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((STAR_CAP, STAR_CAP), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((STAR_CAP, STAR_CAP), jnp.float32),
        interpret=interpret,
    )(ref_ratios_t, ref_verts_t, tgt_ratios_t, tgt_verts_t)
