"""Fused segment scans over the sorted code stream (Pallas).

The bucket step needs, for every element of the SORTED window stream, three
prefix quantities (ops/bucket_kernel.py preprocessing):

  rank    1-based occurrence rank within its run of equal codes — the exact
          sequential-semantics rank (reference upsert-then-test order,
          normalise_kmers_multi_large.c:1487-1497);
  cand    index of the element's code among the distinct codes of its bucket
          row within the batch (insert-lane resolution);
  p2      (read_id << 16) | rank packing consumed by the bucket kernel.

As plain XLA ops these are one cummax + one cumsum + one cummax over the flat
N-element stream, which XLA lowers to ~3.5 ns/element on TPU — as expensive
as the sort itself. This kernel computes all three in ONE pass using TWO
packed segmented sums (value bits 0..19, reset flag bit 20; rank = run
position via reset-at-code-change, cand = distinct-code count via
reset-at-row-change) over two-level scans: log-roll Hillis-Steele along
lanes, a sublane-dim scan of row aggregates, and a scalar carry chained
through the sequential grid (SMEM scratch). The segmented-sum combine is
non-commutative, so every scan helper applies earlier operands on the left.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_LANES = 512
BLOCK_SUBLANES = 64
BLOCK = BLOCK_LANES * BLOCK_SUBLANES  # elements per grid step


def _lane_scan(x, op):
    """Inclusive scan along axis=1 (lanes) via log-doubling rolls. `op` takes
    (earlier, later) — order matters for the segmented op below."""
    l_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < x.shape[1]:
        r = pltpu.roll(x, shift, 1)
        x = jnp.where(l_iota >= shift, op(r, x), x)
        shift *= 2
    return x


def _row_scan_inclusive(rowagg, op):
    """Inclusive scan along axis=0 (sublanes) of an (S, 1) column."""
    s_iota = jax.lax.broadcasted_iota(jnp.int32, rowagg.shape, 0)
    shift = 1
    while shift < rowagg.shape[0]:
        r = pltpu.roll(rowagg, shift, 0)
        rowagg = jnp.where(s_iota >= shift, op(r, rowagg), rowagg)
        shift *= 2
    return rowagg


def _two_level(vals, op, identity, carry):
    """Inclusive row-major scan of an (S, L) block given the carry scalar.

    Earlier elements are always the LEFT operand of `op` (the carry is the
    leftmost prefix), so non-commutative ops (segmented sums) are safe.
    Returns (scanned block incl. carry, new carry scalar)."""
    lane = _lane_scan(vals, op)
    rowagg = lane[:, BLOCK_LANES - 1:BLOCK_LANES]            # (S, 1)
    incl = _row_scan_inclusive(rowagg, op)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, incl.shape, 0)
    excl = jnp.where(s_iota >= 1, pltpu.roll(incl, 1, 0), identity)
    out = op(op(carry, excl), lane)
    new_carry = op(carry, incl[BLOCK_SUBLANES - 1, 0])
    return out, new_carry


def _kernel(row_shift: int, n_reads: int, wide: bool,
            *refs):
    if wide:
        key_ref, key2_ref, rid16_ref, p2_ref, p3_ref, carry_ref = refs
    else:
        key_ref, rid16_ref, p2_ref, p3_ref, carry_ref = refs
        key2_ref = None
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        carry_ref[0] = 0            # prev block's last key bits (unused at s=0)
        carry_ref[1] = 0            # rank segsum carry (run length so far)
        carry_ref[2] = 0            # cand segsum carry (distinct codes so far)
        carry_ref[3] = 0            # prev block's last key2 bits

    key = key_ref[:]                                         # (S, L) int32 bits
    gidx = (s * BLOCK
            + jax.lax.broadcasted_iota(jnp.int32, key.shape, 0) * BLOCK_LANES
            + jax.lax.broadcasted_iota(jnp.int32, key.shape, 1))

    # previous element in row-major order: (s, l-1), or (s-1, L-1) for l == 0
    l_iota = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)

    def prev_of(x, carry_slot):
        prev_lane = pltpu.roll(x, 1, 1)
        prev_row_last = pltpu.roll(x[:, BLOCK_LANES - 1:BLOCK_LANES], 1, 0)
        p = jnp.where(l_iota == 0, prev_row_last, prev_lane)
        return jnp.where(gidx == s * BLOCK, carry_ref[carry_slot], p)

    prev = prev_of(key, 0)
    first = gidx == 0

    changed = (key != prev) | first
    if wide:
        key2 = key2_ref[:]
        prev2 = prev_of(key2, 3)
        changed = changed | (key2 != prev2)
    row = jax.lax.shift_right_logical(
        pltpu.bitcast(key, jnp.uint32), jnp.uint32(row_shift))
    prow = jax.lax.shift_right_logical(
        pltpu.bitcast(prev, jnp.uint32), jnp.uint32(row_shift))
    rchanged = (row != prow) | first

    # TWO packed SEGMENTED sums replace the old three plain scans (cumsum +
    # two cummaxes): value field = bits 0..19, reset flag = bit 20.
    #   rank: seg-sum of 1, reset where the code changes -> position in run.
    #   cand: seg-sum of `changed`, reset where the ROW changes -> 1 + the
    #         element's distinct-code index within its row this batch.
    # Earlier-operand-first combine: a reset on the right wins outright,
    # else values add (in-block sums <= 32768 + clamped carry 65535 < 2^20,
    # so the flag bit is never reached by addition). Saves a third of the
    # scan's lane-roll work (the kernel's entire cost).
    FLAG = jnp.int32(1 << 20)

    def seg(a, b):
        return jnp.where(b >= FLAG, b, a + b)

    rank_p, c_rank = _two_level(
        jnp.where(changed, FLAG + 1, 1), seg, jnp.int32(0), carry_ref[1])
    cand_p, c_cand = _two_level(
        jnp.where(rchanged, FLAG + 1, changed.astype(jnp.int32)),
        seg, jnp.int32(0), carry_ref[2])

    rank = jnp.minimum(rank_p & (FLAG - 1), 65535)
    cand = jnp.minimum((cand_p & (FLAG - 1)) - 1, 128)

    p2_ref[:] = rid16_ref[:] | rank
    p3_ref[:] = cand

    carry_ref[0] = key[BLOCK_SUBLANES - 1, BLOCK_LANES - 1]
    # strip the flag and clamp: the carried value acts as a pure prefix sum
    # for the next block (clamping preserves the >= 65535 / >= 129 verdicts)
    carry_ref[1] = jnp.minimum(c_rank & (FLAG - 1), 65535)
    carry_ref[2] = jnp.minimum(c_cand & (FLAG - 1), 65535)
    if wide:
        carry_ref[3] = key2[BLOCK_SUBLANES - 1, BLOCK_LANES - 1]


def rank_cand_scan(skey: jax.Array, srid: jax.Array, *, fp_bits: int, w: int,
                   n_reads: int, interpret: bool = False, skey2=None,
                   row_shift: int = -1):
    """Compute (p2, p3) for the bucket kernel from the sorted key/rid streams.

    Args:
      skey: uint32 [N] sorted mixed codes (pads = 0xFFFFFFFF). N must be a
        multiple of BLOCK (32768) — callers pad with the sentinel.
      srid: int32 [N] read id of each sorted element (the sort's secondary
        key), already clamped to [0, n_reads).
      fp_bits: fingerprint bits (bucket row = skey >> fp_bits).
      w: windows per read (unused; kept for call-site symmetry);
      n_reads: reads in batch.
      skey2: optional uint32 [N] second sorted word (wide k>15 path): a code
        changes when EITHER word changes, and the row comes from skey via
        `row_shift` instead of fp_bits.
      row_shift: right-shift of skey that yields the bucket row (wide path).

    Returns:
      p2 int32 [N] = (read_id << 16) | rank(<=65535)
      p3 int32 [N] = candidate index within bucket row, clamped to 128.
    """
    del w
    n = skey.shape[0]
    assert n % BLOCK == 0, f"pad stream to a multiple of {BLOCK}, got {n}"
    n_steps = n // BLOCK
    rid16 = jnp.minimum(srid, n_reads - 1) << 16
    wide = skey2 is not None
    shift = row_shift if wide else fp_bits

    def blk(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32).reshape(
            n // BLOCK_LANES, BLOCK_LANES)

    spec = pl.BlockSpec((BLOCK_SUBLANES, BLOCK_LANES), lambda s: (s, 0),
                        memory_space=pltpu.VMEM)
    ins = [blk(skey)] + ([blk(skey2)] if wide else []) + [
        rid16.reshape(n // BLOCK_LANES, BLOCK_LANES)]

    p2, p3 = pl.pallas_call(
        partial(_kernel, shift, n_reads, wide),
        grid=(n_steps,),
        in_specs=[spec] * len(ins),
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((n // BLOCK_LANES, BLOCK_LANES), jnp.int32),
            jax.ShapeDtypeStruct((n // BLOCK_LANES, BLOCK_LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
        interpret=interpret,
    )(*ins)
    return p2.reshape(n), p3.reshape(n)
