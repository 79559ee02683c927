"""Pallas bucket-table kernel: exact k-mer count + classify with zero scatters.

This is the TPU-native replacement for BOTH halves of the reference's hot loop
(``store_kmer`` normalise_kmers_multi_large.c:929-1053 upsert + the per-window
``count >= depth_per_cpu`` test of ``sequence_to_hash`` :1487-1497): one fused
device kernel that matches, inserts, counts, classifies, and aggregates
per-read tallies for an entire batch of reads.

Why not XLA scatter/gather: on TPU, XLA lowers both to a serialized per-element
loop (~8-15 ns/element measured, experiments/microbench_primitives.py), which
caps the whole engine at ~250k reads/s/chip. This kernel replaces them with
dense MXU one-hot matmuls over bucket tiles at ~6 ns/element for the ENTIRE
pipeline stage — and eliminates the unsort permutation by aggregating per-read
high-window counts in-kernel.

Data structure ("bucket table"):
  - A k-mer code c (2k <= 30 bits) is placed at ``m = mix(c)`` (bijective, see
    ops/mix.py). Bucket row = high bits of m, fingerprint = low ``fp_bits``
    bits. Each row holds up to 128 distinct codes in its 128 lanes:
    ``fp[row, lane]`` stores fingerprint+1 (0 = empty), ``counts[row, lane]``
    the count. Bijectivity makes this EXACT: (row, fingerprint) recovers c.
  - Batch windows are sorted by m (one stable 2-array sort — the only
    O(N log N) op), chunked, and each (tile of 128 rows, chunk) pair becomes a
    grid step in megablox style: scalar-prefetched step->tile/chunk maps drive
    the BlockSpec index_maps. Equal codes are adjacent, so an aggregated
    update per distinct code needs no atomics and no collision probing.

Per-element semantics (exact, reference-sequential): the element's observed
count is ``prior_table_count + rank`` where rank is its 1-based occurrence
rank among equal codes in stream order (ops/streamrank.py trick); ``high``
means observed >= depth. The kernel returns per-read sums of high windows.

In-kernel algorithm per step (E = chunk elements, R = 128 rows, L = 128 lanes):
  A[e,r]    = one-hot of the element's tile-local row (masked: valid, in-tile)
  gather    = A @ [fp_hi|fp_lo|cnt_hi|cnt_lo] one (E,128)@(128,512) matmul
  match     = (RowFP == fingerprint+1)   -> B_match one-hot lane, prior count
  insert    = unmatched & rank==1; its lane = occ[row] + #earlier same-row
              inserts THIS STEP, resolved with a (R,128) lane-prefix-scan over
              the candidate-index one-hot (B_cand, XLA-precomputed) — no
              per-element scan anywhere.
  delta    += A^T @ B_upd         (counts update, flushed at tile switch)
  fp       += A^T @ (B_ins * fp limbs)   (insert write, visible to next steps)
  recsum   += (A_read * high)^T @ B_read (per-read high-window tallies)
All matmuls are bf16 one-hots with f32 accumulation; every value is an integer
below 2^24, so everything is exact. Counts are clamped to 65535 for the gather
limbs which is lossless for the decision because depth <= 65535.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nomalise_kmers_multi_large_tpu.ops.mix import mix32
from nomalise_kmers_multi_large_tpu.ops.segscan import (
    BLOCK as _SCAN_BLOCK, rank_cand_scan,
)

LANES = 128          # slots (distinct codes) per bucket row
TILE_ROWS = 128      # bucket rows per grid tile
_SENT = jnp.uint32(0xFFFFFFFF)


class BucketBatchOut(NamedTuple):
    fp: jax.Array        # int32 [rows, 128] updated fingerprints (+1; 0=empty)
    counts: jax.Array    # int32 [rows, 128] updated counts
    high_per_read: jax.Array  # int32 [n_reads] high-window count per read
    overflow: jax.Array  # int32 [] inserts dropped (bucket full / cand >= 128)


def _onehot(cond):
    """bf16 one-hot from a predicate. The f32 select is deliberate: masks from
    32-bit compares carry an (8,128) i1 layout, and selecting 16-bit values
    directly would force an unsupported (16,128) mask relayout in Mosaic."""
    return jnp.where(cond, 1.0, 0.0).astype(jnp.bfloat16)


def _kernel(fp_bits: int, depth: int, chunk: int, tile_rows: int,
            # prefetch
            step_tile, step_chunk, step_active, seed_ref,
            # inputs
            p1_ref, p2_ref, p3_ref, fp_in_ref, cnt_in_ref,
            # outputs
            fp_out_ref, cnt_out_ref, recsum_ref, stats_ref,
            # scratch
            delta_ref):
    s = pl.program_id(0)
    nsteps = pl.num_programs(0)
    tile = step_tile[s]
    active = step_active[s] != 0
    prev_tile = step_tile[jnp.maximum(s - 1, 0)]
    next_tile = step_tile[jnp.minimum(s + 1, nsteps - 1)]
    is_first = jnp.logical_or(s == 0, prev_tile != tile)
    is_last = jnp.logical_or(s == nsteps - 1, next_tile != tile)

    @pl.when(s == 0)
    def _():
        recsum_ref[:] = jnp.zeros_like(recsum_ref)
        stats_ref[:] = jnp.zeros_like(stats_ref)

    # out blocks are never preloaded from HBM: seed them from the aliased
    # input blocks on each tile's first visit (pads never get here: they
    # share the last real tile, already seeded)
    @pl.when(jnp.logical_and(is_first, active))
    def _():
        fp_out_ref[:] = fp_in_ref[:]
        cnt_out_ref[:] = cnt_in_ref[:]
        delta_ref[:] = jnp.zeros_like(delta_ref)

    seed = seed_ref[0] != 0

    E = chunk
    R = tile_rows
    fmask = jnp.int32((1 << fp_bits) - 1)

    p1 = p1_ref[:]                               # (E,1) int32: mixed (sentinel<0)
    p2 = pltpu.bitcast(p2_ref[:], jnp.uint32)    # (E,1): rid<<16 | rank
    cand = p3_ref[:]                             # (E,1) int32: in-row distinct idx

    mixed = p1
    grow = jax.lax.shift_right_logical(pltpu.bitcast(p1, jnp.uint32),
                                       jnp.uint32(fp_bits)).astype(jnp.int32)
    # fold `active` into the tile id at SCALAR level: pad steps alias the
    # last real (tile, chunk) block, and tile_eff = -2 pushes every lrow
    # outside [0, R) so no vector op needs the scalar flag (mixing scalar
    # bools into vector masks trips Mosaic relayouts)
    tile_eff = jnp.where(active, tile, -2)
    lrow = grow - tile_eff * R
    fpv1 = jnp.bitwise_and(mixed, fmask) + 1     # fingerprint+1, >= 1
    rank = jnp.bitwise_and(p2, jnp.uint32(0xFFFF)).astype(jnp.int32)
    rid = jax.lax.shift_right_logical(p2, jnp.uint32(16)).astype(jnp.int32)

    # element is processed exactly once: in its own tile's step (sentinel /
    # out-of-tile / pad-step elements all land outside [0, R))
    valid = (mixed >= 0) & (lrow >= 0) & (lrow < R)

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (E, R), 1)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (E, LANES), 1)

    A = _onehot(lrow == r_iota)

    mm = partial(jax.lax.dot_general, preferred_element_type=jnp.float32)
    mm_nt = lambda a, b: mm(a, b, (((1,), (0,)), ((), ())))   # (E,R)@(R,L)
    mm_tn = lambda a, b: mm(a, b, (((0,), (0,)), ((), ())))   # (E,R)^T@(E,L)

    # ---- gather: one wide matmul for fp and clamped-count limbs ----
    fpt = fp_out_ref[:]
    cntt = jnp.minimum(cnt_out_ref[:], 65535)
    planes = jnp.concatenate(
        [
            (fpt >> 8).astype(jnp.bfloat16),
            (fpt & 255).astype(jnp.bfloat16),
            (cntt >> 8).astype(jnp.bfloat16),
            (cntt & 255).astype(jnp.bfloat16),
        ],
        axis=1,
    )                                            # (R, 512)
    rows = mm_nt(A, planes)                      # (E, 512) f32, exact ints
    row_fp = rows[:, 0:LANES] * 256.0 + rows[:, LANES:2 * LANES]
    row_cnt = rows[:, 2 * LANES:3 * LANES] * 256.0 + rows[:, 3 * LANES:]

    fpv1_f = fpv1.astype(jnp.float32)            # (E,1)
    match = (row_fp == fpv1_f).astype(jnp.float32)          # (E,L) one-hot
    # single lane-reduction recovers BOTH is_match and prior: counts are
    # clamped <= 65535 < 2^17, and prior + 2^17 < 2^24 stays exact in f32
    mboth = jnp.sum(match * (row_cnt + 131072.0), axis=1, keepdims=True)
    is_match = jnp.where(mboth >= 131072.0, 1.0, 0.0)       # (E,1) 0/1
    prior = mboth - is_match * 131072.0

    # ---- insert path: only taken when some element missed the table.
    # In steady state (deep stream, most k-mers already present) whole
    # (tile, chunk) steps are all-match and skip everything here. ----
    any_un = jnp.sum(jnp.where((is_match == 0.0) & valid, 1.0, 0.0)) > 0.0

    def _insert_path(_):
        # lane resolution with NO per-element scan: candidate j of row r
        # (cand = XLA-precomputed distinct-code index within the row) gets
        # lane occ[r] + (# inserting candidates j' < j), via one (R,L)
        # lane-prefix scan + one matmul lookup.
        occ = jnp.sum(jnp.where(fpt != 0, 1.0, 0.0), axis=1, keepdims=True)
        insert = (is_match == 0.0) & (rank == 1) & valid & (cand < LANES)
        ins_f = _onehot(insert)
        # cand == l_iota already implies cand < LANES; validity is enforced
        # through ins_f / unmatched wherever B_cand feeds a write
        B_cand = _onehot(cand == l_iota)
        # cnew[r, j] = 1 iff candidate j of row r inserts in this step
        cnew = mm_tn(A * ins_f, B_cand)          # (R, L) f32 0/1
        # exclusive prefix along lanes via Hillis-Steele log-doubling
        tl_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        inc = cnew
        shift = 1
        while shift < LANES:
            rolled = pltpu.roll(inc, shift, 1)   # rolled[:, j] = inc[:, j-shift]
            inc = inc + jnp.where(tl_iota >= shift, rolled, 0.0)
            shift *= 2
        M = occ + (inc - cnew)                   # (R, L): lane for candidate j
        lane_new = jnp.sum(
            B_cand.astype(jnp.float32) * mm_nt(A, M.astype(jnp.bfloat16)),
            axis=1, keepdims=True,
        )                                        # (E,1)
        fits = lane_new < float(LANES)
        unmatched = (is_match == 0.0) & valid & (cand < LANES) & fits
        B_new = _onehot((lane_new == l_iota.astype(jnp.float32)) & unmatched)
        B_ins = B_new * ins_f                    # exactly one writer per (r,l)
        f_hi = (fpv1 >> 8).astype(jnp.bfloat16)  # <= 256: exact in bf16
        f_lo = (fpv1 & 255).astype(jnp.bfloat16)
        wrote = mm_tn(A, B_ins * f_hi) * 256.0 + mm_tn(A, B_ins * f_lo)
        dropped = jnp.sum(
            jnp.where((is_match == 0.0) & valid & (rank == 1)
                      & ((cand >= LANES) | jnp.logical_not(fits)), 1.0, 0.0))
        return B_new, wrote, dropped

    def _no_insert(_):
        return (jnp.zeros((E, LANES), jnp.bfloat16),
                jnp.zeros((R, LANES), jnp.float32),
                jnp.zeros((), jnp.float32))

    B_new, wrote, dropped = jax.lax.cond(any_un, _insert_path, _no_insert, None)
    B_upd = match.astype(jnp.bfloat16) + B_new   # disjoint one-hots

    # ---- counts delta (skipped while seeding: seed inserts carry count 0,
    # reference store_kmer do_init path :962-963) ----
    dmul = jnp.where(seed, 0.0, 1.0).astype(jnp.bfloat16)
    delta_ref[:] += mm_tn(A * dmul, B_upd)
    fp_out_ref[:] = fp_out_ref[:] + wrote.astype(jnp.int32)

    # ---- classification + per-read aggregation ----
    observed = prior + jnp.minimum(rank, 65535).astype(jnp.float32)
    # validity folded into the (E,1) high flag so Ar/Br stay pure one-hots
    high = _onehot((observed >= float(depth)) & valid)
    rrow = jax.lax.shift_right_logical(rid, 7)
    rcol = jnp.bitwise_and(rid, 127)
    rr_iota = jax.lax.broadcasted_iota(jnp.int32, (E, 128), 1)
    Ar = _onehot(rrow == rr_iota)
    Br = _onehot(rcol == l_iota)
    recsum_ref[:] += jax.lax.dot_general(
        Ar * high, Br, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # ---- stats: dropped inserts (bucket overflow or candidate index >= 128) ----
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) \
        + 128 * jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    stats_ref[:] += jnp.where(e_iota == 0, dropped, 0.0)

    @pl.when(is_last)
    def _():
        cnt_out_ref[:] = cnt_out_ref[:] + delta_ref[:].astype(jnp.int32)
        delta_ref[:] = jnp.zeros_like(delta_ref)


def bucket_batch(
    fp, counts, mixed_flat, valid_flat, *,
    k: int, rows: int, depth: int, windows_per_read: int,
    chunk: int = 2048, tile_rows: int = TILE_ROWS, seed: bool = False,
    interpret: bool = False,
):
    """Run one batch through the bucket table.

    Args:
      fp, counts: int32 [rows, 128] table state (donated by the caller's jit).
      mixed_flat: uint32 [N] BIJECTIVELY MIXED codes in stream order
        (callers use ``mix32(lo, 2k)``); N = n_reads * windows_per_read.
      valid_flat: bool [N] window validity in stream order.
      rows: bucket rows (power of two).
      depth: high-count threshold (reference depth_per_cpu), <= 65535.
      windows_per_read: static W; read id of flat index i is i // W.
      seed: insert-without-counting mode (reference seed pass semantics).

    Returns BucketBatchOut. high_per_read covers n_reads = N // W reads.
    """
    n = mixed_flat.shape[0]
    w = windows_per_read
    n_reads = n // w
    assert n_reads * w == n
    assert n_reads <= 16384, "recsum block covers 16384 reads per batch"
    assert depth <= 65535
    rb = int(np.log2(rows))
    assert rows == 1 << rb
    fp_bits = 2 * k - rb
    assert 1 <= fp_bits <= 16, (
        f"need rows >= 4^k/2^16: k={k} rows={rows} -> fp_bits={fp_bits}")
    tb = int(np.log2(tile_rows))
    assert tile_rows == 1 << tb and 8 <= tile_rows <= rows
    n_tiles = rows // tile_rows
    assert n_tiles >= 1

    # pad the stream so both the scan kernel (32768-element blocks) and the
    # bucket grid (chunk-element blocks) divide it evenly
    quantum = max(chunk, _SCAN_BLOCK)
    npad = -(-n // quantum) * quantum
    pad = npad - n
    n_chunks = npad // chunk
    n_steps = n_chunks + n_tiles  # static bound: chunks + tile crossings

    key = jnp.where(valid_flat, mixed_flat, _SENT)
    if pad:
        key = jnp.concatenate([key, jnp.full((pad,), _SENT, jnp.uint32)])
    pos = jnp.arange(npad, dtype=jnp.int32)
    # stable 1-key sort == 2-key (key, pos) sort but ~30% cheaper on TPU
    # (experiments/perf_sortvariants.py); stability supplies stream order
    # within equal codes, which the exact-rank semantics require.
    skey, src = jax.lax.sort((key, pos), num_keys=1, is_stable=True)

    # rank within equal-code run + candidate index within bucket row, fused
    # into one bandwidth-bound Pallas pass (ops/segscan.py) — as XLA
    # cummax/cumsum these cost as much as the sort itself
    p2f, p3f = rank_cand_scan(skey, src, fp_bits=fp_bits, w=w,
                              n_reads=n_reads, interpret=interpret)

    p1 = jax.lax.bitcast_convert_type(skey, jnp.int32)[:, None]
    p2 = p2f[:, None]
    p3 = p3f[:, None]

    # ---- step -> (tile, chunk) maps ----
    elem_tile = jnp.minimum(
        jax.lax.shift_right_logical(skey, jnp.uint32(fp_bits + tb)),
        jnp.uint32(n_tiles)).astype(jnp.int32)
    first_t = elem_tile[0::chunk]
    last_t = elem_tile[chunk - 1::chunk]
    span = jnp.where(
        first_t < n_tiles,
        jnp.minimum(last_t, n_tiles - 1) - first_t + 1,
        0,
    )
    # guarantee >= 1 active step so every out block is seeded even for an
    # all-invalid batch
    span = span.at[0].set(jnp.maximum(span[0], 1))
    first_t = first_t.at[0].set(jnp.minimum(first_t[0], n_tiles - 1))
    cum = jnp.cumsum(span) - span  # exclusive
    n_real = cum[-1] + span[-1]

    s_iota = jnp.arange(n_steps, dtype=jnp.int32)
    # chunk of step s: last c with cum[c] <= s (spans of 0 sort out naturally
    # because their cum equals the next chunk's)
    le = (cum[None, :] <= s_iota[:, None]) & (span[None, :] > 0)
    step_chunkv = jnp.max(
        jnp.where(le, jnp.arange(n_chunks, dtype=jnp.int32)[None, :], -1), axis=1)
    step_chunkv = jnp.maximum(step_chunkv, 0)
    step_tilev = first_t[step_chunkv] + (s_iota - cum[step_chunkv])
    active = s_iota < n_real
    # pads point at the LAST REAL step's (tile, chunk) so the loaded blocks
    # stay valid and nothing new is seeded/flushed
    last_tile = step_tilev[jnp.maximum(n_real - 1, 0)]
    last_chunk = step_chunkv[jnp.maximum(n_real - 1, 0)]
    step_tilev = jnp.where(active, step_tilev, last_tile)
    step_chunkv = jnp.where(active, step_chunkv, last_chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda s, st, sc, sa, sf: (sc[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda s, st, sc, sa, sf: (sc[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda s, st, sc, sa, sf: (sc[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda s, st, sc, sa, sf: (st[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda s, st, sc, sa, sf: (st[s], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda s, st, sc, sa, sf: (st[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda s, st, sc, sa, sf: (st[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, LANES), lambda s, st, sc, sa, sf: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda s, st, sc, sa, sf: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((tile_rows, LANES), jnp.float32)],
    )

    fp2, counts2, recsum, stats = pl.pallas_call(
        partial(_kernel, fp_bits, depth, chunk, tile_rows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((128, LANES), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        # tensor operand order: 4 prefetch + [p1, p2, p3, fp, counts]
        input_output_aliases={7: 0, 8: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        step_tilev, step_chunkv, active.astype(jnp.int32),
        jnp.full((1,), 1 if seed else 0, jnp.int32),
        p1, p2, p3, fp, counts,
    )

    high_flat = recsum.reshape(-1)[:n_reads].astype(jnp.int32)
    overflow = stats.reshape(-1)[0].astype(jnp.int32)
    return BucketBatchOut(fp=fp2, counts=counts2, high_per_read=high_flat,
                          overflow=overflow)
