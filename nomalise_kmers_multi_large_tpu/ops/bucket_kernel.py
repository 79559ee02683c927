"""Pallas bucket-table kernel: exact k-mer count + classify with zero scatters.

This is the TPU-native replacement for BOTH halves of the reference's hot loop
(``store_kmer`` normalise_kmers_multi_large.c:929-1053 upsert + the per-window
``count >= depth_per_cpu`` test of ``sequence_to_hash`` :1487-1497): one fused
device kernel that matches, inserts, counts, classifies, and aggregates
per-read tallies for an entire batch of reads.

Why not XLA scatter/gather: on TPU, XLA lowers both to a serialized per-element
loop (~8-15 ns/element measured, experiments/microbench_primitives.py), which
caps the whole engine at ~250k reads/s/chip. This kernel replaces them with
dense MXU one-hot matmuls over bucket tiles.

Data structure ("bucket table"):
  - A k-mer code c (2k <= 30 bits) is placed at ``m = mix(c)`` (bijective, see
    ops/mix.py). Bucket row = high bits of m, fingerprint = low ``fp_bits``
    bits. Each row holds up to `lanes` distinct codes (64 default — measured
    faster than 128; 128 for the wide kernel): ``fp[row, lane]`` stores
    fingerprint+1 (0 = empty), ``counts[row, lane]`` the count. Bijectivity
    makes this EXACT: (row, fingerprint) recovers c.
  - Batch windows are sorted by m (one stable 1-key sort — the only
    O(N log N) op), chunked, and each (tile of 128 rows, chunk) pair becomes a
    grid step in megablox style: scalar-prefetched step->tile/chunk maps drive
    the BlockSpec index_maps. Equal codes are adjacent, so an aggregated
    update per distinct code needs no atomics and no collision probing.

LANE-MAJOR layout (v2): the stream blocks are DENSE (subs, 2048) int32 tiles
and each 2048-element sub-slice keeps its elements on the LANE axis as (1, E)
vectors. Element-per-sublane (E, 1) blocks — the v1 layout — cost 6.4 us/step
in DMA alone (256 sparse (8,128) VMEM tiles per block, measured in
experiments/perf_gridshape.py) vs 1.3 us/step dense. All one-hot matmuls are
therefore TRANSPOSED: C[r, e] = onehot(row(e) == r) built by native
sublane-broadcast of (1, E) against a dim-0 iota, gathers contract dim 0
(C^T @ planes) and updates contract the lane dim (C @ M^T).

Per-element semantics (exact, reference-sequential): the element's observed
count is ``prior_table_count + rank`` where rank is its 1-based occurrence
rank among equal codes in stream order (ops/segscan.py); ``high`` means
observed >= depth. The kernel returns per-read sums of high windows.

In-kernel algorithm per step (E = 2048 lanes/sub-slice, R = 128 rows, L = 128
lanes), per sub-slice i:
  C[r,e]    = one-hot of the element's tile-local row (out-of-tile cols zero)
  gather    = [fp_hi|fp_lo|cnt_hi|cnt_lo]^T-contraction: (R,512)x(R,E)->(512,E)
  match     = (RowFP == fingerprint+1): (L,E) one-hot; ONE sublane reduction
              recovers both is_match and prior (cnt + 2^17 trick)
  delta    += C @ match^T     (counts update, flushed at tile switch)
  recsum   += Ar @ (Br * high)^T   (per-read high-window tallies)
Insert resolution (skipped entirely when the whole step matched): candidate j
of row r (cand = segscan-precomputed distinct-code index within the row) gets
lane occ[row] + #earlier candidates inserting this step, via one (R,L)
lane-prefix scan; fp writes and the inserted codes' count deltas contract the
same way. All matmuls are bf16 one-hots with f32 accumulation; every value is
an integer below 2^24, so everything is exact. Counts are clamped to 65535 for
the gather limbs which is lossless because depth <= 65535.
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
SUB = 2048           # elements per lane-major sub-slice
_SENT = jnp.uint32(0xFFFFFFFF)
_RID_BITS = 14       # read-id bits packed into spare w2 bits (n_reads <= 16384)


class BucketBatchOut(NamedTuple):
    fp: jax.Array        # int32 [rows, 128] updated fingerprints (+1; 0=empty)
    counts: jax.Array    # int32 [rows, 128] updated counts
    high_per_read: jax.Array  # int32 [n_reads] high-window count per read
    overflow: jax.Array  # int32 [] inserts dropped (bucket full / cand >= 128)
    inserted: jax.Array = None  # int32 [] slots newly occupied this batch


def _onehot(cond):
    """bf16 one-hot from a predicate. The f32 select is deliberate: masks from
    32-bit compares carry an (8,128) i1 layout, and selecting 16-bit values
    directly would force an unsupported (16,128) mask relayout in Mosaic."""
    return jnp.where(cond, 1.0, 0.0).astype(jnp.bfloat16)


def _kernel(fp_bits: int, depth: int, chunk: int, tile_rows: int,
            lanes: int, seed: bool, ablate: frozenset,
            # prefetch
            step_tile, step_chunk, step_active, step_skip,
            # inputs
            p1_ref, p2_ref, p3_ref, fp_in_ref, cnt_in_ref,
            # outputs
            fp_out_ref, cnt_out_ref, recsum_ref, stats_ref,
            # scratch
            delta_ref, ismatch_ref):
    s = pl.program_id(0)
    nsteps = pl.num_programs(0)
    tile = step_tile[s]
    active = step_active[s] != 0
    skipbits = step_skip[s]
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

    subs = chunk // SUB
    R = tile_rows
    fmask = jnp.int32((1 << fp_bits) - 1)
    # fold `active` into the tile id at SCALAR level: pad steps alias the
    # last real (tile, chunk) block, and tile_eff = -2 pushes every lrow
    # outside [0, R) so no vector op needs the scalar flag (mixing scalar
    # bools into vector masks trips Mosaic relayouts)
    tile_eff = jnp.where(active, tile, -2)

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, SUB), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (lanes, SUB), 0)
    li128 = jax.lax.broadcasted_iota(jnp.int32, (128, SUB), 0)

    def sub_out_of_tile(i):
        """Scalar predicate: sub-slice i has NO element in this step's tile.

        Rows ascend within a chunk (the stream is key-sorted), so the
        first/last element decides the whole sub-slice. Tile-crossing steps
        re-walk a whole chunk for the next tile; without this guard every
        crossing costs a full chunk of MXU work (~50% of the kernel at
        chunk ~= tile-run size). The per-(step, sub) verdicts are precomputed
        on the XLA side and shipped as a scalar-prefetched BITMASK
        (bucket_batch `step_skip`): the previous in-kernel version peeked at
        p1_ref[i, 0]/[i, SUB-1] — two serialized VMEM scalar loads in front
        of every lax.cond, ~32 per grid step across both passes.
        """
        return ((skipbits >> i) & 1) == 1

    mm = partial(jax.lax.dot_general, preferred_element_type=jnp.float32)
    # contract dim 0 of both: (R, P) x (R, E) -> (P, E)
    mm_00 = lambda a, b: mm(a, b, (((0,), (0,)), ((), ())))
    # contract dim 1 of both: (R, E) x (L, E) -> (R, L)
    mm_11 = lambda a, b: mm(a, b, (((1,), (1,)), ((), ())))

    def decode_sub(i):
        """Per-sub-slice (1, SUB) vectors + the C one-hot."""
        p1 = p1_ref[i:i + 1, :]                      # (1, SUB) int32 (sent<0)
        p2 = pltpu.bitcast(p2_ref[i:i + 1, :], jnp.uint32)
        cand = p3_ref[i:i + 1, :]
        grow = jax.lax.shift_right_logical(
            pltpu.bitcast(p1, jnp.uint32), jnp.uint32(fp_bits)
        ).astype(jnp.int32)
        lrow = grow - tile_eff * R
        fpv1 = jnp.bitwise_and(p1, fmask) + 1        # fingerprint+1, >= 1
        rank = jnp.bitwise_and(p2, jnp.uint32(0xFFFF)).astype(jnp.int32)
        rid = jax.lax.shift_right_logical(p2, jnp.uint32(16)).astype(jnp.int32)
        valid = (p1 >= 0) & (lrow >= 0) & (lrow < R)
        C = _onehot(lrow == r_iota)                  # (R, SUB)
        return C, fpv1, rank, rid, cand, valid

    # ---- pass A: match path (the steady-state hot loop) ----
    # Counts are clamped for the gather limbs: lossless for the decision
    # because only (prior + rank >= depth) matters. When depth fits one
    # 8-bit limb, the count plane collapses to a single limb (3 planes
    # instead of 4 — 25% less gather MXU work).
    one_limb = depth <= 255
    cnt_clamp = 255 if one_limb else 65535
    offset = 512.0 if one_limb else 131072.0
    fpt = fp_out_ref[:]
    cntt = jnp.minimum(cnt_out_ref[:], cnt_clamp)
    limbs = [
        (fpt >> 8).astype(jnp.bfloat16),
        (fpt & 255).astype(jnp.bfloat16),
    ]
    if one_limb:
        limbs.append(cntt.astype(jnp.bfloat16))
    else:
        limbs.append((cntt >> 8).astype(jnp.bfloat16))
        limbs.append((cntt & 255).astype(jnp.bfloat16))
    planes = jnp.concatenate(limbs, axis=1)          # (R, 384|512)

    delta_acc = jnp.zeros((R, lanes), jnp.float32)
    rec_acc = jnp.zeros((128, 128), jnp.float32)
    n_unmatched = jnp.zeros((), jnp.float32)

    for i in range(subs):
        def _do_a(args, i=i):
            delta_acc, rec_acc, n_unmatched = args
            C, fpv1, rank, rid, cand, valid = decode_sub(i)
            if "no_gather" in ablate:
                row_fp = jnp.zeros((lanes, SUB), jnp.float32)
                row_cnt = row_fp
            else:
                G = mm_00(planes, C)                 # (384|512, SUB) f32 exact
                row_fp = G[0:lanes] * 256.0 + G[lanes:2 * lanes]  # (L, SUB)
                if one_limb:
                    row_cnt = G[2 * lanes:3 * lanes]
                else:
                    row_cnt = G[2 * lanes:3 * lanes] * 256.0 + G[3 * lanes:]
            if "no_match" in ablate:
                match_bf = jnp.zeros((lanes, SUB), jnp.bfloat16)
                is_match = jnp.ones((1, SUB), jnp.float32)
                prior = jnp.zeros((1, SUB), jnp.float32)
            else:
                fpv1_f = fpv1.astype(jnp.float32)    # (1, SUB)
                eq = row_fp == fpv1_f                # (L, SUB) predicate
                # single sublane-reduction recovers BOTH is_match and prior:
                # counts are clamped below `offset`, and prior + offset < 2^24
                # is f32-exact; the select folds the old match-plane multiply
                # away. (An MXU ones-dot reduction variant measured 6% SLOWER
                # end-to-end — M=1 matmuls + extra bf16 casts lose to the VPU
                # tree; docs/PERF_NOTES.md round 2.)
                mboth = jnp.sum(
                    jnp.where(eq, row_cnt + offset, 0.0),
                    axis=0, keepdims=True)
                is_match = jnp.where(mboth >= offset, 1.0, 0.0)  # (1, SUB)
                prior = mboth - is_match * offset
                match_bf = _onehot(eq)               # (L, SUB) for the delta
            ismatch_ref[i:i + 1, :] = is_match
            n_un = n_unmatched + jnp.sum(
                jnp.where((is_match == 0.0) & valid, 1.0, 0.0))
            # seed mode (reference store_kmer do_init :962-963) never touches
            # counts and needs no per-read tallies: both matmuls drop out of
            # the compiled seed kernel entirely
            d_acc = delta_acc
            if not seed and "no_delta" not in ablate:
                d_acc = delta_acc + mm_11(C, match_bf)
            if seed or "no_recsum" in ablate:
                return d_acc, rec_acc, n_un
            observed = prior + rank.astype(jnp.float32)
            high = _onehot((observed >= float(depth)) & valid)  # (1, SUB)
            rrow = jax.lax.shift_right_logical(rid, 7)
            rcol = jnp.bitwise_and(rid, 127)
            Ar = _onehot(rrow == li128)              # (128, SUB) read-row
            Brh = _onehot(rcol == li128) * high      # (128, SUB) read-col
            return d_acc, rec_acc + mm_11(Ar, Brh), n_un

        delta_acc, rec_acc, n_unmatched = jax.lax.cond(
            sub_out_of_tile(i), lambda args: args, _do_a,
            (delta_acc, rec_acc, n_unmatched))

    recsum_ref[:] += rec_acc

    # ---- pass B: insert resolution; skipped when the whole step matched.
    # In steady state (deep stream, most k-mers already present) this is the
    # common case. ----
    def _insert_path(_):
        # candidate j of row r gets lane occ[r] + (# inserting candidates
        # j' < j), via one (R,L) lane-prefix scan + transposed lookups.
        occ = jnp.sum(jnp.where(fpt != 0, 1.0, 0.0), axis=1, keepdims=True)
        cnew = jnp.zeros((R, lanes), jnp.float32)
        for i in range(subs):
            def _do_b1(cnew, i=i):
                C, fpv1, rank, rid, cand, valid = decode_sub(i)
                is_match = ismatch_ref[i:i + 1, :]
                insert = ((is_match == 0.0) & (rank == 1) & valid
                          & (cand < lanes))
                B_cand = _onehot(cand == l_iota)     # (L, SUB)
                return cnew + mm_11(C * _onehot(insert), B_cand)

            cnew = jax.lax.cond(
                sub_out_of_tile(i), lambda cnew: cnew, _do_b1, cnew)
        # exclusive prefix along lanes via Hillis-Steele log-doubling
        tl_iota = jax.lax.broadcasted_iota(jnp.int32, (R, lanes), 1)
        inc = cnew
        shift = 1
        while shift < lanes:
            rolled = pltpu.roll(inc, shift, 1)   # rolled[:, j] = inc[:, j-shift]
            inc = inc + jnp.where(tl_iota >= shift, rolled, 0.0)
            shift *= 2
        M = (occ + (inc - cnew)).astype(jnp.bfloat16)   # (R, L): lane of cand j
        wrote = jnp.zeros((R, lanes), jnp.float32)
        delta_ins = jnp.zeros((R, lanes), jnp.float32)
        dropped = jnp.zeros((), jnp.float32)
        inserted = jnp.zeros((), jnp.float32)
        for i in range(subs):
            def _do_b2(args, i=i):
                wrote, delta_ins, dropped, inserted = args
                C, fpv1, rank, rid, cand, valid = decode_sub(i)
                is_match = ismatch_ref[i:i + 1, :]
                B_cand = _onehot(cand == l_iota)
                ML = mm_00(M, C)                     # (L, SUB): M[row(e), :]
                lane_new = jnp.sum(ML * B_cand.astype(jnp.float32),
                                   axis=0, keepdims=True)       # (1, SUB)
                fits = lane_new < float(lanes)
                unmatched = (is_match == 0.0) & valid & (cand < lanes) & fits
                # gate via the LANE INDEX (-1 = no column), not an (L, SUB)
                # broadcast mask AND (Mosaic i1 relayouts; see decode_sub in
                # the wide kernel)
                lane_eff = jnp.where(unmatched, lane_new, -1.0)
                B_new = _onehot(lane_eff == l_iota.astype(jnp.float32))
                insert = ((is_match == 0.0) & (rank == 1) & valid
                          & (cand < lanes))
                ins_f = _onehot(insert)
                B_ins = B_new * ins_f                # one writer per (r, l)
                f_hi = (fpv1 >> 8).astype(jnp.bfloat16)  # <= 256: bf16-exact
                f_lo = (fpv1 & 255).astype(jnp.bfloat16)
                w2 = wrote + (mm_11(C, B_ins * f_hi) * 256.0
                              + mm_11(C, B_ins * f_lo))
                d2 = delta_ins if seed else delta_ins + mm_11(C, B_new)
                dr2 = dropped + jnp.sum(
                    jnp.where((is_match == 0.0) & valid & (rank == 1)
                              & ((cand >= lanes) | jnp.logical_not(fits)),
                              1.0, 0.0))
                # actual writes this sub: first-of-run candidates that fit —
                # keeps state.used LIVE so the engine can gate growth on real
                # occupancy with no device sync
                in2 = inserted + jnp.sum(jnp.where(insert & fits, 1.0, 0.0))
                return w2, d2, dr2, in2

            wrote, delta_ins, dropped, inserted = jax.lax.cond(
                sub_out_of_tile(i), lambda args: args, _do_b2,
                (wrote, delta_ins, dropped, inserted))
        return wrote, delta_ins, dropped, inserted

    def _no_insert(_):
        z = jnp.zeros((R, lanes), jnp.float32)
        return z, z, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)

    wrote, delta_ins, dropped, inserted = jax.lax.cond(
        n_unmatched > 0.0, _insert_path, _no_insert, None)

    # ---- counts delta (seed inserts carry count 0: reference store_kmer
    # do_init path :962-963 — the delta matmuls are compiled out while
    # seeding, so both accumulators stay zero) ----
    delta_ref[:] += delta_acc + delta_ins
    fp_out_ref[:] = fp_out_ref[:] + wrote.astype(jnp.int32)

    # ---- stats: dropped inserts (bucket overflow or candidate >= 128) and
    # successful inserts (slot 1: the live-occupancy delta) ----
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) \
        + 128 * jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    stats_ref[:] += jnp.where(e_iota == 0, dropped, 0.0) \
        + jnp.where(e_iota == 1, inserted, 0.0)

    @pl.when(is_last)
    def _():
        cnt_out_ref[:] = cnt_out_ref[:] + delta_ref[:].astype(jnp.int32)
        delta_ref[:] = jnp.zeros_like(delta_ref)


def bucket_batch(
    fp, counts, mixed_flat, valid_flat, *,
    k: int, rows: int, depth: int, windows_per_read: int,
    chunk: int = 16384, tile_rows: int = TILE_ROWS, lanes: int = LANES,
    seed: bool = False,
    keyed: bool = False, interpret: bool = False, ablate: tuple = (),
    rid_flat=None, n_reads: int = 0, fp_bits: int = 0,
    relaxed: bool = False,
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
      chunk: elements per grid step (multiple of SUB = 2048).
      seed: insert-without-counting mode (reference seed pass semantics).
      keyed: mixed_flat already carries the sentinel for invalid windows
        (ops/encode_kernel.py output); valid_flat is ignored and may be None.
      rid_flat: optional int32 [N] explicit read id per element (Mode B
        routed streams, parallel/modes.py: elements arrive from other shards
        without the i // W position structure). Requires n_reads.
      n_reads: reads covered by high_per_read when rid_flat is given.
      fp_bits: override the fingerprint-bit count (Mode B row-range shards:
        a shard holds rows/D rows of the GLOBAL table, but fingerprints keep
        the global width; keys arrive already rebased to the shard).
      relaxed: drop the read-id sort operand (``--mode relaxed``): the sort
        compares codes only and breaks ties arbitrarily, so occurrence ranks
        among a batch's copies of one code are attributed to reads in
        arbitrary order instead of stream order. Table counts stay exact and
        the per-code observed-value multiset is unchanged — a far tighter
        relaxation than the reference's independent per-thread tables
        (README.md:68, normalise_kmers_multi_large.c:931).

    Returns BucketBatchOut. high_per_read covers n_reads reads.
    """
    n = mixed_flat.shape[0]
    w = windows_per_read
    if rid_flat is None:
        n_reads = n // w
        assert n_reads * w == n
    else:
        assert n_reads > 0
    assert n_reads <= 16384, "recsum block covers 16384 reads per batch"
    assert depth <= 65535
    rb = int(np.log2(rows))
    assert rows == 1 << rb
    fp_bits = fp_bits or (2 * k - rb)
    assert 1 <= fp_bits <= 16, (
        f"need rows >= 4^k/2^16: k={k} rows={rows} -> fp_bits={fp_bits}")
    tb = int(np.log2(tile_rows))
    assert tile_rows == 1 << tb and 8 <= tile_rows <= rows
    n_tiles = rows // tile_rows
    assert n_tiles >= 1
    subs = chunk // SUB
    assert chunk == subs * SUB and subs % 8 == 0, (
        f"chunk must be a multiple of {8 * SUB} (block sublane dim)")

    # pad the stream so both the scan kernel (32768-element blocks) and the
    # bucket grid (chunk-element blocks) divide it evenly
    quantum = max(chunk, _SCAN_BLOCK)
    assert quantum % chunk == 0 and quantum % _SCAN_BLOCK == 0
    npad = -(-n // quantum) * quantum
    pad = npad - n
    n_chunks = npad // chunk
    n_steps = n_chunks + n_tiles  # static bound: chunks + tile crossings

    key = mixed_flat if keyed else jnp.where(valid_flat, mixed_flat, _SENT)
    if pad:
        key = jnp.concatenate([key, jnp.full((pad,), _SENT, jnp.uint32)])
    # UNSTABLE 2-key (code, read_id) sort: ~20% cheaper than the 1-key stable
    # + position-payload sort (experiments/perf_sortu64.py). Read-level
    # semantics stay EXACT: ordering equal codes by read id reproduces the
    # reference's stream order across reads, and within one read the rank
    # assignment among equal copies is tally-invariant (the read's high-window
    # count is the same whichever copy takes which rank), so keep/skip
    # decisions, per-read tallies, and table counts are all unchanged.
    # relaxed demotes the read id to a pure payload (num_keys=1): the
    # comparator touches only the code word, ties break arbitrarily.
    if rid_flat is None:
        rid = jnp.minimum(jnp.arange(npad, dtype=jnp.int32) // w, n_reads - 1)
    else:
        rid = jnp.clip(rid_flat, 0, n_reads - 1)
        if pad:
            rid = jnp.concatenate(
                [rid, jnp.full((pad,), n_reads - 1, jnp.int32)])
    skey, srid = jax.lax.sort(
        (key, rid), num_keys=1 if relaxed else 2, is_stable=False)

    # rank within equal-code run + candidate index within bucket row, fused
    # into one bandwidth-bound Pallas pass (ops/segscan.py) — as XLA
    # cummax/cumsum these cost as much as the sort itself
    p2f, p3f = rank_cand_scan(skey, srid, fp_bits=fp_bits, w=w,
                              n_reads=n_reads, interpret=interpret)

    # lane-major dense stream blocks: (npad/SUB, SUB) int32
    p1 = jax.lax.bitcast_convert_type(skey, jnp.int32).reshape(-1, SUB)
    p2 = p2f.reshape(-1, SUB)
    p3 = p3f.reshape(-1, SUB)

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

    # per-(step, sub) skip verdicts, packed as one bitmask scalar per step
    # (subs <= 16): same first/last-element row test the kernel used to do
    # with VMEM scalar peeks, now a single SMEM prefetch read per step
    sg_first = jax.lax.bitcast_convert_type(
        jax.lax.shift_right_logical(skey[0::SUB], jnp.uint32(fp_bits)),
        jnp.int32).reshape(n_chunks, subs)
    sg_last = jax.lax.bitcast_convert_type(
        jax.lax.shift_right_logical(skey[SUB - 1::SUB], jnp.uint32(fp_bits)),
        jnp.int32).reshape(n_chunks, subs)
    te = jnp.where(active, step_tilev, -2)[:, None]          # (n_steps, 1)
    skip = (sg_last[step_chunkv] < te * tile_rows) \
        | (sg_first[step_chunkv] >= (te + 1) * tile_rows)
    step_skipv = jnp.sum(
        skip.astype(jnp.int32) << jnp.arange(subs, dtype=jnp.int32)[None, :],
        axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((subs, SUB), lambda s, st, sc, sa, sk: (sc[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((subs, SUB), lambda s, st, sc, sa, sk: (sc[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((subs, SUB), lambda s, st, sc, sa, sk: (sc[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, lanes),
                         lambda s, st, sc, sa, sk: (st[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, lanes),
                         lambda s, st, sc, sa, sk: (st[s], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, lanes),
                         lambda s, st, sc, sa, sk: (st[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, lanes),
                         lambda s, st, sc, sa, sk: (st[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda s, st, sc, sa, sk: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda s, st, sc, sa, sk: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_rows, lanes), jnp.float32),
            pltpu.VMEM((subs, SUB), jnp.float32),
        ],
    )

    fp2, counts2, recsum, stats = pl.pallas_call(
        partial(_kernel, fp_bits, depth, chunk, tile_rows, lanes, seed,
                frozenset(ablate)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, lanes), jnp.int32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.int32),
            jax.ShapeDtypeStruct((128, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        # tensor operand order: 4 prefetch + [p1, p2, p3, fp, counts]
        input_output_aliases={7: 0, 8: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        step_tilev, step_chunkv, active.astype(jnp.int32), step_skipv,
        p1, p2, p3, fp, counts,
    )

    high_flat = recsum.reshape(-1)[:n_reads].astype(jnp.int32)
    overflow = stats.reshape(-1)[0].astype(jnp.int32)
    inserted = stats.reshape(-1)[1].astype(jnp.int32)
    return BucketBatchOut(fp=fp2, counts=counts2, high_per_read=high_flat,
                          overflow=overflow, inserted=inserted)


# ======================================================================
# WIDE bucket kernel: exact k = 16..31 (codes up to 62 bits).
#
# The reference's hot loop serves k 5..31 with one code path
# (normalise_kmers_multi_large.c:724, 1459-1499); the narrow kernel above is
# hard-capped at 30-bit codes by its single 32-bit mixed word. This variant
# carries the bijectively mixed b = 2k-bit value (ops/mix.py feistel_words) as
# TWO uint32 sort words (w1 = top 32 bits, w2 = low b-32 bits):
#
#   bucket row   = w1 >> row_shift         (top rb bits; row_shift = 32 - rb)
#   fingerprint  = (fpA, fpB) = (w1 & (2^row_shift - 1)) + 1, w2)
#
# and the table stores TWO fingerprint planes, fpA (0 = empty slot) and fpB.
# All fingerprint traffic is 8-bit limbs: the gather contracts nF 8-bit
# windows of the CONCATENATED fingerprint bitstring fpA | fpB<<(row_shift+1)
# (each value < 256, bf16-exact; packing the A/B straggler bits into one
# window saves a gather plane + a match compare at k=17,18,21,22), the match
# ANDs per-window equalities (f32-exact — a combined compare would exceed
# f32's 2^24 integer range for b > 24-bit fingerprints), and inserts
# accumulate one f32 matmul per STORED-plane limb, recombined in int32. Everything else — lane-major stream blocks, scalar-
# prefetched (tile, chunk) grid, match-then-insert two-pass structure,
# aggregated per-read tallies — matches the narrow kernel; the two are kept
# separate so the narrow hot path keeps its cheaper single-compare match.
#
# Validity: the sentinel pair is (0xFFFFFFFF, 0xFFFFFFFF) and a real w2 is
# always < 2^(b-32) <= 2^30 (for b = 32, real w2 is 0), so ``w2 != 0xFFFFFFFF``
# is window validity. Unlike the narrow path, a sentinel's row (2^rb - 1)
# aliases the last REAL tile, so `valid` is folded into the match one-hot
# itself rather than relying on an out-of-range row.
# ======================================================================


class BucketBatchWideOut(NamedTuple):
    fpA: jax.Array       # int32 [rows, 128] fingerprint plane A (+1; 0=empty)
    fpB: jax.Array | None  # int32 [rows, 128] plane B (None when b == 32)
    counts: jax.Array    # int32 [rows, 128]
    high_per_read: jax.Array  # int32 [n_reads]
    overflow: jax.Array  # int32 []
    inserted: jax.Array = None  # int32 [] slots newly occupied this batch


def _kernel_wide(row_shift: int, nA: int, nB: int, bits_b: int, depth: int,
                 chunk: int, tile_rows: int, lanes: int, seed: bool,
                 ablate: frozenset,
                 # prefetch
                 step_tile, step_chunk, step_active, step_skip,
                 *refs):
    has_b = nB > 0
    if has_b:
        (p1_ref, pb_ref, p2_ref, p3_ref, fpA_in_ref, fpB_in_ref, cnt_in_ref,
         fpA_out_ref, fpB_out_ref, cnt_out_ref, recsum_ref, stats_ref,
         delta_ref, ismatch_ref) = refs
    else:
        (p1_ref, pb_ref, p2_ref, p3_ref, fpA_in_ref, cnt_in_ref,
         fpA_out_ref, cnt_out_ref, recsum_ref, stats_ref,
         delta_ref, ismatch_ref) = refs
        fpB_in_ref = fpB_out_ref = None

    s = pl.program_id(0)
    nsteps = pl.num_programs(0)
    tile = step_tile[s]
    active = step_active[s] != 0
    skipbits = step_skip[s]
    prev_tile = step_tile[jnp.maximum(s - 1, 0)]
    next_tile = step_tile[jnp.minimum(s + 1, nsteps - 1)]
    is_first = jnp.logical_or(s == 0, prev_tile != tile)
    is_last = jnp.logical_or(s == nsteps - 1, next_tile != tile)

    @pl.when(s == 0)
    def _():
        recsum_ref[:] = jnp.zeros_like(recsum_ref)
        stats_ref[:] = jnp.zeros_like(stats_ref)

    @pl.when(jnp.logical_and(is_first, active))
    def _():
        fpA_out_ref[:] = fpA_in_ref[:]
        if has_b:
            fpB_out_ref[:] = fpB_in_ref[:]
        cnt_out_ref[:] = cnt_in_ref[:]
        delta_ref[:] = jnp.zeros_like(delta_ref)

    subs = chunk // SUB
    R = tile_rows
    maskA = jnp.int32((1 << row_shift) - 1)
    tile_eff = jnp.where(active, tile, -2)

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, SUB), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (lanes, SUB), 0)
    li128 = jax.lax.broadcasted_iota(jnp.int32, (128, SUB), 0)

    def sub_out_of_tile(i):
        """Same fast-skip as the narrow kernel, via the precomputed scalar-
        prefetch bitmask (one SMEM read per step instead of two VMEM scalar
        loads per sub per pass). The mask ALSO flags all-sentinel subs, which
        the old row-range test could not (sentinels map to the last real
        row); real elements are never skipped: a sub with any real element
        has a non-sentinel first element."""
        return ((skipbits >> i) & 1) == 1

    mm = partial(jax.lax.dot_general, preferred_element_type=jnp.float32)
    mm_00 = lambda a, b: mm(a, b, (((0,), (0,)), ((), ())))
    mm_11 = lambda a, b: mm(a, b, (((1,), (1,)), ((), ())))

    def limb_f(x, j):
        """f32 (1, SUB) 8-bit limb j of an int32 vector (values >= 0)."""
        return ((x >> (8 * j)) & 255).astype(jnp.float32)

    def decode_sub(i):
        p1 = p1_ref[i:i + 1, :]                      # (1, SUB) w1 bits
        pb = pb_ref[i:i + 1, :]                      # (1, SUB) w2 bits
        p2 = pltpu.bitcast(p2_ref[i:i + 1, :], jnp.uint32)
        cand = p3_ref[i:i + 1, :]
        grow = jax.lax.shift_right_logical(
            pltpu.bitcast(p1, jnp.uint32), jnp.uint32(row_shift)
        ).astype(jnp.int32)
        lrow = grow - tile_eff * R
        fpvA = jnp.bitwise_and(p1, maskA) + 1        # 1 .. 2^row_shift
        rank = jnp.bitwise_and(p2, jnp.uint32(0xFFFF)).astype(jnp.int32)
        rid = jax.lax.shift_right_logical(p2, jnp.uint32(16)).astype(jnp.int32)
        valid = (pb != -1) & (lrow >= 0) & (lrow < R)
        # validity rides the ROW INDEX (invalid -> -1, no one-hot column)
        # instead of a broadcast (R, SUB) mask AND: i1 row-vector broadcasts
        # force Mosaic mask relayouts that measured ~2 ms/batch across the
        # two per-sub uses (experiments/perf_wide_ablate_r4.py; the narrow
        # kernel always excluded invalids arithmetically). A sentinel's
        # aliased last-real-tile row is likewise cut here: C = 0 keeps it
        # out of every gather/delta/recsum contraction.
        lrow_eff = jnp.where(valid, lrow, -1)
        C = _onehot(lrow_eff == r_iota)              # (R, SUB)
        return C, fpvA, pb, rank, rid, cand, valid

    # ---- pass A: match path ----
    one_limb = depth <= 255
    nc = 1 if one_limb else 2
    offset = 512.0 if one_limb else 131072.0
    fpt = fpA_out_ref[:]
    cntt = jnp.minimum(cnt_out_ref[:], 255 if one_limb else 65535)
    fpbt = fpB_out_ref[:] if has_b else None
    # PACKED fingerprint gather planes: contract 8-bit windows of the
    # CONCATENATED fingerprint bitstring fpA | fpB << (row_shift+1) instead
    # of per-plane limbs. fpA carries row_shift+1 bits (the +1 empty-marker
    # offset), fpB carries bits_b = 2k-32; packing merges their straggler
    # bits into one window whenever (row_shift+1 + bits_b) crosses one fewer
    # 8-bit boundary than the separate limb counts (k=17,18,21,22 at 2^14
    # rows: one fewer gather plane AND one fewer match compare). The STORED
    # layout is untouched — only pass A's gather/match read packed windows;
    # pass B still writes per-plane limbs.
    nbitsA = row_shift + 1
    nF = (nbitsA + bits_b + 7) // 8

    def packed_window(va, vb, lo):
        """Bits [lo, lo+8) of concat(va: nbitsA bits, vb: bits_b bits).
        Always <= 255, so bf16/f32 handling downstream is exact."""
        out = None
        if lo < nbitsA:
            take = min(8, nbitsA - lo)
            out = (va >> lo) & ((1 << take) - 1)
        if has_b and lo + 8 > nbitsA:
            if lo >= nbitsA:
                part_b = (vb >> (lo - nbitsA)) & 255
            else:
                part_b = (vb & ((1 << (lo + 8 - nbitsA)) - 1)) << (nbitsA - lo)
            out = part_b if out is None else out | part_b
        return out

    limbs = [packed_window(fpt, fpbt, 8 * j).astype(jnp.bfloat16)
             for j in range(nF)]
    if one_limb:
        limbs.append(cntt.astype(jnp.bfloat16))
    else:
        limbs += [(cntt >> 8).astype(jnp.bfloat16),
                  (cntt & 255).astype(jnp.bfloat16)]
    planes = jnp.concatenate(limbs, axis=1)          # (R, (nF+nc)*lanes)

    delta_acc = jnp.zeros((R, lanes), jnp.float32)
    rec_acc = jnp.zeros((128, 128), jnp.float32)
    n_unmatched = jnp.zeros((), jnp.float32)

    for i in range(subs):
        def _do_a(args, i=i):
            delta_acc, rec_acc, n_unmatched = args
            C, fpvA, fpvB, rank, rid, cand, valid = decode_sub(i)
            if "no_gather" in ablate:
                match = jnp.zeros((lanes, SUB), jnp.float32)
                is_match = jnp.ones((1, SUB), jnp.float32)
                prior = jnp.zeros((1, SUB), jnp.float32)
                ismatch_ref[i:i + 1, :] = is_match
                d_acc = delta_acc
                if not seed and "no_delta" not in ablate:
                    d_acc = delta_acc + mm_11(C, match.astype(jnp.bfloat16))
                if seed or "no_recsum" in ablate:
                    return d_acc, rec_acc, n_unmatched
                observed = prior + rank.astype(jnp.float32)
                high = _onehot((observed >= float(depth)) & valid)
                rrow = jax.lax.shift_right_logical(rid, 7)
                rcol = jnp.bitwise_and(rid, 127)
                Ar = _onehot(rrow == li128)
                Brh = _onehot(rcol == li128) * high
                return d_acc, rec_acc + mm_11(Ar, Brh), n_unmatched
            G = mm_00(planes, C)                     # ((nF+nc)*L, SUB)
            # no (L, SUB) valid AND: an invalid element's C column is zero,
            # so a garbage all-zero-window "match" contributes nothing to
            # delta (C-gated) or recsum/inserts (valid-gated); mboth's junk
            # prior is discarded the same way. All-window equality is an
            # |diff| accumulation (integers <= nF*255, f32-exact) with ONE
            # compare — pure f32, no (L, SUB) i1 mask ops at all
            diff = jnp.abs(G[0:lanes] - packed_window(
                fpvA, fpvB, 0).astype(jnp.float32))
            for j in range(1, nF):
                diff = diff + jnp.abs(
                    G[j * lanes:(j + 1) * lanes]
                    - packed_window(fpvA, fpvB, 8 * j).astype(jnp.float32))
            match = jnp.where(diff == 0.0, 1.0, 0.0)  # (L, SUB) f32
            co = nF * lanes
            if one_limb:
                row_cnt = G[co:co + lanes]
            else:
                row_cnt = G[co:co + lanes] * 256.0 + G[co + lanes:]
            mboth = jnp.sum(match * (row_cnt + offset), axis=0, keepdims=True)
            is_match = jnp.where(mboth >= offset, 1.0, 0.0)
            prior = mboth - is_match * offset
            ismatch_ref[i:i + 1, :] = is_match
            n_un = n_unmatched + jnp.sum(
                jnp.where((is_match == 0.0) & valid, 1.0, 0.0))
            d_acc = delta_acc
            if not seed and "no_delta" not in ablate:
                d_acc = delta_acc + mm_11(C, match.astype(jnp.bfloat16))
            if seed or "no_recsum" in ablate:
                return d_acc, rec_acc, n_un
            observed = prior + rank.astype(jnp.float32)
            high = _onehot((observed >= float(depth)) & valid)
            rrow = jax.lax.shift_right_logical(rid, 7)
            rcol = jnp.bitwise_and(rid, 127)
            Ar = _onehot(rrow == li128)
            Brh = _onehot(rcol == li128) * high
            return d_acc, rec_acc + mm_11(Ar, Brh), n_un

        delta_acc, rec_acc, n_unmatched = jax.lax.cond(
            sub_out_of_tile(i), lambda args: args, _do_a,
            (delta_acc, rec_acc, n_unmatched))

    recsum_ref[:] += rec_acc

    # ---- pass B: insert resolution (skipped when every element matched) ----
    nW = nA + nB  # fingerprint limb planes written per insert

    def _insert_path(_):
        occ = jnp.sum(jnp.where(fpt != 0, 1.0, 0.0), axis=1, keepdims=True)
        cnew = jnp.zeros((R, lanes), jnp.float32)
        for i in range(subs):
            def _do_b1(cnew, i=i):
                C, fpvA, fpvB, rank, rid, cand, valid = decode_sub(i)
                is_match = ismatch_ref[i:i + 1, :]
                insert = ((is_match == 0.0) & (rank == 1) & valid
                          & (cand < lanes))
                B_cand = _onehot(cand == l_iota)
                return cnew + mm_11(C * _onehot(insert), B_cand)

            cnew = jax.lax.cond(
                sub_out_of_tile(i), lambda cnew: cnew, _do_b1, cnew)
        tl_iota = jax.lax.broadcasted_iota(jnp.int32, (R, lanes), 1)
        inc = cnew
        shift = 1
        while shift < lanes:
            rolled = pltpu.roll(inc, shift, 1)
            inc = inc + jnp.where(tl_iota >= shift, rolled, 0.0)
            shift *= 2
        M = (occ + (inc - cnew)).astype(jnp.bfloat16)
        wrote = [jnp.zeros((R, lanes), jnp.float32) for _ in range(nW)]
        delta_ins = jnp.zeros((R, lanes), jnp.float32)
        dropped = jnp.zeros((), jnp.float32)
        inserted = jnp.zeros((), jnp.float32)
        for i in range(subs):
            def _do_b2(args, i=i):
                *wrote, delta_ins, dropped, inserted = args
                C, fpvA, fpvB, rank, rid, cand, valid = decode_sub(i)
                is_match = ismatch_ref[i:i + 1, :]
                B_cand = _onehot(cand == l_iota)
                ML = mm_00(M, C)
                lane_new = jnp.sum(ML * B_cand.astype(jnp.float32),
                                   axis=0, keepdims=True)
                fits = lane_new < float(lanes)
                unmatched = (is_match == 0.0) & valid & (cand < lanes) & fits
                lane_eff = jnp.where(unmatched, lane_new, -1.0)  # no i1 AND
                B_new = _onehot(lane_eff == l_iota.astype(jnp.float32))
                insert = ((is_match == 0.0) & (rank == 1) & valid
                          & (cand < lanes))
                B_ins = B_new * _onehot(insert)      # one writer per (r, l)
                w2 = []
                for j in range(nW):
                    src = fpvA if j < nA else fpvB
                    lf = limb_f(src, j if j < nA else j - nA) \
                        .astype(jnp.bfloat16)        # < 256: bf16-exact
                    w2.append(wrote[j] + mm_11(C, B_ins * lf))
                d2 = delta_ins if seed else delta_ins + mm_11(C, B_new)
                dr2 = dropped + jnp.sum(
                    jnp.where((is_match == 0.0) & valid & (rank == 1)
                              & ((cand >= lanes) | jnp.logical_not(fits)),
                              1.0, 0.0))
                # live-occupancy delta (see narrow kernel)
                in2 = inserted + jnp.sum(jnp.where(insert & fits, 1.0, 0.0))
                return (*w2, d2, dr2, in2)

            out = jax.lax.cond(
                sub_out_of_tile(i), lambda args: args, _do_b2,
                (*wrote, delta_ins, dropped, inserted))
            *wrote, delta_ins, dropped, inserted = out
        return (*wrote, delta_ins, dropped, inserted)

    def _no_insert(_):
        z = jnp.zeros((R, lanes), jnp.float32)
        return (*[z] * nW, z, jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32))

    if "no_insert" in ablate:
        out = _no_insert(None)
    else:
        out = jax.lax.cond(n_unmatched > 0.0, _insert_path, _no_insert, None)
    *wrote, delta_ins, dropped, inserted = out

    delta_ref[:] += delta_acc + delta_ins
    # recombine per-limb f32 write accumulators in INT32 (fingerprints reach
    # 2^30 — beyond f32's exact-integer range, so no f32 combine here)
    wA = wrote[0].astype(jnp.int32)
    for j in range(1, nA):
        wA = wA + (wrote[j].astype(jnp.int32) << (8 * j))
    fpA_out_ref[:] = fpA_out_ref[:] + wA
    if has_b:
        wB = wrote[nA].astype(jnp.int32)
        for j in range(1, nB):
            wB = wB + (wrote[nA + j].astype(jnp.int32) << (8 * j))
        fpB_out_ref[:] = fpB_out_ref[:] + wB

    e_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) \
        + 128 * jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    stats_ref[:] += jnp.where(e_iota == 0, dropped, 0.0) \
        + jnp.where(e_iota == 1, inserted, 0.0)

    @pl.when(is_last)
    def _():
        cnt_out_ref[:] = cnt_out_ref[:] + delta_ref[:].astype(jnp.int32)
        delta_ref[:] = jnp.zeros_like(delta_ref)


def bucket_batch_wide(
    fpA, fpB, counts, w1_flat, w2_flat, valid_flat, *,
    k: int, rows: int, depth: int, windows_per_read: int,
    chunk: int = 16384, tile_rows: int = TILE_ROWS, lanes: int = LANES,
    seed: bool = False,
    keyed: bool = False, interpret: bool = False, ablate: tuple = (),
    rid_flat=None, n_reads: int = 0, row_shift: int = 0,
    relaxed: bool = False,
):
    """One batch through the WIDE bucket table (k = 16..31).

    Args:
      fpA, counts: int32 [rows, 128]; fpB int32 [rows, 128] or None (k == 16).
      w1_flat, w2_flat: uint32 [N] Feistel sort words (ops/mix.py
        feistel_words) in stream order.
      keyed: words already carry the sentinel PAIR for invalid windows
        (ops/encode_kernel.py encode_keys_wide); valid_flat ignored.
      rid_flat / n_reads / row_shift: Mode B row-range sharding support,
        exactly as in bucket_batch (row_shift plays fp_bits' role: a shard's
        w1 keys arrive rebased but keep the global fingerprint width).
      relaxed: ``--mode relaxed`` — arbitrary-order rank attribution among a
        batch's equal codes (see bucket_batch). Only changes the k >= 25
        sort (read id demoted from 3rd comparator key to payload); the
        k <= 24 packed path already sorts two operands with the read id
        riding w2's spare bits, so there is nothing left to drop.

    Returns BucketBatchWideOut.
    """
    n = w1_flat.shape[0]
    w = windows_per_read
    if rid_flat is None:
        n_reads = n // w
        assert n_reads * w == n
    else:
        assert n_reads > 0
    assert n_reads <= 16384
    assert depth <= 65535
    b = 2 * k
    assert 32 <= b <= 62
    rb = int(np.log2(rows))
    assert rows == 1 << rb, f"rows must be a power of two, got {rows}"
    if row_shift:
        # Mode B row-range shard: `rows` is the LOCAL row count but the
        # fingerprint keeps the GLOBAL width; only that width is constrained
        assert row_shift <= 23, (
            f"global wide table needs >= 512 rows (row_shift {row_shift})")
    else:
        assert rb >= 9, f"wide bucket table needs rows >= 512, got {rows}"
    row_shift = row_shift or (32 - rb)   # fpA bits; fpA value <= 2^row_shift
    nA = (row_shift + 1 + 7) // 8        # 8-bit limbs covering fpA (+1 offset)
    nB = (b - 32 + 7) // 8               # limbs covering fpB = w2
    has_b = nB > 0
    assert (fpB is not None) == has_b
    tb = int(np.log2(tile_rows))
    assert tile_rows == 1 << tb and 8 <= tile_rows <= rows
    n_tiles = rows // tile_rows
    subs = chunk // SUB
    assert chunk == subs * SUB and subs % 8 == 0

    quantum = max(chunk, _SCAN_BLOCK)
    npad = -(-n // quantum) * quantum
    pad = npad - n
    n_chunks = npad // chunk
    n_steps = n_chunks + n_tiles

    if keyed:
        k1, k2 = w1_flat, w2_flat
    else:
        k1 = jnp.where(valid_flat, w1_flat, _SENT)
        k2 = jnp.where(valid_flat, w2_flat, _SENT)
    if pad:
        k1 = jnp.concatenate([k1, jnp.full((pad,), _SENT, jnp.uint32)])
        k2 = jnp.concatenate([k2, jnp.full((pad,), _SENT, jnp.uint32)])
    if rid_flat is None:
        rid = jnp.minimum(jnp.arange(npad, dtype=jnp.int32) // w, n_reads - 1)
    else:
        rid = jnp.clip(rid_flat, 0, n_reads - 1)
        if pad:
            rid = jnp.concatenate(
                [rid, jnp.full((pad,), n_reads - 1, jnp.int32)])
    # w2 carries only b-32 real bits; whenever b-32 + the rid bits this batch
    # actually needs (ceil log2 n_reads) fit BELOW the sentinel, pack rid
    # into w2's spare low bits and sort TWO operands instead of three — each
    # sort operand costs ~0.8 ns/element (experiments/perf_sort_r3.py), so
    # this takes ~30% off the wide step. At the 16384-read cap that covers
    # k <= 24; smaller batches extend it (k=25 at <= 8192 reads, k=26 at
    # <= 2048, ... — the dynamic generalization of the fixed-14-bit scheme).
    # Order is unchanged: (w1, (w2 << rb) | rid) sorts exactly like
    # (w1, w2, rid). A real packed word stays < 2^31 < 0xFFFFFFFF, so the
    # sentinel (and with it window validity, pb != -1 in the kernel) survives
    # even for the one REAL code whose w1 mixes to 0xFFFFFFFF — the case that
    # forces 3 keys when w2 has no spare bits.
    rbits = max(1, int(np.ceil(np.log2(max(n_reads, 2)))))
    if (b - 32) + rbits <= 31:
        k2p = jnp.where(
            k2 == _SENT, _SENT,
            (k2 << jnp.uint32(rbits)) | rid.astype(jnp.uint32))
        skey1, sk2p = jax.lax.sort((k1, k2p), num_keys=2, is_stable=False)
        srid = jax.lax.bitcast_convert_type(
            sk2p & jnp.uint32((1 << rbits) - 1), jnp.int32)
        skey2 = jnp.where(sk2p == _SENT, _SENT,
                          sk2p >> jnp.uint32(rbits))
    else:
        # k >= 25: no spare w2 bits for the read id. exact needs it as the
        # 3rd comparator key (stream-order tie-break); relaxed demotes it to
        # a payload, saving one comparator operand (~0.8 ns/element).
        skey1, skey2, srid = jax.lax.sort(
            (k1, k2, rid), num_keys=2 if relaxed else 3, is_stable=False)

    p2f, p3f = rank_cand_scan(skey1, srid, fp_bits=0, w=w, n_reads=n_reads,
                              interpret=interpret, skey2=skey2,
                              row_shift=row_shift)

    p1 = jax.lax.bitcast_convert_type(skey1, jnp.int32).reshape(-1, SUB)
    pb = jax.lax.bitcast_convert_type(skey2, jnp.int32).reshape(-1, SUB)
    p2 = p2f.reshape(-1, SUB)
    p3 = p3f.reshape(-1, SUB)

    # step -> (tile, chunk) maps; sentinels map PAST the last tile so pad
    # chunks get span 0 (their w1 row would alias the last real tile)
    elem_tile = jnp.where(
        skey2 == _SENT,
        jnp.int32(n_tiles),
        jax.lax.shift_right_logical(
            skey1, jnp.uint32(row_shift + tb)).astype(jnp.int32))
    first_t = elem_tile[0::chunk]
    last_t = elem_tile[chunk - 1::chunk]
    span = jnp.where(
        first_t < n_tiles,
        jnp.minimum(last_t, n_tiles - 1) - first_t + 1,
        0,
    )
    span = span.at[0].set(jnp.maximum(span[0], 1))
    first_t = first_t.at[0].set(jnp.minimum(first_t[0], n_tiles - 1))
    cum = jnp.cumsum(span) - span
    n_real = cum[-1] + span[-1]

    s_iota = jnp.arange(n_steps, dtype=jnp.int32)
    le = (cum[None, :] <= s_iota[:, None]) & (span[None, :] > 0)
    step_chunkv = jnp.max(
        jnp.where(le, jnp.arange(n_chunks, dtype=jnp.int32)[None, :], -1),
        axis=1)
    step_chunkv = jnp.maximum(step_chunkv, 0)
    step_tilev = first_t[step_chunkv] + (s_iota - cum[step_chunkv])
    active = s_iota < n_real
    last_tile = step_tilev[jnp.maximum(n_real - 1, 0)]
    last_chunk = step_chunkv[jnp.maximum(n_real - 1, 0)]
    step_tilev = jnp.where(active, step_tilev, last_tile)
    step_chunkv = jnp.where(active, step_chunkv, last_chunk)

    # per-(step, sub) skip bitmask (see the narrow kernel). An all-sentinel
    # sub is also skipped outright: sentinels sort last, so its FIRST element
    # being a sentinel proves the sub holds no real work (the in-kernel
    # row-range test could not skip these — sentinel w1 maps to the last
    # real row).
    sg_first = jax.lax.bitcast_convert_type(
        jax.lax.shift_right_logical(skey1[0::SUB], jnp.uint32(row_shift)),
        jnp.int32).reshape(n_chunks, subs)
    sg_last = jax.lax.bitcast_convert_type(
        jax.lax.shift_right_logical(skey1[SUB - 1::SUB], jnp.uint32(row_shift)),
        jnp.int32).reshape(n_chunks, subs)
    all_sent = (skey2[0::SUB] == _SENT).reshape(n_chunks, subs)
    te = jnp.where(active, step_tilev, -2)[:, None]          # (n_steps, 1)
    skip = (sg_last[step_chunkv] < te * tile_rows) \
        | (sg_first[step_chunkv] >= (te + 1) * tile_rows) \
        | all_sent[step_chunkv]
    step_skipv = jnp.sum(
        skip.astype(jnp.int32) << jnp.arange(subs, dtype=jnp.int32)[None, :],
        axis=1)

    stream_spec = pl.BlockSpec((subs, SUB),
                               lambda s, st, sc, sa, sk: (sc[s], 0),
                               memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((tile_rows, lanes),
                             lambda s, st, sc, sa, sk: (st[s], 0),
                             memory_space=pltpu.VMEM)
    in_specs = [stream_spec] * 4 + [tile_spec] * (3 if has_b else 2)
    out_specs = [tile_spec] * (3 if has_b else 2) + [
        pl.BlockSpec((128, 128), lambda s, st, sc, sa, sk: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 128), lambda s, st, sc, sa, sk: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((rows, lanes), jnp.int32)] \
        * (3 if has_b else 2) + [
        jax.ShapeDtypeStruct((128, 128), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((tile_rows, lanes), jnp.float32),
            pltpu.VMEM((subs, SUB), jnp.float32),
        ],
    )

    # tensor operand order: 4 prefetch + [p1, pb, p2, p3, fpA, (fpB), counts]
    if has_b:
        aliases = {8: 0, 9: 1, 10: 2}
        operands = (p1, pb, p2, p3, fpA, fpB, counts)
    else:
        aliases = {8: 0, 9: 1}
        operands = (p1, pb, p2, p3, fpA, counts)

    outs = pl.pallas_call(
        partial(_kernel_wide, row_shift, nA, nB, b - 32, depth, chunk,
                tile_rows, lanes, seed, frozenset(ablate)),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(step_tilev, step_chunkv, active.astype(jnp.int32), step_skipv,
      *operands)

    if has_b:
        fpA2, fpB2, counts2, recsum, stats = outs
    else:
        fpA2, counts2, recsum, stats = outs
        fpB2 = None
    high_flat = recsum.reshape(-1)[:n_reads].astype(jnp.int32)
    overflow = stats.reshape(-1)[0].astype(jnp.int32)
    inserted = stats.reshape(-1)[1].astype(jnp.int32)
    return BucketBatchWideOut(fpA=fpA2, fpB=fpB2, counts=counts2,
                              high_per_read=high_flat, overflow=overflow,
                              inserted=inserted)
