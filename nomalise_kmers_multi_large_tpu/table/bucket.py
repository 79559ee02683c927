"""Bucket count table: exact, compact, Pallas-accelerated (k <= 15).

The production table for the TPU engine. Capabilities match the reference's
open-addressing table (``store_kmer`` normalise_kmers_multi_large.c:929-1053)
with exact sequential semantics, but the layout is designed for the MXU
instead of per-element probing: codes live in lane-wide bucket rows (64
slots by default) addressed
by a bijective mix of the code (ops/mix.py), and the whole batch is processed
by one fused Pallas kernel (ops/bucket_kernel.py) — no XLA scatter/gather
anywhere on the hot path. BucketTableWide below extends the design to
k = 16..31 with two-word Feistel keys and a two-plane fingerprint.

State mapping onto TableState:
  counts -> int32 [rows, lanes] slot counts (lanes = 64 default, see __init__)
  keys   -> int32 [rows, lanes] fingerprint+1 (0 = empty slot)
  used   -> int32 [] occupied slots (refreshed lazily)
  overflow -> int32 [] dropped inserts (bucket full); nonzero => grow

Unlike Direct/Hashed, this table exposes a whole-batch interface
(`process_batch`) that returns per-read high-window counts directly; the
engine prefers it when available because it folds classification and
aggregation into the kernel. The SortedStream interface (`count_and_update`)
is intentionally not implemented.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nomalise_kmers_multi_large_tpu.ops.bucket_kernel import (
    LANES, BucketBatchOut, bucket_batch, bucket_batch_wide,
)
from nomalise_kmers_multi_large_tpu.ops.mix import (
    feistel_words, mix32, unfeistel_np, unmix32_np,
)
from nomalise_kmers_multi_large_tpu.table.base import CountTable, TableState


#: default slots per bucket row (the production tables below); the cli
#: startup report and default_rows* size tables with this value, NOT the
#: kernel's 128-lane tile constant
DEFAULT_LANES = 64


def default_rows(k: int, memory_bytes: Optional[int] = None,
                 lanes: int = DEFAULT_LANES) -> int:
    """Pick bucket-row count: enough rows that fingerprints fit 16 bits
    (rows >= 4^k / 2^16), at least one 128-row tile, and — when a memory
    budget is given (reference --memory_start semantics, nk.c:676) — about
    8 bytes per slot of budget, capped at 4^k codes / lanes per-row headroom."""
    floor = max(128, (4 ** k) >> 16)
    # --memory_start describes the reference's HOST-RAM model (16 B/slot/cpu);
    # our table lives in HBM, so cap rows at 2^21 (1 GiB of fp+count state at
    # 64 lanes) regardless of the flag — overflow-triggered growth covers
    # the rare row that fills all its lanes.
    ceiling = max(floor, min(4 ** k // lanes, 1 << 21))
    if memory_bytes is None:
        rows = max(floor, 16384 if k >= 13 else floor)
    else:
        rows = floor
        while rows * lanes * 8 * 2 <= memory_bytes and rows < ceiling:
            rows *= 2
    return min(max(rows, floor), ceiling)


def _split_rows(keys, counts, fb: int, keys2):
    """Row-doubling remap shared by the narrow and wide tables: the entry at
    (r, fp) moves to row 2r + top_bit(fp) with fingerprint fp minus its top
    bit; each old row splits into two left-packed new rows. `keys2` (the wide
    table's second plane) follows the same lane permutation unchanged."""
    rows, lanes_n = keys.shape
    occ = keys != 0
    fpv = keys - 1                           # fingerprint (occupied lanes)
    top = jnp.where(occ, (fpv >> (fb - 1)) & 1, 2)
    order = jnp.argsort(top, axis=1, stable=True)
    sk = jnp.take_along_axis(keys, order, axis=1)
    sc = jnp.take_along_axis(counts, order, axis=1)
    sb = jnp.take_along_axis(keys2, order, axis=1) if keys2 is not None else None
    n0 = jnp.sum(top == 0, axis=1, keepdims=True)
    n1 = jnp.sum(top == 1, axis=1, keepdims=True)
    lanes = jnp.arange(lanes_n, dtype=jnp.int32)[None, :]
    newmask = (1 << (fb - 1)) - 1

    def strip(kk):
        # drop the consumed top fingerprint bit; keep the +1 empty-marker
        return jnp.where(kk != 0, ((kk - 1) & newmask) + 1, 0)

    def interleave(even, odd):
        return jnp.stack([even, odd], axis=1).reshape(2 * rows, lanes_n)

    shift_idx = jnp.minimum(lanes + n0, lanes_n - 1)
    even_k = strip(jnp.where(lanes < n0, sk, 0))
    odd_k = strip(jnp.where(
        lanes < n1, jnp.take_along_axis(sk, shift_idx, axis=1), 0))
    even_c = jnp.where(lanes < n0, sc, 0)
    odd_c = jnp.where(
        lanes < n1, jnp.take_along_axis(sc, shift_idx, axis=1), 0)
    out_b = None
    if sb is not None:
        even_b = jnp.where(lanes < n0, sb, 0)
        odd_b = jnp.where(
            lanes < n1, jnp.take_along_axis(sb, shift_idx, axis=1), 0)
        out_b = interleave(even_b, odd_b)
    return interleave(even_k, odd_k), interleave(even_c, odd_c), out_b


class BucketTable(CountTable):
    #: True on the k>15 subclass: two sort words, two fingerprint planes
    wide = False
    def __init__(self, k: int, rows: Optional[int] = None,
                 interpret: Optional[bool] = None, tile_rows: int = 128,
                 lanes: int = 64, chunk: int = 16384):
        if k > 15:
            raise ValueError("BucketTable currently supports k<=15 "
                             "(single-plane 30-bit codes)")
        self.k = k
        self.rows = rows or default_rows(k)
        #: slots per bucket row. 64 measures ~0.5 ms/batch faster than 128
        #: (the match/mboth VPU area halves; experiments/perf_kernel_ablate
        #: .py) and the per-row capacity stays ~5 sigma above the Poisson
        #: load at the 0.55 growth headroom.
        self.lanes = lanes
        self.tile_rows = min(tile_rows, self.rows)
        #: stream elements per grid chunk; every chunk-to-tile crossing
        #: costs an extra (mostly skipped) grid step, so bigger chunks cut
        #: crossing overhead at the price of VMEM stream blocks
        self.chunk = chunk
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret

    @property
    def capacity(self) -> int:
        return self.rows * self.lanes

    def init(self) -> TableState:
        return TableState(
            counts=jnp.zeros((self.rows, self.lanes), jnp.int32),
            keys=jnp.zeros((self.rows, self.lanes), jnp.int32),
            used=jnp.zeros((), jnp.int32),
            overflow=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def process_batch(
        self, state: TableState, lo: jax.Array, valid: jax.Array,
        *, depth: int, windows_per_read: int, seed: bool = False,
        chunk: int = 0,
    ) -> tuple[TableState, BucketBatchOut]:
        """One whole-batch upsert+classify. `lo` uint32 [R, W] code planes in
        stream order, `valid` bool [R, W]. Returns per-read high counts."""
        chunk = chunk or self.chunk
        n = lo.shape[0] * lo.shape[1]
        mixed = mix32(lo.reshape(n), 2 * self.k)
        return self.process_batch_mixed(
            state, mixed.reshape(lo.shape), valid, depth=depth,
            windows_per_read=windows_per_read, seed=seed, chunk=chunk)

    def process_batch_mixed(
        self, state: TableState, mixed: jax.Array, valid,
        *, depth: int, windows_per_read: int, seed: bool = False,
        chunk: int = 0, keyed: bool = False, relaxed: bool = False,
        rid_flat=None,
    ) -> tuple[TableState, BucketBatchOut]:
        """Same as process_batch but takes pre-mixed codes (uint32 [R, W]),
        e.g. from the fused ops/encode_kernel.py pass. With keyed=True the
        codes already carry the invalid-window sentinel and valid is unused
        (may be None). relaxed drops the read-id sort operand (arbitrary
        rank attribution among batch equals, ops/bucket_kernel.py).
        rid_flat optionally supplies the stream read ids precomputed
        (engine/step.py hoists them out of the step_many scan)."""
        chunk = chunk or self.chunk
        n = mixed.shape[0] * mixed.shape[1]
        out = bucket_batch(
            state.keys, state.counts, mixed.reshape(n),
            None if keyed else valid.reshape(n),
            k=self.k, rows=self.rows, depth=depth,
            windows_per_read=windows_per_read, chunk=chunk,
            tile_rows=self.tile_rows, lanes=self.lanes, seed=seed,
            keyed=keyed, interpret=self.interpret, relaxed=relaxed,
            rid_flat=rid_flat,
            n_reads=mixed.shape[0] if rid_flat is not None else 0,
        )
        new_state = TableState(
            counts=out.counts, keys=out.fp,
            used=state.used + out.inserted,   # live occupancy (in-kernel)
            overflow=state.overflow + out.overflow,
        )
        return new_state, out

    # ------------------------------------------------------------------
    def count_and_update(self, state, stream, seed=False):
        raise NotImplementedError(
            "BucketTable uses process_batch (whole-batch kernel), not the "
            "SortedStream interface")

    # ------------------------------------------------------------------
    @property
    def grow_headroom(self) -> float:
        """Engine grows when projected occupancy exceeds this fraction — early
        enough that no bucket row (Poisson-loaded via the bijective mix) comes
        near its lane capacity: at load 0.55 a 128-lane row averages ~70
        entries (~7 sigma from 128); 64-lane rows use 0.45 (mean ~29, ~6.5
        sigma from 64). Role of the reference's 0.8 load-factor trigger
        (nk.c:143,933-934), which likewise grows BEFORE any insert can fail
        (0.75 measurably drops at ~16k slots)."""
        return 0.55 if self.lanes >= 128 else 0.45

    @property
    def can_grow(self) -> bool:
        """Growable until capacity reaches 4^k, where every row holds exactly
        its `lanes` possible fingerprints and overflow is structurally
        impossible (and fp_bits >= 1 keeps the fingerprint plane nonempty)."""
        return self.capacity < 4 ** self.k

    def grown(self, state: TableState) -> tuple["BucketTable", TableState]:
        """Double the rows: the TPU-native analogue of the reference's rehash
        (expand_local_hash_table nk.c:1055-1108), as a pure local remap instead
        of a re-insertion loop. Row of code c is mix(c) >> fp_bits, so halving
        fp_bits sends the entry at (r, fp) to row 2r + top_bit(fp) with
        fingerprint fp minus its top bit — each old row splits into two new
        rows, left-packed, all in one vectorized XLA pass (no scatters, no
        probing, and unlike the reference's linear-probe rehash, no corruption).
        """
        fb = 2 * self.k - int(np.log2(self.rows))
        assert self.can_grow and fb >= 2, "table already at 4^k capacity"
        keys2x, cnt2x, _ = _split_rows(state.keys, state.counts, fb, None)
        new = BucketTable(self.k, rows=2 * self.rows,
                          interpret=self.interpret, tile_rows=self.tile_rows,
                          lanes=self.lanes, chunk=self.chunk)
        new_state = TableState(
            counts=cnt2x, keys=keys2x, used=state.used,
            overflow=state.overflow,  # keep the drop tally for reporting
        )
        return new, new_state

    def used_count(self, state: TableState,
                   seeded_lo: Optional[np.ndarray] = None) -> int:
        """Occupied slots (reference ht->used). Seeds are REAL entries here
        (count 0, fingerprint set) so no host-side seed bookkeeping needed."""
        return int(jnp.sum(state.keys != 0))

    def export(self, state: TableState,
               seeded_lo: Optional[np.ndarray] = None):
        """(hi, lo, count) of occupied slots in ascending code order — the
        same order DirectTable dumps, so -P output is table-implementation
        independent (the reference dumps its own slot order, which we
        deliberately normalize; see docs/ARCHITECTURE.md)."""
        fp = np.asarray(state.keys)
        cnt = np.asarray(state.counts)
        occ_r, occ_l = np.nonzero(fp)
        fp_bits = 2 * self.k - int(np.log2(self.rows))
        mixed = (occ_r.astype(np.uint64) << np.uint64(fp_bits)) | \
            (fp[occ_r, occ_l].astype(np.uint64) - 1)
        codes = unmix32_np(mixed.astype(np.uint32), 2 * self.k)
        vals = cnt[occ_r, occ_l].astype(np.int32)
        order = np.argsort(codes, kind="stable")
        codes, vals = codes[order], vals[order]
        hi = np.zeros_like(codes, dtype=np.uint32)
        return hi, codes.astype(np.uint32), vals


# ======================================================================
# Wide bucket table: exact k = 16..31.
# ======================================================================


def default_rows_wide(k: int, memory_bytes: Optional[int] = None,
                      lanes: int = DEFAULT_LANES) -> int:
    """Row count for the wide table. 4^k dwarfs any memory for k > 15, so
    this is a pure capacity choice: 2^14 rows (1M slots at 64 lanes, ~12 MB)
    by default — overflow/occupancy-triggered growth (engine) covers deeper
    data — or as much of --memory_start's budget as fits below the 2^20-row
    ceiling (reference --memory_start semantics, nk.c:676)."""
    floor, ceiling = 1 << 14, 1 << 20
    if memory_bytes is None:
        return floor
    bps = 8 if k == 16 else 12              # bytes/slot: 2 or 3 int32 planes
    rows = floor
    while rows * lanes * bps * 2 <= memory_bytes and rows < ceiling:
        rows *= 2
    return rows


class BucketTableWide(BucketTable):
    """Exact bucket table for k = 16..31 (codes up to 62 bits).

    Same design as BucketTable — lane-wide bucket rows addressed by a bijective
    mix of the code, one fused Pallas kernel per batch — but the mix is the
    two-word Feistel of ops/mix.py and the fingerprint spans TWO planes:
    ``keys`` holds (w1 & (2^row_shift - 1)) + 1 (0 = empty) and ``keys2``
    holds w2 (absent for k = 16, where the code fits one word). Serves the
    reference's k = 16..31 range (normalise_kmers_multi_large.c:724) at bucket
    speed instead of falling back to the serialized hashed table.
    """

    wide = True
    #: structural growth ceiling (rows); 2^21 rows = 268M slots (~3 GB HBM)
    MAX_ROWS = 1 << 21

    def __init__(self, k: int, rows: Optional[int] = None,
                 interpret: Optional[bool] = None, tile_rows: int = 128,
                 lanes: int = 64, chunk: int = 16384):
        if not 16 <= k <= 31:
            raise ValueError("BucketTableWide supports k=16..31")
        self.k = k
        self.rows = rows or default_rows_wide(k)
        assert self.rows >= 512, "wide bucket table needs rows >= 512"
        self.lanes = lanes
        self.tile_rows = min(tile_rows, self.rows)
        self.chunk = chunk
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret

    @property
    def has_plane_b(self) -> bool:
        return self.k > 16

    def init(self) -> TableState:
        return TableState(
            counts=jnp.zeros((self.rows, self.lanes), jnp.int32),
            keys=jnp.zeros((self.rows, self.lanes), jnp.int32),
            used=jnp.zeros((), jnp.int32),
            overflow=jnp.zeros((), jnp.int32),
            keys2=(jnp.zeros((self.rows, self.lanes), jnp.int32)
                   if self.has_plane_b else None),
        )

    # ------------------------------------------------------------------
    def process_batch(
        self, state: TableState, lo: jax.Array, valid: jax.Array,
        *, depth: int, windows_per_read: int, seed: bool = False,
        chunk: int = 0, hi: Optional[jax.Array] = None,
    ) -> tuple[TableState, BucketBatchOut]:
        """Non-fused entry: (hi, lo) uint32 code planes [R, W] + validity."""
        assert hi is not None, "wide table needs both code planes"
        n = lo.shape[0] * lo.shape[1]
        w1, w2 = feistel_words(hi.reshape(n), lo.reshape(n), 2 * self.k)
        return self.process_batch_keys(
            state, w1.reshape(lo.shape), w2.reshape(lo.shape),
            valid, depth=depth, windows_per_read=windows_per_read,
            seed=seed, chunk=chunk)

    def process_batch_keys(
        self, state: TableState, w1: jax.Array, w2: jax.Array, valid,
        *, depth: int, windows_per_read: int, seed: bool = False,
        chunk: int = 0, keyed: bool = False, relaxed: bool = False,
    ) -> tuple[TableState, BucketBatchOut]:
        """Feistel sort words (uint32 [R, W] each) -> batch upsert+classify.
        With keyed=True the words already carry the sentinel pair for invalid
        windows (ops/encode_kernel.py encode_keys_wide) and valid is unused."""
        chunk = chunk or self.chunk
        n = w1.shape[0] * w1.shape[1]
        out = bucket_batch_wide(
            state.keys, state.keys2, state.counts,
            w1.reshape(n), w2.reshape(n),
            None if keyed else valid.reshape(n),
            k=self.k, rows=self.rows, depth=depth,
            windows_per_read=windows_per_read, chunk=chunk,
            tile_rows=self.tile_rows, lanes=self.lanes, seed=seed,
            keyed=keyed, interpret=self.interpret, relaxed=relaxed,
        )
        new_state = TableState(
            counts=out.counts, keys=out.fpA,
            used=state.used + out.inserted,   # live occupancy (in-kernel)
            overflow=state.overflow + out.overflow, keys2=out.fpB,
        )
        bb = BucketBatchOut(fp=out.fpA, counts=out.counts,
                            high_per_read=out.high_per_read,
                            overflow=out.overflow, inserted=out.inserted)
        return new_state, bb

    def process_batch_mixed(self, *a, **kw):
        raise NotImplementedError("wide table consumes Feistel word pairs "
                                  "(process_batch_keys)")

    # ------------------------------------------------------------------
    @property
    def can_grow(self) -> bool:
        """Growable while the row_shift keeps >= 1 fingerprint bit in plane A
        and rows stay under the structural HBM ceiling."""
        return self.rows < self.MAX_ROWS

    def grown(self, state: TableState) -> tuple["BucketTableWide", TableState]:
        """Double the rows; identical remap to BucketTable.grown but the
        consumed bit comes from plane A (row = w1 >> row_shift) and plane B
        rides along unpermuted in value."""
        row_shift = 32 - int(np.log2(self.rows))
        assert self.can_grow and row_shift >= 2
        keys2x, cnt2x, keysb2x = _split_rows(
            state.keys, state.counts, row_shift, state.keys2)
        new = BucketTableWide(self.k, rows=2 * self.rows,
                              interpret=self.interpret,
                              tile_rows=self.tile_rows, lanes=self.lanes,
                              chunk=self.chunk)
        return new, TableState(counts=cnt2x, keys=keys2x, used=state.used,
                               overflow=state.overflow, keys2=keysb2x)

    def export(self, state: TableState,
               seeded_lo: Optional[np.ndarray] = None):
        """(hi, lo, count) of occupied slots in ascending code order."""
        fp = np.asarray(state.keys)
        cnt = np.asarray(state.counts)
        occ_r, occ_l = np.nonzero(fp)
        row_shift = 32 - int(np.log2(self.rows))
        w1 = (occ_r.astype(np.uint32) << np.uint32(row_shift)) | \
            (fp[occ_r, occ_l].astype(np.uint32) - 1)
        if state.keys2 is not None:
            w2 = np.asarray(state.keys2)[occ_r, occ_l].astype(np.uint32)
        else:
            w2 = np.zeros_like(w1)
        codes = unfeistel_np(w1, w2, 2 * self.k)
        vals = cnt[occ_r, occ_l].astype(np.int32)
        order = np.argsort(codes, kind="stable")
        codes, vals = codes[order], vals[order]
        return ((codes >> np.uint64(32)).astype(np.uint32),
                (codes & np.uint64(0xFFFFFFFF)).astype(np.uint32), vals)
