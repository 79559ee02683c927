"""Direct-address count table: a dense int32[4^k] array indexed by the k-mer code.

This is exactly what the reference's open-addressing table degenerates to when the
user follows its own sizing advice ("a k=15 with 16gb ram per hash will produce no
collisions", normalise_kmers_multi_large.c:20-22): ``hash % capacity`` with
capacity = 4^k is the identity, every probe hits its home slot, and counting is
exact. We make that the primary representation for k <= 15 — no keys, no probing,
4 bytes/slot instead of the reference's 16, and every table access in a batch is a
gather/scatter over SORTED unique indices (monotone HBM sweep).

Code 0 (poly-A) is never inserted (reference drops it, :1483-1484), so slot 0 stays
zero and occupancy equals the number of nonzero slots.

Seeding (reference seed_kmer_hash :1322-1373) inserts codes with count 0; in a pure
count array those are invisible, and they only influence reporting (`used`) and the
-P dump — never a keep/skip decision. The engine therefore retains the seeded code
set host-side and `used_count`/`export` take it as an optional argument.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from nomalise_kmers_multi_large_tpu.ops.streamrank import SortedStream
from nomalise_kmers_multi_large_tpu.table.base import CountTable, TableState

_I32_MIN = np.int32(-(2**31))


class DirectTable(CountTable):
    def __init__(self, k: int):
        if k > 15:
            raise ValueError("DirectTable supports k<=15 (4^k int32 slots)")
        self.k = k
        self._capacity = 4**k

    @property
    def capacity(self) -> int:
        return self._capacity

    def init(self) -> TableState:
        return TableState(
            counts=jnp.zeros((self._capacity,), jnp.int32),
            keys=None,
            used=jnp.zeros((), jnp.int32),  # maintained lazily; see used_count
            overflow=jnp.zeros((), jnp.int32),
        )

    def count_and_update(self, state, stream: SortedStream, seed: bool = False):
        if seed:
            # Count-0 inserts don't change a count array; presence is tracked
            # host-side by the engine (module docstring).
            return state, jnp.zeros_like(stream.rank)

        # k<=15 => codes fit the lo plane; hi is zero for valid occurrences.
        # Invalid (sentinel) occurrences map to a negative index: dropped/filled.
        slot = jnp.where(stream.valid, stream.lo.astype(jnp.int32), _I32_MIN)

        prior = state.counts.at[slot].get(mode="fill", fill_value=0)
        observed = prior + stream.rank

        # One aggregated update per unique code, deposited at segment heads. The
        # indices are sorted and unique => XLA emits a fast monotone scatter.
        upd_idx = jnp.where(stream.boundary, slot, _I32_MIN)
        counts = state.counts.at[upd_idx].add(
            stream.mult, mode="drop", indices_are_sorted=True, unique_indices=True
        )
        return TableState(counts=counts, keys=None, used=state.used, overflow=state.overflow), observed

    # ------------------------------------------------------------------
    def relaxed_update(self, state: TableState, lo, valid):
        """Sort-free path for relaxed mode: per-occurrence prior gather in
        stream order + duplicate-index scatter-add. Skips the global sort and
        the unsort permutation entirely; within-record sequentiality is
        reconstructed by the caller's pair-local ranks."""
        slot = jnp.where(valid, lo.astype(jnp.int32), _I32_MIN)
        prior = state.counts.at[slot].get(mode="fill", fill_value=0)
        counts = state.counts.at[slot].add(
            jnp.where(valid, 1, 0), mode="drop"
        )
        return TableState(counts, None, state.used, state.overflow), prior

    def used_count(self, state: TableState, seeded_lo: Optional[np.ndarray] = None) -> int:
        """Occupied-slot count (reference ht->used): nonzero counts plus seeded
        codes whose count is still 0 (they occupy a slot in the reference)."""
        nonzero = int(jnp.count_nonzero(state.counts))
        if seeded_lo is not None and seeded_lo.size:
            idx = jnp.asarray(seeded_lo.astype(np.int64)).astype(jnp.int32)
            still_zero = int(jnp.sum(state.counts[idx] == 0))
            nonzero += still_zero
        return nonzero

    def export(self, state: TableState, seeded_lo: Optional[np.ndarray] = None):
        counts = np.asarray(state.counts)
        (occ,) = np.nonzero(counts)
        vals = counts[occ].astype(np.int32)
        if seeded_lo is not None and seeded_lo.size:
            zero_seeds = seeded_lo[counts[seeded_lo.astype(np.int64)] == 0]
            occ = np.concatenate([occ, zero_seeds.astype(np.int64)])
            vals = np.concatenate([vals, np.zeros(zero_seeds.shape[0], np.int32)])
            order = np.argsort(occ, kind="stable")
            occ, vals = occ[order], vals[order]
        hi = (occ >> 32).astype(np.uint32)  # always 0 for k<=15; kept for interface
        lo = (occ & 0xFFFFFFFF).astype(np.uint32)
        return hi, lo, vals
