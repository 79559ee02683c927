"""The streaming normalization engine.

Orchestrates what the reference's ``main`` + thread layer does
(normalise_kmers_multi_large.c:2223-2455, :1772-1920): seed the table(s), open
per-shard outputs, stream each input file (pair) in record batches, run the jitted
device step, and write kept records — with JAX's async dispatch providing the
host/device overlap the reference gets from pthreads.

Shard model: ``--cpu N`` becomes N logical shards. Each shard owns an independent
table and output files and sees ``depth // N`` as its high-coverage threshold —
the reference's independent-per-thread design (README.md:68, depth_per_cpu :674).
Batches are dealt to shards round-robin (the reference deals contiguous byte
ranges; assignment is an internal detail — single-shard runs are bit-exact).
On a multi-device mesh the shards map onto devices (see parallel/).
"""
from __future__ import annotations

import sys
import time
from typing import Optional

import jax
import numpy as np

from nomalise_kmers_multi_large_tpu.config import Config
from nomalise_kmers_multi_large_tpu.engine.report import RunReport, ShardCounters
from nomalise_kmers_multi_large_tpu.engine.step import BatchStep
from nomalise_kmers_multi_large_tpu.io.pack import pack_batch
from nomalise_kmers_multi_large_tpu.io.reader import (
    FastxFile,
    RecordBatch,
    batch_iterator,
    paired_batch_iterator,
)
from nomalise_kmers_multi_large_tpu.io.writer import ShardWriter, output_filename
from nomalise_kmers_multi_large_tpu.ops.codec import decode_codes
from nomalise_kmers_multi_large_tpu.table import DirectTable, make_table


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Normalizer:
    """Single-process engine (one device; N logical shards)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg.validate()
        self.paired_any = bool(cfg.reverse_files)
        self.tables = [make_table(cfg) for _ in range(cfg.shards)]
        self.states = [t.init() for t in self.tables]
        self.steps: list[BatchStep] = []
        self.counters = [ShardCounters(s) for s in range(cfg.shards)]
        self.report = RunReport()
        self.writers: Optional[list[ShardWriter]] = None
        self.seeded_lo: Optional[np.ndarray] = None  # host set of seeded codes
        self._pad = 0  # adaptive padded read length (static per compiled step)
        self._steps_cache: dict = {}

    # ------------------------------------------------------------------
    def _get_step(self, shard: int, paired: bool) -> BatchStep:
        key = (paired, self.cfg.mode)
        if key not in self._steps_cache:
            self._steps_cache[key] = [
                BatchStep(
                    self.tables[s],
                    k=self.cfg.ksize,
                    depth_per_shard=self.cfg.depth_per_shard,
                    coverage=self.cfg.coverage,
                    canonical=self.cfg.canonical,
                    paired=paired,
                    mode=self.cfg.mode,
                    pair_rule=self.cfg.pair_rule,
                )
                for s in range(self.cfg.shards)
            ]
        return self._steps_cache[key][shard]

    def _pad_for(self, max_len: int) -> int:
        k = self.cfg.ksize
        need = max(int(max_len), k)
        if self.cfg.pad_read_len:
            return self.cfg.pad_read_len
        if need > self._pad:
            self._pad = _round_up(need + 1 - k, 128) + k - 1  # window count % 128
        return self._pad

    # ------------------------------------------------------------------
    def _pack(self, batch: RecordBatch, min_len: int):
        """Pack a RecordBatch into device-ready arrays in reference stream order."""
        cfg = self.cfg
        if batch.rev is not None:
            pad = self._pad_for(
                max(batch.fwd.seq_len.max(initial=0), batch.rev.seq_len.max(initial=0))
            )
            fb, fl = pack_batch(
                batch.fwd_file.data, batch.fwd.seq_start, batch.fwd.seq_len, pad, min_len
            )
            rb, rl = pack_batch(
                batch.rev_file.data, batch.rev.seq_start, batch.rev.seq_len, pad, min_len
            )
            # reference drops the whole pair if EITHER mate is short (:1551-1566)
            rec_valid = (fl > 0) & (rl > 0)
            fl = np.where(rec_valid, fl, 0)
            rl = np.where(rec_valid, rl, 0)
            n = fb.shape[0]
            bases = np.empty((2 * n, pad), np.uint8)
            bases[0::2] = fb
            bases[1::2] = rb
            lengths = np.empty(2 * n, np.int32)
            lengths[0::2] = fl
            lengths[1::2] = rl
            return bases, lengths, rec_valid
        pad = self._pad_for(batch.fwd.seq_len.max(initial=0))
        fb, fl = pack_batch(
            batch.fwd_file.data, batch.fwd.seq_start, batch.fwd.seq_len, pad, min_len
        )
        return fb, fl, fl > 0

    # ------------------------------------------------------------------
    def seed(self):
        """Sequential pre-pass (reference seed_kmer_hash, main :2242-2250): insert
        k-mers of the first records_to_seed records of EVERY input file with count
        0, so all shards start from an identical table."""
        cfg = self.cfg
        n_seed = cfg.records_to_seed
        files = []
        for i, f in enumerate(cfg.forward_files):
            files.append(f)
            if i < len(cfg.reverse_files):
                files.append(cfg.reverse_files[i])

        seed_codes: list[np.ndarray] = []
        seed_step = None
        for path in files:
            fx = FastxFile(path, cfg.is_input_fastq)
            remaining = n_seed
            for batch in batch_iterator(fx, min(cfg.batch_reads, n_seed)):
                take = min(len(batch), remaining)
                if take < len(batch):
                    batch = RecordBatch(fwd_file=batch.fwd_file, fwd=batch.fwd.slice(0, take))
                # seeding uses the strictly-greater length rule (len > k, :1347)
                bases, lengths, _ = self._pack(batch, cfg.ksize + 1)
                if isinstance(self.tables[0], DirectTable):
                    seed_codes.append(self._host_codes(bases, lengths))
                else:
                    if seed_step is None:
                        seed_step = self._get_step(0, paired=False)
                    self.states[0] = seed_step.seed_step(self.states[0], bases, lengths)
                remaining -= take
                if remaining <= 0:
                    break

        if isinstance(self.tables[0], DirectTable):
            if seed_codes:
                self.seeded_lo = np.unique(np.concatenate(seed_codes))
            else:
                self.seeded_lo = np.empty(0, np.uint32)
        else:
            # replicate the seeded table to every shard (copy_hash_table :908-927)
            for s in range(1, cfg.shards):
                self.states[s] = jax.tree.map(lambda x: x.copy(), self.states[0])

    def _host_codes(self, bases: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """Unique k-mer codes of a packed batch, computed on device and pulled to
        host (direct-table seeding only needs the code set for reporting)."""
        import jax.numpy as jnp

        from nomalise_kmers_multi_large_tpu.ops.codec import (
            encode_windows_canonical,
            window_validity,
        )

        hi, lo = encode_windows_canonical(
            jnp.asarray(bases), self.cfg.ksize, self.cfg.canonical
        )
        valid = window_validity(jnp.asarray(lengths), hi, lo, self.cfg.ksize)
        codes = np.asarray(jnp.where(valid, lo, 0)).ravel()
        u = np.unique(codes)
        return u[u != 0].astype(np.uint32)

    # ------------------------------------------------------------------
    def run(self) -> RunReport:
        cfg = self.cfg
        self.seed()
        if cfg.print_table:
            self._dump_seed_table()
        self.writers = [ShardWriter(cfg, s) for s in range(cfg.shards)]

        rr = 0  # round-robin shard cursor
        n_rev = len(cfg.reverse_files)
        for fi, fpath in enumerate(cfg.forward_files):
            paired = fi < n_rev
            if paired:
                print(
                    f"Processing file pair {fi + 1} of {len(cfg.forward_files)}: "
                    f"{fpath} and {cfg.reverse_files[fi]}"
                )
                fx = FastxFile(fpath, cfg.is_input_fastq)
                rx = FastxFile(cfg.reverse_files[fi], cfg.is_input_fastq)
                it = paired_batch_iterator(fx, rx, cfg.batch_reads)
            else:
                print(
                    f"Processing single-ended file {fi + 1} of "
                    f"{len(cfg.forward_files)}: {fpath}"
                )
                fx = FastxFile(fpath, cfg.is_input_fastq)
                it = batch_iterator(fx, cfg.batch_reads)
            sys.stdout.flush()

            pending = None  # (batch, shard, keep_dev, stats_dev) double buffer
            for batch in it:
                bases, lengths, rec_valid = self._pack(batch, cfg.ksize)
                shard = rr % cfg.shards
                rr += 1
                step = self._get_step(shard, paired)
                self.states[shard], keep, stats = step.step(
                    self.states[shard], bases, lengths, rec_valid
                )
                if pending is not None:
                    self._retire(*pending)
                pending = (batch, shard, keep, stats)
            if pending is not None:
                self._retire(*pending)

            # per-file aggregation (reference :1896-1912)
            self._refresh_unique_counts()
            self.report.absorb(self.counters)

        for c in self.counters:
            c.maybe_report(cfg.verbose, force=True)
        for w in self.writers:
            w.close()
        if cfg.print_table:
            self._dump_tables()
        self.report.final(paired=n_rev > 0)
        return self.report

    def _retire(self, batch, shard, keep_dev, stats_dev):
        keep = np.asarray(keep_dev)
        self.writers[shard].write_kept(batch, keep)
        c = self.counters[shard]
        c.processed += int(stats_dev.processed)
        c.printed += int(stats_dev.printed)
        c.skipped += int(stats_dev.skipped)
        c.maybe_report(self.cfg.verbose)

    def _refresh_unique_counts(self):
        for s in range(self.cfg.shards):
            t = self.tables[s]
            self.counters[s].unique_kmers = t.used_count(self.states[s], self.seeded_lo)

    # ------------------------------------------------------------------
    def _dump_seed_table(self):
        """-P seed dump: output_kmer_seeds.k{k}_norm{d}.tsv with count 0 rows
        (print_kmer_table :354-385 via main :2251)."""
        cfg = self.cfg
        path = output_filename(
            "output_kmer_seeds", cfg.ksize, cfg.depth_per_shard, -1, "tsv"
        )
        import os

        path = os.path.join(cfg.out_dir, path)
        if self.seeded_lo is not None:
            hi = np.zeros_like(self.seeded_lo)
            kmers = decode_codes(hi, self.seeded_lo, cfg.ksize)
            counts = np.zeros(len(kmers), np.int32)
        else:
            h, l, counts = self.tables[0].export(self.states[0])
            kmers = decode_codes(h, l, cfg.ksize)
            counts = np.zeros(len(kmers), np.int32)
        with open(path, "w") as f:
            for km, c in zip(kmers, counts):
                f.write(f"{km}\t{c}\n")

    def _dump_tables(self):
        cfg = self.cfg
        import os

        for s in range(cfg.shards):
            h, l, counts = self.tables[s].export(self.states[s], self.seeded_lo)
            kmers = decode_codes(h, l, cfg.ksize)
            path = os.path.join(
                cfg.out_dir,
                output_filename("output_kmer", cfg.ksize, cfg.depth_per_shard, s, "tsv"),
            )
            with open(path, "w") as f:
                for km, c in zip(kmers, counts):
                    f.write(f"{km}\t{c}\n")


def run(cfg: Config) -> RunReport:
    return Normalizer(cfg).run()
