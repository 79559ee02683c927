"""Multi-device streaming engine.

Extends the single-device Normalizer to a device mesh:

- Mode A ("local", default): one table shard per device (the reference's
  independent-per-thread model, normalise_kmers_multi_large.c README.md:68);
  every batch is row-sliced across devices, shard s writing to thread-s output
  files and seeing depth // n_devices as its threshold. Zero inter-device
  communication except the psum'd counters — scaling is linear by construction.
- Mode B ("global"): one exact table sharded over all devices by slot range;
  XLA GSPMD inserts the collectives. Single logical shard: thread-0 outputs,
  full-depth threshold, decisions identical to a single-device exact run.

Batches are padded to a multiple of the device count with invalid records
(length 0), which contribute nothing in exact mode.
"""
from __future__ import annotations

import numpy as np

from nomalise_kmers_multi_large_tpu.config import Config
from nomalise_kmers_multi_large_tpu.engine.pipeline import Normalizer
from nomalise_kmers_multi_large_tpu.engine.step import BatchStep
from nomalise_kmers_multi_large_tpu.parallel.mesh import data_mesh
from nomalise_kmers_multi_large_tpu.parallel.modes import ModeAStep, ModeBStep


class MeshNormalizer(Normalizer):
    def __init__(self, cfg: Config, n_devices: int = 0):
        import jax

        import dataclasses

        ndev = n_devices or cfg.n_devices or jax.device_count()
        self.ndev = ndev
        self.mode_b = cfg.sharding == "global"
        if self.mode_b:
            eff = cfg if cfg.shards == 1 else dataclasses.replace(cfg, shards=1)
        else:
            # Mode A: one shard per device (reference cpus -> devices)
            eff = cfg if cfg.shards == ndev else dataclasses.replace(cfg, shards=ndev)
        if eff.checkpoint_every or eff.resume:
            raise NotImplementedError(
                "checkpointing is single-device only in this version"
            )
        super().__init__(eff, _single_state=True)
        self.mesh = data_mesh(ndev)
        self._mode_steps: dict = {}
        self._stacked = None       # Mode A stacked states
        self._global_state = None  # Mode B state

    # ------------------------------------------------------------------
    def _mode_step(self, paired: bool):
        key = paired
        if key not in self._mode_steps:
            base = BatchStep(
                self.tables[0],
                k=self.cfg.ksize,
                depth_per_shard=self.cfg.depth_per_shard,
                coverage=self.cfg.coverage,
                canonical=self.cfg.canonical,
                paired=paired,
                mode=self.cfg.mode,
                pair_rule=self.cfg.pair_rule,
                stride=self.cfg.stride,
            )
            cls = ModeBStep if self.mode_b else ModeAStep
            self._mode_steps[key] = cls(self.mesh, base)
        return self._mode_steps[key]

    def _ensure_states(self, paired: bool):
        """First use: move the (possibly seeded) shard-0 state onto the mesh —
        Mode A replicates it to every device (reference copy_hash_table)."""
        ms = self._mode_step(paired)
        if self.mode_b:
            if self._global_state is None:
                self._global_state = ms.init_state(self.states[0])
                self.states = []
        else:
            if self._stacked is None:
                self._stacked = ms.init_states(self.states[0])
                self.states = []

    # ------------------------------------------------------------------
    def run(self):
        """Streaming loop; reuses the parent's IO but dispatches to the mesh."""
        import sys

        from nomalise_kmers_multi_large_tpu.io.reader import (
            FastxFile,
            batch_iterator,
            paired_batch_iterator,
        )
        from nomalise_kmers_multi_large_tpu.io.writer import ShardWriter

        cfg = self.cfg
        self.seed()
        self.writers = [ShardWriter(cfg, s) for s in range(cfg.shards)]

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

            pending = None
            for batch in it:
                self._ensure_states(paired)
                import jax.numpy as jnp

                bases, lengths, rec_valid = self._pack(batch, cfg.ksize)
                bases, lengths, rec_valid, b_real = self._pad_to_mesh(
                    bases, lengths, rec_valid, paired
                )
                ms = self._mode_step(paired)
                if self.mode_b:
                    self._global_state, keep, stats, _ = ms(
                        self._global_state, jnp.asarray(bases),
                        jnp.asarray(lengths), jnp.asarray(rec_valid),
                    )
                else:
                    self._stacked, keep, stats, _ = ms(
                        self._stacked, jnp.asarray(bases),
                        jnp.asarray(lengths), jnp.asarray(rec_valid),
                    )
                if pending is not None:
                    self._retire_mesh(*pending)
                pending = (batch, keep, b_real, rec_valid)
            if pending is not None:
                self._retire_mesh(*pending)

            self._refresh_unique_counts_mesh()
            self.report.absorb(self.counters)
            print(
                "Cumulative file statistics: "
                f"Processed {self.report.total_processed:,}, "
                f"Printed {self.report.total_printed:,}, "
                f"Skipped {self.report.total_skipped:,}, "
                f"Cumulative Max Unique Kmers in a thread: "
                f"{self.report.max_total_kmers:,}"
            )

        for c in self.counters:
            c.maybe_report(cfg.verbose, force=True)
        for w in self.writers:
            w.close()
        self.report.final(paired=n_rev > 0)
        return self.report

    # ------------------------------------------------------------------
    def _pad_to_mesh(self, bases, lengths, rec_valid, paired):
        rpr = 2 if paired else 1
        b = rec_valid.shape[0]
        b_pad = -(-b // self.ndev) * self.ndev
        if b_pad != b:
            pad_rows = (b_pad - b) * rpr
            bases = np.concatenate(
                [bases, np.zeros((pad_rows, bases.shape[1]), bases.dtype)]
            )
            lengths = np.concatenate([lengths, np.zeros(pad_rows, lengths.dtype)])
            rec_valid = np.concatenate(
                [rec_valid, np.zeros(b_pad - b, rec_valid.dtype)]
            )
        return bases, lengths, rec_valid, b

    def _retire_mesh(self, batch, keep_dev, b_real, rec_valid):
        keep = np.asarray(keep_dev)[:b_real]
        valid = rec_valid[:b_real]
        if self.mode_b:
            self.writers[0].write_kept(batch, keep)
            c = self.counters[0]
            c.processed += int(valid.sum())
            c.printed += int(keep.sum())
            c.skipped += int(valid.sum() - keep.sum())
            c.maybe_report(self.cfg.verbose)
            return
        # Mode A: record b belongs to device b // (b_pad/ndev)
        b_pad = -(-b_real // self.ndev) * self.ndev
        per = b_pad // self.ndev
        for s in range(self.ndev):
            lo, hi = s * per, min((s + 1) * per, b_real)
            if lo >= b_real:
                break
            sl = slice(lo, hi)
            sl_keep = np.zeros(len(batch), bool)
            sl_keep[sl] = keep[sl]
            self.writers[s].write_kept(batch, sl_keep)
            c = self.counters[s]
            nv = int(valid[sl].sum())
            nk = int(keep[sl].sum())
            c.processed += nv
            c.printed += nk
            c.skipped += nv - nk
            c.maybe_report(self.cfg.verbose)

    def shard_state(self, s: int = 0):
        import jax

        if self.mode_b:
            return self._global_state
        return jax.tree.map(lambda x: x[s], self._stacked)

    def _refresh_unique_counts_mesh(self):
        import jax

        if self.mode_b:
            if self._global_state is not None:
                self.counters[0].unique_kmers = self.tables[0].used_count(
                    self._global_state, self.seeded_lo
                )
            return
        if self._stacked is None:
            return
        for s in range(self.ndev):
            local = jax.tree.map(lambda x: x[s], self._stacked)
            self.counters[s].unique_kmers = self.tables[s].used_count(
                local, self.seeded_lo
            )
