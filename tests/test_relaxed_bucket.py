"""--mode relaxed on the production bucket table (round-3 verdict item 3).

Relaxed semantics (documented in ops/bucket_kernel.py): the read-id sort
operand is dropped, so occurrence ranks among a batch's copies of one code
are attributed to reads in arbitrary order instead of stream order. Table
counts stay EXACT and the multiset of observed values per code is identical
to exact mode; only reads straddling a shared code's depth boundary within
one batch can decide differently.
"""
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from nomalise_kmers_multi_large_tpu.config import Config
from nomalise_kmers_multi_large_tpu.engine.pipeline import Normalizer
from nomalise_kmers_multi_large_tpu.engine.step import BatchStep
from nomalise_kmers_multi_large_tpu.table.bucket import BucketTable

T = pathlib.Path("/root/reference/test")


def _rand_batch(n_reads=64, length=50, seed=3, clones=8):
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 4, size=(n_reads, 56), dtype=np.uint8)
    # clone a minority so cross-read duplicate codes exist within the batch
    for i in range(clones, n_reads, n_reads // clones):
        bases[i] = bases[i % clones]
    lengths = np.full(n_reads, length, np.int32)
    return bases, lengths, np.ones(n_reads, bool)


def _run_mode(mode, bases, lengths, rv, depth=3):
    t = BucketTable(11, rows=256, interpret=True)
    step = BatchStep(t, k=11, depth_per_shard=depth, coverage=0.9,
                     canonical=False, paired=False, mode=mode)
    st, keep, stats, tallies = step.step(
        t.init(), jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(rv))
    jax.block_until_ready(keep)
    return t, st, keep, stats, tallies


def test_relaxed_counts_exact_tallies_multiset_invariant():
    bases, lengths, rv = _rand_batch()
    te, se, keep_e, stats_e, tal_e = _run_mode("exact", bases, lengths, rv)
    tr, sr, keep_r, stats_r, tal_r = _run_mode("relaxed", bases, lengths, rv)
    # table contents identical: relaxed never changes WHAT is counted
    for a, b in zip(te.export(se), tr.export(sr)):
        np.testing.assert_array_equal(a, b)
    # the multiset of observed values per code is unchanged, so the TOTAL
    # number of high windows in the batch is identical
    assert int(np.asarray(tal_e.high).sum()) == int(np.asarray(tal_r.high).sum())
    np.testing.assert_array_equal(np.asarray(tal_e.total),
                                  np.asarray(tal_r.total))
    assert int(stats_e.processed) == int(stats_r.processed)


def test_relaxed_flag_reaches_kernel(monkeypatch):
    """The CLI contract: --mode relaxed must actually change the compiled
    step (round-3 verdict: the flag was silently ignored on the bucket
    table)."""
    import nomalise_kmers_multi_large_tpu.table.bucket as tb

    seen = {}
    orig = tb.bucket_batch

    def spy(*a, **kw):
        seen["relaxed"] = kw.get("relaxed", False)
        return orig(*a, **kw)

    monkeypatch.setattr(tb, "bucket_batch", spy)
    bases, lengths, rv = _rand_batch(n_reads=8)
    _run_mode("relaxed", bases, lengths, rv)
    assert seen["relaxed"] is True
    _run_mode("exact", bases, lengths, rv)
    assert seen["relaxed"] is False


def test_relaxed_decision_deltas_quantified_a1b1(tmp_path, capsys):
    """Engine-level relaxed vs exact on the reference's a1/b1 pairs: totals
    conserved, k-mer table identical, and the decision delta is small and
    quantified (the relaxation only reorders rank attribution within one
    batch)."""
    e, r = tmp_path / "exact", tmp_path / "relaxed"
    e.mkdir(), r.mkdir()
    base = dict(
        forward_files=(str(T / "a1.fastq"),),
        reverse_files=(str(T / "b1.fastq"),),
        ksize=13, depth=4, batch_reads=512, table="bucket",
        print_table=True,
    )
    rep_e = Normalizer(Config(out_dir=str(e), mode="exact", **base)).run()
    rep_r = Normalizer(Config(out_dir=str(r), mode="relaxed", **base)).run()
    assert rep_e.total_processed == rep_r.total_processed == 5000
    # counts are exact in both modes: identical unique k-mers and -P dumps
    assert rep_e.max_total_kmers == rep_r.max_total_kmers
    de = (e / "output_kmer.k13_norm4_thread0.tsv").read_bytes()
    dr = (r / "output_kmer.k13_norm4_thread0.tsv").read_bytes()
    assert de == dr

    def kept(p):
        lines = p.read_bytes().splitlines()
        return {lines[i] for i in range(0, len(lines), 4)}

    ke = kept(e / "output_forward.k13_norm4_thread0.fastq")
    kr = kept(r / "output_forward.k13_norm4_thread0.fastq")
    delta = len(ke ^ kr)
    print(f"relaxed-vs-exact decision delta on a1/b1: {delta} of 5000 "
          f"records ({delta / 50:.2f}%); printed {rep_e.total_printed} "
          f"(exact) vs {rep_r.total_printed} (relaxed)")
    assert delta <= 100, "relaxation changed too many decisions"
