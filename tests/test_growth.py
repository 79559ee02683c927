"""Automatic table growth, wired end-to-end (VERDICT round-1 item 2).

The reference grows its per-thread table at 0.8 load factor on every insert
(nk.c:933-934, expand_local_hash_table :1055-1108) and therefore never loses
an insert. These tests pin the TPU equivalents: the bucket table's double-rows
remap, the hashed table's re-insertion growth, the engine call sites that
trigger them BEFORE a batch can saturate the table, and resume-after-growth.
"""
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nomalise_kmers_multi_large_tpu.config import Config
from nomalise_kmers_multi_large_tpu.engine.pipeline import Normalizer
from nomalise_kmers_multi_large_tpu.ops.mix import mix32
from nomalise_kmers_multi_large_tpu.table.bucket import BucketTable
from nomalise_kmers_multi_large_tpu.table.hashed import HashedTable

RNG = np.random.default_rng(11)
K = 9


def _write_fastq(path: pathlib.Path, reads: list[str]):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


def _make_reads(n=2000, length=60):
    """Mostly-random reads (many distinct k-mers force growth) with a cloned
    minority so depth thresholds actually skip something."""
    base = ["".join(RNG.choice(list("ACGT"), size=length)) for _ in range(8)]
    reads = []
    for i in range(n):
        if i % 3 == 0:
            reads.append(base[RNG.integers(0, len(base))])
        else:
            reads.append("".join(RNG.choice(list("ACGT"), size=length)))
    return reads


@pytest.fixture(scope="module")
def fastq(tmp_path_factory):
    p = tmp_path_factory.mktemp("growth") / "reads.fastq"
    _write_fastq(p, _make_reads())
    return p


def test_bucket_grown_remap_preserves_entries():
    """grown() must be a pure relabeling: same (code, count) set after the
    rows double (the analogue of the reference rehash preserving entries)."""
    t = BucketTable(K, rows=256, interpret=True)
    state = t.init()
    codes = RNG.integers(1, 4**K, size=4096, dtype=np.uint32)
    mixed = np.asarray(mix32(jnp.asarray(codes), 2 * K)).reshape(32, 128)
    state, _ = t.process_batch_mixed(
        state, jnp.asarray(mixed), jnp.ones((32, 128), bool),
        depth=4, windows_per_read=128,
    )
    before = t.export(state)
    t2, state2 = t.grown(state)
    assert t2.rows == 512
    after = t2.export(state2)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)
    # grow to the 4^k ceiling: overflow becomes structurally impossible
    while t2.can_grow:
        t2, state2 = t2.grown(state2)
    assert t2.capacity == 4**K
    final = t2.export(state2)
    for a, b in zip(before, final):
        np.testing.assert_array_equal(a, b)


def test_bucket_growth_end_to_end_matches_direct(fastq, tmp_path):
    """A stream with ~10x the initial capacity in distinct k-mers: the engine
    must grow the bucket table mid-run (never dropping an insert) and produce
    byte-identical output to the growth-free direct table."""
    cfg_b = Config(
        forward_files=(str(fastq),), single=True, ksize=K, depth=4,
        out_dir=str(tmp_path / "b"), table="bucket", batch_reads=128,
    )
    cfg_d = Config(
        forward_files=(str(fastq),), single=True, ksize=K, depth=4,
        out_dir=str(tmp_path / "d"), table="direct", batch_reads=128,
    )
    (tmp_path / "b").mkdir()
    (tmp_path / "d").mkdir()
    nb = Normalizer(cfg_b)
    assert nb.tables[0].rows == 128  # deliberately tiny start (16,384 slots)
    rb = nb.run()
    rd = Normalizer(cfg_d).run()
    assert nb.tables[0].rows > 128, "growth never triggered"
    assert int(nb.states[0].overflow) == 0, "growth failed to prevent drops"
    assert (rb.total_processed, rb.total_printed, rb.total_skipped) == (
        rd.total_processed, rd.total_printed, rd.total_skipped)
    fb = tmp_path / "b" / f"output_forward.k{K}_norm4_thread0.fastq"
    fd = tmp_path / "d" / f"output_forward.k{K}_norm4_thread0.fastq"
    assert fb.read_bytes() == fd.read_bytes()
    assert rb.max_total_kmers == rd.max_total_kmers


def test_hashed_growth_end_to_end_matches_direct(fastq, tmp_path):
    cfg_h = Config(
        forward_files=(str(fastq),), single=True, ksize=K, depth=4,
        out_dir=str(tmp_path / "h"), table="hashed", batch_reads=256,
    )
    cfg_d = Config(
        forward_files=(str(fastq),), single=True, ksize=K, depth=4,
        out_dir=str(tmp_path / "d"), table="direct", batch_reads=256,
    )
    (tmp_path / "h").mkdir()
    (tmp_path / "d").mkdir()
    nh = Normalizer(cfg_h)
    nh.tables = [HashedTable(K, 4096)]
    nh.states = [nh.tables[0].init()]
    rh = nh.run()
    rd = Normalizer(cfg_d).run()
    assert nh.tables[0].capacity > 4096, "growth never triggered"
    assert int(nh.states[0].overflow) == 0
    assert (rh.total_processed, rh.total_printed, rh.total_skipped) == (
        rd.total_processed, rd.total_printed, rd.total_skipped)
    fh = tmp_path / "h" / f"output_forward.k{K}_norm4_thread0.fastq"
    fd = tmp_path / "d" / f"output_forward.k{K}_norm4_thread0.fastq"
    assert fh.read_bytes() == fd.read_bytes()


def test_resume_rebuilds_grown_table(tmp_path):
    """A checkpoint written after growth restores with matching descriptors."""
    cfg = Config(
        forward_files=("x.fastq",), single=True, ksize=K, depth=4,
        table="bucket", out_dir=str(tmp_path),
    )
    n = Normalizer(cfg)
    assert n.tables[0].rows == 128
    n.states = [BucketTable(K, rows=512, interpret=True).init()]
    n._rebuild_tables_from_states()
    assert n.tables[0].rows == 512


def test_seed_pass_grows(tmp_path, fastq):
    """Seeding alone (count-0 inserts) must also trigger growth: the reference
    seed pass inserts through the same store_kmer growth path."""
    cfg = Config(
        forward_files=(str(fastq),), single=True, ksize=K, depth=4,
        out_dir=str(tmp_path), table="bucket", batch_reads=128,
        seed_records=2000,  # seed the whole file: ~90k distinct k-mers
    )
    n = Normalizer(cfg)
    n.seed()
    assert n.tables[0].rows > 128
    assert int(n.states[0].overflow) == 0


def test_mesh_mode_a_grows_mid_stream(fastq, tmp_path):
    """Mode A on the mesh grows ALL stacked shard tables together mid-stream
    and loses no insert — previously growth only worked before the states
    moved onto the mesh."""
    from nomalise_kmers_multi_large_tpu.parallel.engine import MeshNormalizer

    def run(sub, tiny):
        out = tmp_path / sub
        out.mkdir()
        cfg = Config(
            forward_files=(str(fastq),), single=True, ksize=K, depth=4,
            out_dir=str(out), table="hashed", batch_reads=256,
        )
        n = MeshNormalizer(cfg, n_devices=2)
        if tiny:
            n.tables = [HashedTable(K, 4096)] * len(n.tables)
            n.states = [n.tables[0].init()]
        rep = n.run()
        return n, rep, out

    nt, rt, out_t = run("tiny", tiny=True)
    nb, rb, out_b = run("big", tiny=False)
    assert nt.tables[0].capacity > 4096, "mid-stream mesh growth never fired"
    for s in range(2):
        assert int(nt.shard_state(s).overflow) == 0
    assert (rt.total_processed, rt.total_printed, rt.total_skipped) == (
        rb.total_processed, rb.total_printed, rb.total_skipped)
    # identical per-shard outputs: growth must be decision-transparent
    for s in range(2):
        f1 = out_t / f"output_forward.k{K}_norm2_thread{s}.fastq"
        f2 = out_b / f"output_forward.k{K}_norm2_thread{s}.fastq"
        assert f1.read_bytes() == f2.read_bytes()


# ----------------------------------------------------------------------
# Overflow grow-and-replay (round-4 verdict item 5): a bucket row that
# fills all its lanes BELOW the occupancy growth trigger must not lose
# inserts silently-forever — the engine detects the overflow at retire,
# grows from the pre-dispatch state, and replays the group.
# ----------------------------------------------------------------------

def _same_row_reads(k: int, rows: int, n: int) -> list[str]:
    """n distinct k-length reads whose single k-mer all lands in bucket
    row 0 (row of code c = mix32(c) >> fp_bits)."""
    from nomalise_kmers_multi_large_tpu.ops.codec import decode_codes
    from nomalise_kmers_multi_large_tpu.ops.mix import mix32_np

    fp_bits = 2 * k - int(np.log2(rows))
    codes = np.arange(1, 400_000, dtype=np.uint32)
    rows_of = mix32_np(codes, 2 * k) >> np.uint32(fp_bits)
    picked = codes[rows_of == 0][:n]
    assert picked.shape[0] == n, "not enough same-row codes in range"
    return decode_codes(np.zeros_like(picked), picked, k)


def test_bucket_row_overflow_grows_and_replays(tmp_path):
    """70 distinct k-mers in one 64-lane row, one batch: the dispatch drops
    6, the retire detects the overflow, grows, replays — and every insert
    is present afterwards (reference growth precedes loss, nk.c:933-934)."""
    k = 11
    reads = _same_row_reads(k, rows=128, n=70)
    p = tmp_path / "same_row.fastq"
    _write_fastq(p, reads)
    cfg = Config(
        forward_files=(str(p),), single=True, ksize=k, depth=100,
        out_dir=str(tmp_path / "o"), table="bucket", batch_reads=128,
        seed_records=1,  # reads are exactly k long: the len>k seed rule
                         # skips them all (nk.c:1347), isolating the main pass
    )
    (tmp_path / "o").mkdir()
    n = Normalizer(cfg)
    n.tables = [BucketTable(k, rows=128, interpret=True)]
    n.states = [n.tables[0].init()]
    rep = n.run()
    assert n.tables[0].rows > 128, "overflow never triggered a replay-grow"
    assert int(n.states[0].overflow) == 0, "replay left dropped inserts"
    assert rep.total_printed == 70
    _, lo, counts = n.tables[0].export(n.states[0])
    assert lo.shape[0] == 70 and (counts == 1).all(), \
        "replay failed to recover every dropped insert"


def test_bucket_row_overflow_replay_with_inflight_group(tmp_path):
    """Same saturation split over three single-batch groups so a group is
    already in flight when the overflowing one retires: the engine must
    also re-dispatch the in-flight group from the replayed state."""
    k = 11
    reads = _same_row_reads(k, rows=128, n=105)
    p = tmp_path / "same_row3.fastq"
    _write_fastq(p, reads)
    cfg = Config(
        forward_files=(str(p),), single=True, ksize=k, depth=100,
        out_dir=str(tmp_path / "o"), table="bucket", batch_reads=35,
        seed_records=1,
    )
    (tmp_path / "o").mkdir()
    n = Normalizer(cfg)
    n.tables = [BucketTable(k, rows=128, interpret=True)]
    n.states = [n.tables[0].init()]
    rep = n.run()
    assert n.tables[0].rows > 128
    assert int(n.states[0].overflow) == 0
    assert rep.total_printed == 105
    _, lo, counts = n.tables[0].export(n.states[0])
    assert lo.shape[0] == 105 and (counts == 1).all()
