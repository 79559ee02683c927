"""Bucket table (Pallas kernel) correctness: mix bijectivity, oracle parity of
decisions AND table contents, seeding, and end-to-end pipeline parity on the
reference's own test data. Runs in interpret mode on the CPU test mesh."""
import pathlib

import numpy as np
import pytest

from nomalise_kmers_multi_large_tpu.config import Config
from nomalise_kmers_multi_large_tpu.engine.pipeline import Normalizer
from nomalise_kmers_multi_large_tpu.ops.mix import mix32, mix32_np, unmix32_np
from nomalise_kmers_multi_large_tpu.table import BucketTable, DirectTable
from oracle import Oracle
from test_engine import K, DEPTH, COVERAGE, _make_reads, _run_batched

T = pathlib.Path("/root/reference/test")
GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.mark.parametrize("bits", [8, 16, 22, 30])
def test_mix_bijective(bits):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << bits, size=4096, dtype=np.uint32)
    m = mix32_np(x, bits)
    assert np.array_equal(unmix32_np(m, bits), x)
    # device agrees with host
    import jax.numpy as jnp

    assert np.array_equal(np.asarray(mix32(jnp.asarray(x), bits)), m)
    # mixes actually spread: top bits of mixed values hit many buckets
    rows = np.unique(m >> max(bits - 7, 1))
    assert rows.size > 64


@pytest.mark.parametrize("paired", [False, True])
@pytest.mark.parametrize("canonical", [False, True])
@pytest.mark.parametrize("batch_size", [1, 7, 64])
def test_bucket_matches_oracle(paired, canonical, batch_size):
    reads = _make_reads(128)
    oracle = Oracle(K, DEPTH, COVERAGE, canonical)
    want = []
    if paired:
        for i in range(0, len(reads) - 1, 2):
            want.append(oracle.process_pair(reads[i], reads[i + 1]))
    else:
        for r in reads:
            want.append(oracle.process_single(r))

    table = BucketTable(K)
    got, state = _run_batched(table, reads, batch_size, paired, canonical)
    assert got == want
    assert int(state.overflow) == 0

    hi, lo, counts = table.export(state)
    got_table = {int(l): int(c) for l, c in zip(lo, counts)}
    assert got_table == oracle.counts
    assert table.used_count(state) == len(oracle.counts)


def test_bucket_same_as_direct_exact():
    reads = _make_reads(96)
    d_dec, _ = _run_batched(DirectTable(K), reads, 16, False, False)
    b_dec, bstate = _run_batched(BucketTable(K), reads, 16, False, False)
    assert d_dec == b_dec
    assert int(bstate.overflow) == 0


def test_bucket_pipeline_parity_2seq(tmp_path):
    """Full CLI pipeline with --table bucket: byte parity with the reference
    golden capture on test/2seq.fastq (BASELINE config 1)."""
    cfg = Config(
        forward_files=(str(T / "2seq.fastq"),), single=True, ksize=15, depth=2,
        out_dir=str(tmp_path), print_table=True, table="bucket", batch_reads=64,
    )
    n = Normalizer(cfg)
    report = n.run()
    want = (GOLDEN / "2seq_single_k15_d2" /
            "output_forward.k15_norm2_thread0.fastq").read_bytes()
    got = (tmp_path / "output_forward.k15_norm2_thread0.fastq").read_bytes()
    assert got == want
    assert report.total_processed == 4
    # -P dump parity (code-order normalization)
    for f in tmp_path.glob("output_kmer.k15_norm2_thread0.tsv"):
        golden = GOLDEN / "2seq_single_k15_d2" / f.name
        if golden.exists():
            assert f.read_bytes() == golden.read_bytes()


@pytest.mark.parametrize("lanes", [64, 128])
def test_bucket_overflow_flag(lanes):
    """More distinct codes hashing to one bucket row than it has lanes must be
    REPORTED via the overflow counter (the engine's grow/abort trigger), never
    corrupt state."""
    import jax.numpy as jnp

    k = 8
    table = BucketTable(k, rows=128, lanes=lanes)  # fp_bits = 9: 512 codes/row
    all_codes = np.arange(1, 4 ** k, dtype=np.uint32)
    rows_of = mix32_np(all_codes, 2 * k) >> np.uint32(9)
    row0 = all_codes[rows_of == 0][:200]   # 200 distinct codes of bucket row 0
    assert row0.size == 200
    codes = row0[:200].reshape(8, 25)
    valid = np.ones((8, 25), bool)
    state = table.init()
    state, out = table.process_batch(
        state, jnp.asarray(codes), jnp.asarray(valid), depth=2,
        windows_per_read=25,
    )
    assert int(state.overflow) == 200 - lanes
    # the inserted codes are intact, each with count 1
    hi, lo, counts = table.export(state)
    assert lo.size == lanes
    assert (counts == 1).all()
    assert set(lo.tolist()) <= set(row0.tolist())
