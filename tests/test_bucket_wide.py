"""Wide bucket table (k = 16..31) correctness: Feistel bijectivity, wide
encode-kernel parity with the string oracle, kernel-level table parity, and
engine-level decision parity vs the hashed table and the sequential oracle.
The reference serves k 5..31 through one hot loop
(normalise_kmers_multi_large.c:724, 1459-1499); these tests pin the wide
Pallas path to the same semantics. Interpret mode on the CPU test mesh."""
import jax.numpy as jnp
import numpy as np
import pytest

from nomalise_kmers_multi_large_tpu.engine.step import BatchStep
from nomalise_kmers_multi_large_tpu.ops.bucket_kernel import bucket_batch_wide
from nomalise_kmers_multi_large_tpu.ops.encode_kernel import encode_keys_wide
from nomalise_kmers_multi_large_tpu.ops.mix import (
    feistel_words,
    feistel_words_np,
    unfeistel_np,
)
from nomalise_kmers_multi_large_tpu.table import BucketTableWide, HashedTable
from oracle import Oracle
from test_engine import _make_reads, _pack

DEPTH = 3
COVERAGE = 0.6
SENT = np.uint32(0xFFFFFFFF)


@pytest.mark.parametrize("k", [16, 17, 21, 28, 31])
def test_feistel_bijective_and_order(k):
    b = 2 * k
    rng = np.random.default_rng(k)
    code = rng.integers(0, 1 << b, size=4096, dtype=np.uint64)
    w1, w2 = feistel_words_np(code, b)
    assert np.array_equal(unfeistel_np(w1, w2, b), code)
    # a real w2 never collides with the sentinel
    assert (w2 < (1 << (b - 32))).all() if b > 32 else (w2 == 0).all()
    # device agrees with host
    hi = (code >> np.uint64(32)).astype(np.uint32)
    lo = (code & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    d1, d2 = feistel_words(jnp.asarray(hi), jnp.asarray(lo), b)
    assert np.array_equal(np.asarray(d1), w1)
    assert np.array_equal(np.asarray(d2), w2)
    # the mix spreads: top bits (bucket rows) hit many values
    assert np.unique(w1 >> np.uint32(23)).size > 64


@pytest.mark.parametrize("k", [16, 21, 31])
def test_encode_keys_wide_matches_oracle(k):
    rng = np.random.default_rng(k)
    R, L = 12, 72
    bases = rng.integers(0, 4, size=(R, L), dtype=np.uint8)
    lens = rng.integers(k, L + 1, size=(R,), dtype=np.int32)
    lens[0] = k - 1  # too-short read: every window invalid
    w1, w2 = encode_keys_wide(
        jnp.asarray(bases), jnp.asarray(lens), k, True, interpret=True)
    w1, w2 = np.asarray(w1), np.asarray(w2)
    W = L - k + 1
    for r in range(R):
        for j in range(W):
            valid = j <= lens[r] - k
            if valid:
                fwd = rev = 0
                for bc in bases[r, j:j + k]:
                    fwd = (fwd << 2) | int(bc)
                for bc in bases[r, j:j + k][::-1]:
                    rev = (rev << 2) | (int(bc) ^ 3)
                code = min(fwd, rev)
                valid = code != 0  # poly-A drop (nk.c:1483)
            if valid:
                e1, e2 = feistel_words_np(
                    np.array([code], dtype=np.uint64), 2 * k)
                assert (w1[r, j], w2[r, j]) == (e1[0], e2[0])
            else:
                assert (w1[r, j], w2[r, j]) == (SENT, SENT)


@pytest.mark.parametrize("k,rows", [(16, 512), (21, 512), (28, 1024)])
def test_wide_kernel_matches_sequential_oracle(k, rows):
    """bucket_batch_wide == sequential upsert-then-test in sorted stream
    order, for decisions AND final table contents."""
    b = 2 * k
    rng = np.random.default_rng(17 * k)
    R, W = 48, 40
    pool = rng.integers(0, 1 << b, size=150, dtype=np.uint64)
    codes = pool[rng.integers(0, len(pool), size=(R, W))]
    valid = rng.random((R, W)) < 0.9
    w1, w2 = feistel_words_np(codes.ravel(), b)
    w1 = np.where(valid.ravel(), w1, SENT).astype(np.uint32)
    w2 = np.where(valid.ravel(), w2, SENT).astype(np.uint32)

    fpA = jnp.zeros((rows, 128), jnp.int32)
    fpB = None if b == 32 else jnp.zeros((rows, 128), jnp.int32)
    cnt = jnp.zeros((rows, 128), jnp.int32)
    out = bucket_batch_wide(
        fpA, fpB, cnt, jnp.asarray(w1), jnp.asarray(w2), None,
        k=k, rows=rows, depth=DEPTH, windows_per_read=W,
        keyed=True, interpret=True)

    table: dict[int, int] = {}
    high = np.zeros(R, np.int32)
    order = np.lexsort((np.arange(R * W) // W, w2, w1))
    for i in order:
        if not valid.ravel()[i]:
            continue
        c = int(codes.ravel()[i])
        table[c] = table.get(c, 0) + 1
        if table[c] >= DEPTH:
            high[i // W] += 1
    assert np.array_equal(np.asarray(out.high_per_read), high)
    assert int(out.overflow) == 0

    fpA_np = np.asarray(out.fpA)
    occ_r, occ_l = np.nonzero(fpA_np)
    rs = 32 - int(np.log2(rows))
    w1_rec = (occ_r.astype(np.uint32) << np.uint32(rs)) | \
        (fpA_np[occ_r, occ_l].astype(np.uint32) - 1)
    w2_rec = (np.asarray(out.fpB)[occ_r, occ_l].astype(np.uint32)
              if out.fpB is not None else np.zeros_like(w1_rec))
    dec = unfeistel_np(w1_rec, w2_rec, b)
    got = {int(c): int(v)
           for c, v in zip(dec, np.asarray(out.counts)[occ_r, occ_l])}
    assert got == table


def _run_wide(table, reads, batch_size, k, paired=False, canonical=True):
    step = BatchStep(table, k=k, depth_per_shard=DEPTH, coverage=COVERAGE,
                     canonical=canonical, paired=paired)
    state = table.init()
    decisions = []
    rpr = 2 if paired else 1
    nrec = len(reads) // rpr
    for lo_i in range(0, nrec, batch_size):
        recs = range(lo_i, min(lo_i + batch_size, nrec))
        rows = []
        for rec in recs:
            rows.extend(reads[rec * rpr: rec * rpr + rpr])
        bases, lengths = _pack(rows, 64, k)
        rec_valid = lengths[::rpr] > 0 if not paired else \
            (lengths[0::2] > 0) & (lengths[1::2] > 0)
        state, keep, stats, _ = step.step(
            state, jnp.asarray(bases), jnp.asarray(lengths),
            jnp.asarray(rec_valid))
        keep = np.asarray(keep)
        for j, rec in enumerate(recs):
            decisions.append(bool(keep[j]) if rec_valid[j] else None)
    return decisions, state


@pytest.mark.parametrize("k", [16, 21, 31])
def test_wide_table_matches_oracle(k):
    """Engine-level: fused wide encode + wide kernel == sequential oracle,
    decisions and table contents, k across the whole wide range."""
    reads = _make_reads(64)
    oracle = Oracle(k, DEPTH, COVERAGE, True)
    want = [oracle.process_single(r) for r in reads]
    table = BucketTableWide(k, rows=512)
    got, state = _run_wide(table, reads, 16, k)
    assert got == want
    assert int(state.overflow) == 0
    hi, lo, counts = table.export(state)
    got_table = {(int(h) << 32) | int(l): int(c)
                 for h, l, c in zip(hi, lo, counts)}
    assert got_table == oracle.counts
    assert table.used_count(state) == len(oracle.counts)


def test_wide_same_as_hashed_k21_paired():
    reads = _make_reads(64)
    h_dec, _ = _run_wide(HashedTable(21, 1 << 14), reads, 8, 21, paired=True)
    w_dec, wstate = _run_wide(BucketTableWide(21, rows=512), reads, 8, 21,
                              paired=True)
    assert h_dec == w_dec
    assert int(wstate.overflow) == 0


def test_wide_cli_pipeline_k21_matches_hashed(tmp_path):
    """Full CLI pipeline at k=21: the wide bucket table and the hashed table
    must produce byte-identical outputs and identical -P dumps (both are
    exact implementations of the reference's k>15 range, nk.c:724)."""
    import pathlib

    from nomalise_kmers_multi_large_tpu.config import Config
    from nomalise_kmers_multi_large_tpu.engine.pipeline import Normalizer

    src = pathlib.Path("/root/reference/test/2seq.fastq")
    outs = {}
    reports = {}
    for kind in ("bucket", "hashed"):
        out = tmp_path / kind
        out.mkdir()
        cfg = Config(
            forward_files=(str(src),), single=True, ksize=21, depth=2,
            out_dir=str(out), print_table=True, table=kind, batch_reads=64,
        )
        reports[kind] = Normalizer(cfg).run()
        outs[kind] = out
    assert reports["bucket"].total_processed == 4
    assert reports["bucket"].total_printed == reports["hashed"].total_printed
    for f in sorted(outs["bucket"].glob("output_*")):
        other = outs["hashed"] / f.name
        assert other.exists(), f.name
        assert f.read_bytes() == other.read_bytes(), f.name


def test_wide_growth_preserves_contents():
    """grown() must preserve every (code, count) pair across both planes."""
    k = 21
    rng = np.random.default_rng(5)
    table = BucketTableWide(k, rows=512)
    state = table.init()
    codes = rng.integers(0, 1 << 42, size=(8, 64), dtype=np.uint64)
    w1, w2 = feistel_words_np(codes.ravel(), 42)
    state, _ = table.process_batch_keys(
        state, jnp.asarray(w1.reshape(8, 64)), jnp.asarray(w2.reshape(8, 64)),
        jnp.ones((8, 64), bool), depth=DEPTH, windows_per_read=64)
    hi0, lo0, c0 = table.export(state)
    before = {(int(h) << 32) | int(l): int(c) for h, l, c in zip(hi0, lo0, c0)}
    g_table, g_state = table.grown(state)
    assert g_table.rows == 1024
    hi1, lo1, c1 = g_table.export(g_state)
    after = {(int(h) << 32) | int(l): int(c) for h, l, c in zip(hi1, lo1, c1)}
    assert after == before
    # and the grown table still matches/inserts correctly: re-run the same
    # batch, counts must double
    g_state, _ = g_table.process_batch_keys(
        g_state, jnp.asarray(w1.reshape(8, 64)),
        jnp.asarray(w2.reshape(8, 64)), jnp.ones((8, 64), bool),
        depth=DEPTH, windows_per_read=64)
    hi2, lo2, c2 = g_table.export(g_state)
    doubled = {(int(h) << 32) | int(l): int(c)
               for h, l, c in zip(hi2, lo2, c2)}
    assert doubled == {c: 2 * v for c, v in before.items()}


def test_wide_stride_matches_hashed():
    """stride > 1 routes the wide table through the non-fused codec path
    (hi/lo planes -> Feistel in the table); decisions must equal the hashed
    table's under the same stride."""
    reads = _make_reads(48)
    k = 17

    def run(table):
        step = BatchStep(table, k=k, depth_per_shard=DEPTH, coverage=COVERAGE,
                         canonical=True, paired=False, stride=2)
        state = table.init()
        decisions = []
        for lo_i in range(0, len(reads), 16):
            rows = reads[lo_i: lo_i + 16]
            bases, lengths = _pack(rows, 64, k)
            rec_valid = lengths > 0
            state, keep, _, _ = step.step(
                state, jnp.asarray(bases), jnp.asarray(lengths),
                jnp.asarray(rec_valid))
            decisions.extend(np.asarray(keep)[rec_valid].tolist())
        return decisions

    assert run(BucketTableWide(k, rows=512)) == run(HashedTable(k, 1 << 14))
