"""rank_cand_scan (Pallas fused segment scans) vs a straightforward numpy
oracle of the three prefix quantities it replaces."""
import jax.numpy as jnp
import numpy as np

from nomalise_kmers_multi_large_tpu.ops.segscan import BLOCK, rank_cand_scan

SENT = np.uint32(0xFFFFFFFF)


def _oracle(skey: np.ndarray, rid: np.ndarray, fp_bits: int, n_reads: int):
    n = skey.shape[0]
    iota = np.arange(n)
    changed = np.ones(n, bool)
    changed[1:] = skey[1:] != skey[:-1]
    head = np.maximum.accumulate(np.where(changed, iota, 0))
    rank = np.minimum(iota - head + 1, 65535)
    srow = skey >> np.uint32(fp_bits)
    rchanged = np.ones(n, bool)
    rchanged[1:] = srow[1:] != srow[:-1]
    segidx = np.cumsum(changed) - 1
    rowhead = np.maximum.accumulate(np.where(rchanged, segidx, 0))
    cand = np.minimum(segidx - rowhead, 128)
    ridc = np.minimum(rid, n_reads - 1)
    p2 = (ridc.astype(np.int64) << 16) | rank
    return p2.astype(np.int32), cand.astype(np.int32)


def _check(skey, rid, fp_bits, n_reads):
    p2, p3 = rank_cand_scan(
        jnp.asarray(skey), jnp.asarray(rid), fp_bits=fp_bits, w=1,
        n_reads=n_reads, interpret=True)
    w2, w3 = _oracle(skey, rid, fp_bits, n_reads)
    real = skey != SENT  # pads need not match (they are invalid downstream)
    np.testing.assert_array_equal(np.asarray(p2)[real], w2[real])
    np.testing.assert_array_equal(np.asarray(p3)[real], w3[real])


def test_random_sorted_stream():
    rng = np.random.default_rng(7)
    n = BLOCK * 2
    # heavy duplication: draw from a small pool so runs are long
    key = np.sort(rng.integers(0, 5000, size=n - 777, dtype=np.uint32))
    key = np.concatenate([key, np.full(777, SENT, np.uint32)])
    rid = (rng.permutation(n) // 36).astype(np.int32)
    _check(key, rid, fp_bits=7, n_reads=n // 36)


def test_single_block_all_distinct():
    rng = np.random.default_rng(1)
    key = np.sort(rng.choice(1 << 20, size=BLOCK, replace=False)
                  ).astype(np.uint32)
    rid = (np.arange(BLOCK, dtype=np.int32) // 100)
    _check(key, rid, fp_bits=3, n_reads=BLOCK // 100)


def test_run_spanning_block_boundary():
    n = BLOCK * 2
    key = np.full(n, 42, np.uint32)  # one run across both blocks
    rid = (np.arange(n, dtype=np.int32) // 64)
    p2, p3 = rank_cand_scan(jnp.asarray(key), jnp.asarray(rid), fp_bits=4,
                            w=64, n_reads=n // 64, interpret=True)
    rank = np.asarray(p2) & 0xFFFF
    assert rank[0] == 1 and rank[BLOCK] == min(BLOCK + 1, 65535)
    assert rank[100] == 101
    np.testing.assert_array_equal(np.asarray(p3), 0)  # one distinct code
