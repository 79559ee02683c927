"""sorted_occurrence_stream: ranks/multiplicities vs a brute-force oracle."""
import numpy as np
import jax.numpy as jnp

from nomalise_kmers_multi_large_tpu.ops.streamrank import sorted_occurrence_stream

RNG = np.random.default_rng(1)


def _brute(codes, valid):
    seen = {}
    rank = np.zeros_like(codes)
    for i, (c, v) in enumerate(zip(codes, valid)):
        if not v:
            continue
        seen[c] = seen.get(c, 0) + 1
        rank[i] = seen[c]
    return rank, seen


def test_ranks_and_mult():
    n = 512
    codes = RNG.integers(0, 17, size=n).astype(np.uint64)  # few distinct => many dups
    valid = RNG.random(n) > 0.2
    valid &= codes != 0
    hi = (codes >> 32).astype(np.uint32)
    lo = (codes & 0xFFFFFFFF).astype(np.uint32)
    s = sorted_occurrence_stream(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(valid))

    want_rank, want_mult = _brute(codes, valid)
    got_rank = np.zeros(n, np.int64)
    src = np.asarray(s.src)
    got_rank[src[np.asarray(s.valid)]] = np.asarray(s.rank)[np.asarray(s.valid)]
    np.testing.assert_array_equal(got_rank, want_rank)

    # multiplicities at segment heads
    b = np.asarray(s.boundary)
    shi, slo = np.asarray(s.hi), np.asarray(s.lo)
    mult = np.asarray(s.mult)
    got = {
        (int(shi[i]) << 32) | int(slo[i]): int(mult[i]) for i in np.flatnonzero(b)
    }
    assert got == {int(k): v for k, v in want_mult.items()}
    # number of segments == number of distinct valid codes
    assert b.sum() == len(want_mult)


def test_all_invalid():
    n = 64
    hi = np.zeros(n, np.uint32)
    lo = np.arange(n, dtype=np.uint32)
    s = sorted_occurrence_stream(jnp.asarray(hi), jnp.asarray(lo), jnp.zeros(n, bool))
    assert not np.asarray(s.valid).any()
    assert not np.asarray(s.boundary).any()
    assert np.asarray(s.mult).sum() == 0
