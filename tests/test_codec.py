"""Codec properties: decode(encode(x)) == x, canonical(x) == canonical(revcomp x),
equivalence with the string oracle (reference encode_kmer_plain :1118-1126)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from nomalise_kmers_multi_large_tpu.io.pack import LUT  # noqa: E402
from nomalise_kmers_multi_large_tpu.ops.codec import (  # noqa: E402
    decode_codes,
    encode_windows,
    encode_windows_canonical,
    window_validity,
)
from oracle import encode as oracle_encode  # noqa: E402
from oracle import revcomp  # noqa: E402

RNG = np.random.default_rng(0)


def _random_seqs(n, length):
    return ["".join(RNG.choice(list("ACGT"), size=length)) for _ in range(n)]


def _pack(seqs, pad):
    arr = np.zeros((len(seqs), pad), np.uint8)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = LUT[np.frombuffer(s.encode(), np.uint8)]
    lengths = np.array([len(s) for s in seqs], np.int32)
    return arr, lengths


@pytest.mark.parametrize("k", [5, 11, 15, 16, 17, 25, 31])
def test_encode_matches_oracle(k):
    seqs = _random_seqs(8, 40)
    bases, lengths = _pack(seqs, 40)
    hi, lo = encode_windows(jnp.asarray(bases), k)
    hi, lo = np.asarray(hi), np.asarray(lo)
    for r, s in enumerate(seqs):
        for i in range(len(s) - k + 1):
            want = oracle_encode(s[i: i + k])
            got = (int(hi[r, i]) << 32) | int(lo[r, i])
            assert got == want, (k, r, i)


@pytest.mark.parametrize("k", [5, 15, 16, 21, 31])
def test_decode_roundtrip(k):
    seqs = _random_seqs(4, k)
    bases, _ = _pack(seqs, k)
    hi, lo = encode_windows(jnp.asarray(bases), k)
    out = decode_codes(np.asarray(hi)[:, 0], np.asarray(lo)[:, 0], k)
    assert out == seqs


@pytest.mark.parametrize("k", [7, 15, 16, 27])
def test_canonical_invariance(k):
    """canonical(x) == canonical(revcomp(x)), and equals the string-min oracle."""
    seqs = _random_seqs(16, k)
    rcs = [revcomp(s) for s in seqs]
    b1, _ = _pack(seqs, k)
    b2, _ = _pack(rcs, k)
    h1, l1 = encode_windows_canonical(jnp.asarray(b1), k, True)
    h2, l2 = encode_windows_canonical(jnp.asarray(b2), k, True)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for i, s in enumerate(seqs):
        want = oracle_encode(min(s, revcomp(s)))
        got = (int(np.asarray(h1)[i, 0]) << 32) | int(np.asarray(l1)[i, 0])
        assert got == want


def test_window_validity_rules():
    k = 5
    seqs = ["ACGTACGTAC", "AAAAAAAAAA", "ACG"]  # normal, poly-A, too short
    bases, lengths = _pack(seqs, 10)
    lengths[2] = 0  # host zeroes too-short reads
    hi, lo = encode_windows(jnp.asarray(bases), k)
    valid = np.asarray(window_validity(jnp.asarray(lengths), hi, lo, k))
    assert valid[0].sum() == 10 - k + 1
    assert valid[1].sum() == 0  # all-A windows -> code 0 -> dropped (:1483)
    assert valid[2].sum() == 0


def test_n_maps_to_a():
    """N->A rewrite happens before encoding (:1406): N and A encode identically."""
    k = 7
    b1, l1 = _pack(["ANGTACG"], 7)
    b2, l2 = _pack(["AAGTACG"], 7)
    h1, lo1 = encode_windows(jnp.asarray(b1), k)
    h2, lo2 = encode_windows(jnp.asarray(b2), k)
    assert int(lo1[0, 0]) == int(lo2[0, 0])
