"""Fused Pallas encode+mix+key kernel vs the XLA codec reference path."""
import jax.numpy as jnp
import numpy as np

from nomalise_kmers_multi_large_tpu.ops.codec import (
    encode_windows_canonical, window_validity,
)
from nomalise_kmers_multi_large_tpu.ops.encode_kernel import encode_keys
from nomalise_kmers_multi_large_tpu.ops.mix import mix32

SENT = np.uint32(0xFFFFFFFF)


def _xla_reference(bases, lengths, k, canonical):
    hi, lo = encode_windows_canonical(jnp.asarray(bases), k, canonical)
    valid = window_validity(jnp.asarray(lengths), hi, lo, k)
    mixed = np.asarray(mix32(lo, 2 * k))
    v = np.asarray(valid)
    key = np.where(v, mixed, SENT)
    return key, v.astype(np.int32)


def _check(R, L, k, canonical, seed=0, short_frac=0.0):
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 4, size=(R, L), dtype=np.uint8)
    lengths = np.full((R,), L, np.int32)
    if short_frac:
        idx = rng.random(R) < short_frac
        lengths[idx] = rng.integers(0, L + 1, size=int(idx.sum()))
    got_key = encode_keys(
        jnp.asarray(bases), jnp.asarray(lengths), k, canonical, interpret=True)
    want_key, want_valid = _xla_reference(bases, lengths, k, canonical)
    # validity is encoded IN the key: key != SENT <=> valid
    np.testing.assert_array_equal(
        np.asarray(got_key != SENT).astype(np.int32), want_valid)
    np.testing.assert_array_equal(np.asarray(got_key), want_key)


def test_plain_k15():
    _check(16, 150, 15, canonical=False)


def test_canonical_k15():
    _check(16, 150, 15, canonical=True)


def test_short_and_invalid_reads():
    _check(32, 150, 15, canonical=False, seed=2, short_frac=0.5)


def test_small_k():
    _check(8, 40, 5, canonical=False, seed=3)
    _check(8, 40, 7, canonical=True, seed=4)


def test_polyA_windows_dropped():
    bases = np.zeros((8, 60), np.uint8)  # all-A reads: every window code 0
    lengths = np.full((8,), 60, np.int32)
    key = encode_keys(jnp.asarray(bases), jnp.asarray(lengths), 9,
                      False, interpret=True)
    np.testing.assert_array_equal(np.asarray(key), SENT)


def test_row_count_not_block_multiple():
    # CLI batches are not always multiples of the kernel's read block (512)
    _check(600, 150, 15, canonical=False, seed=7, short_frac=0.3)
