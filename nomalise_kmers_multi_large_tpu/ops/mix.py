"""Bijective bit mixing for bucket-table placement.

The reference uses the raw 2-bit k-mer code as its hash (``hash % capacity``,
normalise_kmers_multi_large.c:936) — fine for its CPU table, but biological
k-mer codes are heavily skewed (low-complexity sequence clusters in code
space), which would unbalance a bucketed device table. We instead place code
``c`` at ``mix(c)``, where ``mix`` is a BIJECTION on the 2k-bit code space
(odd-multiply and xor-shift rounds, both invertible mod 2^m). Bijectivity
means the table still stores exact identities: the bucket row is the high bits
of ``mix(c)`` and only the low bits (the "fingerprint") need to be stored to
recover ``c`` — ``unmix`` reconstructs codes for the -P dump and checkpoints.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["mix32", "unmix32_np", "mix32_np"]

# odd constants (from splitmix/murmur lineage), truncated per-width by masking
_C1 = 0x7FEB352D
_C2 = 0x846CA68B


def _shifts(bits: int) -> tuple[int, int, int]:
    """Xor-shift distances scaled to the mixed width (murmur32 uses 16/13/16
    for 32 bits)."""
    s = max(bits // 2, 1)
    s2 = max((bits * 13) // 32, 1)
    return s, s2, s


def mix32(x: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Bijective mix of the low `bits` (<= 32) of uint32 lanes. Values must be
    < 2^bits; the result is < 2^bits."""
    assert 2 <= bits <= 32
    mask = jnp.uint32((1 << bits) - 1) if bits < 32 else jnp.uint32(0xFFFFFFFF)
    s1, s2, s3 = _shifts(bits)
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> jnp.uint32(s1))) & mask
    x = (x * jnp.uint32(_C1 | 1)) & mask
    x = (x ^ (x >> jnp.uint32(s2))) & mask
    x = (x * jnp.uint32(_C2 | 1)) & mask
    x = (x ^ (x >> jnp.uint32(s3))) & mask
    return x


# ----------------------------------------------------------------------
# host-side (numpy) forward + inverse, for export/checkpoint/tests

def mix32_np(x: np.ndarray, bits: int) -> np.ndarray:
    mask = np.uint64((1 << bits) - 1)
    s1, s2, s3 = _shifts(bits)
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(s1))) & mask
    x = (x * np.uint64(_C1 | 1)) & mask
    x = (x ^ (x >> np.uint64(s2))) & mask
    x = (x * np.uint64(_C2 | 1)) & mask
    x = (x ^ (x >> np.uint64(s3))) & mask
    return x.astype(np.uint32)


def _inv_odd(c: int, bits: int) -> int:
    """Modular inverse of odd c mod 2^bits (Newton iteration)."""
    m = (1 << bits) - 1
    inv = c & m
    for _ in range(6):
        inv = (inv * (2 - c * inv)) & m
    return inv


def _unxorshift(x: np.ndarray, s: int, bits: int) -> np.ndarray:
    mask = np.uint64((1 << bits) - 1)
    y = x.copy()
    # iterate until fixpoint: y = x ^ (y >> s); converges in ceil(bits/s) steps
    for _ in range(-(-bits // s)):
        y = (x ^ (y >> np.uint64(s))) & mask
    return y


def unmix32_np(x: np.ndarray, bits: int) -> np.ndarray:
    """Inverse of mix32 on the host."""
    mask = np.uint64((1 << bits) - 1)
    s1, s2, s3 = _shifts(bits)
    i1 = np.uint64(_inv_odd(_C1 | 1, bits))
    i2 = np.uint64(_inv_odd(_C2 | 1, bits))
    x = x.astype(np.uint64) & mask
    x = _unxorshift(x, s3, bits)
    x = (x * i2) & mask
    x = _unxorshift(x, s2, bits)
    x = (x * i1) & mask
    x = _unxorshift(x, s1, bits)
    return x.astype(np.uint32)
