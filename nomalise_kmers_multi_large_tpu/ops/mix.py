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

__all__ = ["mix32", "unmix32_np", "mix32_np",
           "feistel_words", "feistel_words_np", "unfeistel_np"]

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


# ----------------------------------------------------------------------
# two-limb Feistel bijection for b = 2k-bit codes, k > 15 (b in 33..62).
#
# TPUs have no 64-bit integers, so wide codes are mixed as a 3-round
# unbalanced Feistel over (R = top 31 bits, L = low b-31 bits) with mix32
# round functions — bijective on the b-bit space by construction, and every
# operation is a 32-bit shift/xor/multiply that vectorizes on the VPU. The
# mixed value m = R'·2^(b-31) + L' is returned as SORT WORDS
# (w1 = m >> (b-32), w2 = m's low b-32 bits): bucket row = w1 >> (32-rb),
# fingerprint = (w1's low 32-rb bits, w2) — see ops/bucket_kernel.py.

_CA, _CB, _CC = 0x243F6A88, 0x85A308D3, 0x13198A2E  # pi digits
_M31 = (1 << 31) - 1


def feistel_words(hi, lo, b: int):
    """Device mix of (hi, lo) uint32 code planes (code < 2^b, 33 <= b <= 62).

    Returns (w1, w2) uint32 sort words; ordering by (w1, w2) equals ordering
    by the mixed b-bit value, and (w1, w2) = (0xFFFFFFFF, 0xFFFFFFFF) is
    reserved (a real w2 is < 2^(b-32))."""
    assert 32 <= b <= 62
    hi = hi.astype(jnp.uint32)
    lo = lo.astype(jnp.uint32)
    if b == 32:  # k=16: the code fits one word; plain 32-bit mix, w2 = 0
        return mix32(lo, 32), jnp.zeros_like(lo)
    mL = jnp.uint32((1 << (b - 31)) - 1)
    R = ((hi << jnp.uint32(63 - b)) | (lo >> jnp.uint32(b - 31))) & jnp.uint32(_M31)
    L = lo & mL
    R = R ^ (mix32(L ^ jnp.uint32(_CA), 32) & jnp.uint32(_M31))
    L = L ^ (mix32(R ^ jnp.uint32(_CB), 32) & mL)
    R = R ^ (mix32(L ^ jnp.uint32(_CC), 32) & jnp.uint32(_M31))
    w1 = (R << jnp.uint32(1)) | (L >> jnp.uint32(b - 32))
    w2 = L & jnp.uint32((1 << (b - 32)) - 1)
    return w1, w2


def feistel_words_np(code: np.ndarray, b: int):
    """Host forward (numpy uint64 code < 2^b) -> (w1, w2) uint32."""
    code = code.astype(np.uint64)
    if b == 32:
        w1 = mix32_np(code.astype(np.uint32), 32)
        return w1, np.zeros_like(w1)
    mL = np.uint64((1 << (b - 31)) - 1)
    R = (code >> np.uint64(b - 31)).astype(np.uint32)
    L = code & mL
    R = R ^ (mix32_np((L.astype(np.uint32) ^ np.uint32(_CA)), 32) & np.uint32(_M31))
    L = L ^ (mix32_np((R ^ np.uint32(_CB)), 32).astype(np.uint64) & mL)
    R = R ^ (mix32_np((L.astype(np.uint32) ^ np.uint32(_CC)), 32) & np.uint32(_M31))
    m = (R.astype(np.uint64) << np.uint64(b - 31)) | L
    w1 = (m >> np.uint64(b - 32)).astype(np.uint32)
    w2 = (m & np.uint64((1 << (b - 32)) - 1)).astype(np.uint32)
    return w1, w2


def unfeistel_np(w1: np.ndarray, w2: np.ndarray, b: int) -> np.ndarray:
    """Host inverse: (w1, w2) sort words -> original b-bit code (uint64)."""
    if b == 32:
        return unmix32_np(w1, 32).astype(np.uint64)
    m = (w1.astype(np.uint64) << np.uint64(b - 32)) | w2.astype(np.uint64)
    mL = np.uint64((1 << (b - 31)) - 1)
    R = (m >> np.uint64(b - 31)).astype(np.uint32)
    L = m & mL
    R = R ^ (mix32_np((L.astype(np.uint32) ^ np.uint32(_CC)), 32) & np.uint32(_M31))
    L = L ^ (mix32_np((R ^ np.uint32(_CB)), 32).astype(np.uint64) & mL)
    R = R ^ (mix32_np((L.astype(np.uint32) ^ np.uint32(_CA)), 32) & np.uint32(_M31))
    return (R.astype(np.uint64) << np.uint64(b - 31)) | L


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
