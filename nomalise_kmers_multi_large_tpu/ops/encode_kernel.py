"""Fused Pallas encode: bases -> sort-ready mixed window keys, one pass.

TPU-native replacement for the reference's per-window strncpy+encode loop
(``sequence_to_hash`` normalise_kmers_multi_large.c:1459-1499, O(k) per
window) for the bucket-table path (k <= 15, single 30-bit code plane). The
XLA codec (ops/codec.py) builds the same windows from k shifted slices but
materializes intermediates through HBM (~2 ms/batch measured); this kernel
keeps everything in VMEM: k cyclic lane-rolls OR'd into the code plane,
optional canonical min(code, revcomp) via a second complemented accumulation,
the ops/mix.py bijection inlined, and the validity mask folded into the key
(invalid windows become the sort sentinel 0xFFFFFFFF) — so the output feeds
jax.lax.sort directly with no further elementwise passes.

Validity (reference semantics): window w of a read of length len is countable
iff ``w <= len - k`` (nk.c:1464) and its code != 0 (the poly-A drop,
:1483-1484; by bijectivity, code == 0 <=> mixed == mix32(0)). Read lengths
ride along in the last two pad bytes of each row (values 0..1023 — the
reference's MAX_LINE_LENGTH bound, nk.c:139), so the kernel needs no separate
per-read operand.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nomalise_kmers_multi_large_tpu.ops.mix import (
    _C1, _C2, _CA, _CB, _CC, _shifts, mix32_np,
)

BLOCK_READS = 512
_SENT = -1  # int32 bit pattern of the sort sentinel 0xFFFFFFFF
_M31 = (1 << 31) - 1


def _i32(c: int) -> int:
    """int32 literal with the bit pattern of a uint32 constant."""
    return c - (1 << 32) if c >= (1 << 31) else c


def _mix_inline(x, bits: int):
    """ops/mix.py mix32 on an int32 register array (values < 2^bits)."""
    mask = jnp.int32((1 << bits) - 1)
    s1, s2, s3 = _shifts(bits)
    u = pltpu.bitcast(x, jnp.uint32)
    u = (u ^ (u >> jnp.uint32(s1)))
    u = pltpu.bitcast(pltpu.bitcast(u, jnp.int32) & mask, jnp.uint32)
    u = u * jnp.uint32(_C1 | 1)
    u = pltpu.bitcast(pltpu.bitcast(u, jnp.int32) & mask, jnp.uint32)
    u = (u ^ (u >> jnp.uint32(s2)))
    u = pltpu.bitcast(pltpu.bitcast(u, jnp.int32) & mask, jnp.uint32)
    u = u * jnp.uint32(_C2 | 1)
    u = pltpu.bitcast(pltpu.bitcast(u, jnp.int32) & mask, jnp.uint32)
    u = (u ^ (u >> jnp.uint32(s3)))
    return pltpu.bitcast(u, jnp.int32) & mask


def _window_codes(b, k: int, lp: int, comp: bool):
    """2k-bit window codes of every start position via LOG-DOUBLING:
    D_m[:, i] = code of bases i..i+m-1 (complemented when `comp`, building
    the reverse-complement: rc(xy) = rc(y) ++ rc(x), so the doubled word
    takes the ROLLED half on top and pieces compose at shift 2*offset).
    ceil(log2 k) + popcount(k)-1 lane-rolls instead of k-1 — Mosaic rolls
    are the entire cost of this kernel (~27 ps/element each; the straight
    k-1-roll version measured 1.7 ms/batch at k=15, docs/PERF_NOTES.md
    round 4)."""
    base = (b ^ 3) if comp else b
    D = {1: base}
    m = 1
    while 2 * m <= k:
        rolled = pltpu.roll(D[m], lp - m, 1)         # D_m[:, i+m]
        D[2 * m] = ((rolled << (2 * m)) | D[m]) if comp \
            else ((D[m] << (2 * m)) | rolled)
        m *= 2
    code = None
    o = 0
    for p in (8, 4, 2, 1):
        if not (k & p):
            continue
        piece = D[p] if o == 0 else pltpu.roll(D[p], lp - o, 1)
        sh = 2 * o if comp else 2 * (k - o - p)
        piece = piece << sh
        code = piece if code is None else code | piece
        o += p
    return code


def _kernel(k: int, canonical: bool, w: int, lp: int, mix0: int,
            b_ref, key_ref):
    b = b_ref[:].astype(jnp.int32)                   # (B, Lp)
    code = _window_codes(b, k, lp, comp=False)
    if canonical:
        rc = _window_codes(b, k, lp, comp=True)
        code = jnp.minimum(code, rc)                 # < 2^30: int32-safe
    mixed = _mix_inline(code, 2 * k)
    # read length rides in the last two pad bytes (hi, lo)
    length = b[:, lp - 2:lp - 1] * 256 + b[:, lp - 1:lp]     # (B, 1)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    valid = (w_iota <= (length - k)) & (mixed != mix0)
    # validity needs no second output plane: key == SENT <=> invalid (saves
    # ~18 MB of HBM traffic per 16k-read batch; callers derive totals from
    # key != SENT)
    key_ref[:] = jnp.where(valid, mixed, _SENT)[:, :w]


def _mix_inline32(x):
    """Full-width 32-bit bijective mix (ops/mix.py mix32 with bits=32) on an
    int32 register array."""
    u = pltpu.bitcast(x, jnp.uint32)
    u = u ^ (u >> jnp.uint32(16))
    u = u * jnp.uint32(_C1 | 1)
    u = u ^ (u >> jnp.uint32(13))
    u = u * jnp.uint32(_C2 | 1)
    u = u ^ (u >> jnp.uint32(16))
    return pltpu.bitcast(u, jnp.int32)


def _lshr(x, s: int):
    """Logical (unsigned) right shift of an int32 register array."""
    if s == 0:
        return x
    return pltpu.bitcast(
        pltpu.bitcast(x, jnp.uint32) >> jnp.uint32(s), jnp.int32)


def _window_codes_2w(b, k: int, lp: int, comp: bool):
    """Two-word (hi, lo) 2k-bit window codes via the same log-doubling as
    _window_codes: every intermediate D_m (m <= 16) fits one 32-bit word;
    only the final composition spills across the hi/lo pair.
    ceil(log2 k) + popcount(k)-1 rolls instead of k-1."""
    base = (b ^ 3) if comp else b
    D = {1: base}
    m = 1
    while 2 * m <= k:
        rolled = pltpu.roll(D[m], lp - m, 1)         # D_m[:, i+m]
        if comp:
            # rc(xy) = rc(y) ++ rc(x): rolled half on top. 2m = 32 shifts
            # the kept half fully out: the doubled word IS the rolled one
            # shifted, OR'd via uint semantics below
            D[2 * m] = pltpu.bitcast(
                (pltpu.bitcast(rolled, jnp.uint32) << jnp.uint32(2 * m))
                | pltpu.bitcast(D[m], jnp.uint32), jnp.int32)
        else:
            D[2 * m] = pltpu.bitcast(
                (pltpu.bitcast(D[m], jnp.uint32) << jnp.uint32(2 * m))
                | pltpu.bitcast(rolled, jnp.uint32), jnp.int32)
        m *= 2
    hi = jnp.zeros_like(b)
    lo = jnp.zeros_like(b)
    o = 0
    for p in (16, 8, 4, 2, 1):
        if not (k & p):
            continue
        piece = D[p] if o == 0 else pltpu.roll(D[p], lp - o, 1)
        sh = 2 * o if comp else 2 * (k - o - p)      # bit offset in the code
        if sh >= 32:
            hi = hi | (piece << (sh - 32))
        else:
            lo = lo | (piece << sh)
            if sh > 0:
                hi = hi | _lshr(piece, 32 - sh)
            elif 2 * p > 32:
                pass  # cannot happen: D_p <= 32 bits
        o += p
    return hi, lo


def _kernel_wide(k: int, canonical: bool, w: int, lp: int,
                 b_ref, w1_ref, w2_ref):
    """Wide (k > 15) fused encode+mix: 62-bit window codes as two planes,
    canonical min over the pair, the ops/mix.py Feistel inlined, sentinel
    fold. Mirrors _kernel below; see encode_keys_wide."""
    bts = b_ref[:].astype(jnp.int32)                 # (B, Lp)
    b = 2 * k
    hi, lo = _window_codes_2w(bts, k, lp, comp=False)
    if canonical:
        rhi, rlo = _window_codes_2w(bts, k, lp, comp=True)
        hu = pltpu.bitcast(hi, jnp.uint32)
        lu = pltpu.bitcast(lo, jnp.uint32)
        rhu = pltpu.bitcast(rhi, jnp.uint32)
        rlu = pltpu.bitcast(rlo, jnp.uint32)
        take_rc = (rhu < hu) | ((rhi == hi) & (rlu < lu))
        hi = jnp.where(take_rc, rhi, hi)
        lo = jnp.where(take_rc, rlo, lo)

    # ops/mix.py feistel_words, int32 register edition
    if b == 32:
        w1 = _mix_inline32(lo)
        w2 = jnp.zeros_like(lo)
    else:
        mL = (1 << (b - 31)) - 1
        R = ((hi << (63 - b)) | _lshr(lo, b - 31)) & _M31
        L = lo & mL
        R = R ^ (_mix_inline32(L ^ _i32(_CA)) & _M31)
        L = L ^ (_mix_inline32(R ^ _i32(_CB)) & mL)
        R = R ^ (_mix_inline32(L ^ _i32(_CC)) & _M31)
        w1 = (R << 1) | _lshr(L, b - 32)
        w2 = L & ((1 << (b - 32)) - 1)

    length = bts[:, lp - 2:lp - 1] * 256 + bts[:, lp - 1:lp]     # (B, 1)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, bts.shape, 1)
    valid = (w_iota <= (length - k)) & ((hi | lo) != 0)  # poly-A drop :1483
    w1_ref[:] = jnp.where(valid, w1, _SENT)[:, :w]
    w2_ref[:] = jnp.where(valid, w2, _SENT)[:, :w]


def encode_keys_wide(bases: jax.Array, lengths: jax.Array, k: int,
                     canonical: bool, interpret: bool = False):
    """Sort words for all k-windows of every read, k in 16..31.

    Like encode_keys, but the 2k-bit code is carried as two planes and mixed
    with the ops/mix.py Feistel bijection. Returns (w1, w2) uint32 [R, W];
    invalid windows hold the sentinel pair (0xFFFFFFFF, 0xFFFFFFFF) — a real
    w2 is < 2^(2k-32), so ``w2 != 0xFFFFFFFF`` IS window validity.
    """
    assert 16 <= k <= 31
    R, L = bases.shape
    W = L - k + 1
    lp = -(-(L + 2) // 128) * 128
    lens = jnp.clip(lengths.astype(jnp.int32), 0, 1023)
    tail = jnp.zeros((R, lp - L - 2), jnp.uint8) if lp - L - 2 else None
    cols = [bases]
    if tail is not None:
        cols.append(tail)
    cols.append((lens[:, None] >> 8).astype(jnp.uint8))
    cols.append((lens[:, None] & 255).astype(jnp.uint8))
    padded = jnp.concatenate(cols, axis=1)
    br = min(BLOCK_READS, max(8, R))
    rpad = -(-R // br) * br
    if rpad != R:
        padded = jnp.pad(padded, ((0, rpad - R), (0, 0)))
    w1, w2 = pl.pallas_call(
        partial(_kernel_wide, k, canonical, W, lp),
        grid=(rpad // br,),
        in_specs=[pl.BlockSpec((br, lp), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((br, W), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, W), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rpad, W), jnp.int32),
            jax.ShapeDtypeStruct((rpad, W), jnp.int32),
        ],
        interpret=interpret,
    )(padded)
    if rpad != R:
        w1, w2 = w1[:R], w2[:R]
    return (jax.lax.bitcast_convert_type(w1, jnp.uint32),
            jax.lax.bitcast_convert_type(w2, jnp.uint32))


def encode_keys(bases: jax.Array, lengths: jax.Array, k: int, canonical: bool,
                interpret: bool = False) -> jax.Array:
    """Sort keys for all k-windows of every read.

    Args:
      bases: [R, L] uint8 2-bit base codes (0..3; padding bytes any 0..3).
      lengths: [R] int32 read lengths (0 marks an invalid read), <= 1023.
      k: k-mer size, k <= 15 (single 30-bit plane).

    Returns:
      key: uint32 [R, W] bijectively-mixed window codes with INVALID windows
        already set to the sort sentinel 0xFFFFFFFF; W = L - k + 1. Window
        validity IS ``key != 0xFFFFFFFF`` (no separate plane).
    """
    assert k <= 15
    R, L = bases.shape
    W = L - k + 1
    lp = -(-(L + 2) // 128) * 128
    lens = jnp.clip(lengths.astype(jnp.int32), 0, 1023)
    tail = jnp.zeros((R, lp - L - 2), jnp.uint8) if lp - L - 2 else None
    cols = [bases]
    if tail is not None:
        cols.append(tail)
    cols.append((lens[:, None] >> 8).astype(jnp.uint8))
    cols.append((lens[:, None] & 255).astype(jnp.uint8))
    padded = jnp.concatenate(cols, axis=1)
    mix0 = int(mix32_np(np.zeros(1, np.uint32), 2 * k)[0])
    br = min(BLOCK_READS, max(8, R))
    rpad = -(-R // br) * br
    if rpad != R:
        # pad rows are all-zero: length 0 => every window invalid
        padded = jnp.pad(padded, ((0, rpad - R), (0, 0)))
    key = pl.pallas_call(
        partial(_kernel, k, canonical, W, lp, mix0),
        grid=(rpad // br,),
        in_specs=[pl.BlockSpec((br, lp), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rpad, W), jnp.int32),
        interpret=interpret,
    )(padded)
    if rpad != R:
        key = key[:R]
    return jax.lax.bitcast_convert_type(key, jnp.uint32)
