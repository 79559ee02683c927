"""In-graph ablation of the full bench step: each level adds one pipeline
stage INSIDE a single jit (no per-stage dispatch inflation). Deltas between
consecutive levels are the true in-graph device costs.

L0 encode_keys only
L1 + rid iota + 2-key unstable sort
L2 + rank_cand_scan (segscan)
L3 + step maps (elem_tile, cumsum, scalar-prefetch vectors)
L4 + bucket pallas kernel (full bucket_batch, warm table)
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nomalise_kmers_multi_large_tpu.ops.bucket_kernel import (
    LANES, _SENT, bucket_batch,
)
from nomalise_kmers_multi_large_tpu.ops.encode_kernel import encode_keys
from nomalise_kmers_multi_large_tpu.ops.segscan import (
    BLOCK as SCAN_BLOCK, rank_cand_scan,
)

K = 15
ROWS = 16384
READS = 16384
PAD = 150
CHUNK = 16384
W = PAD - K + 1
N = READS * W
FP_BITS = 2 * K - 14


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def timeit(fn, *args, iters=15, warmup=3):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def prep(key2d):
    n = key2d.shape[0] * key2d.shape[1]
    key = key2d.reshape(n)
    quantum = max(CHUNK, SCAN_BLOCK)
    npad = -(-n // quantum) * quantum
    if npad > n:
        key = jnp.concatenate(
            [key, jnp.full((npad - n,), _SENT, jnp.uint32)])
    rid = jnp.minimum(jnp.arange(npad, dtype=jnp.int32) // W, READS - 1)
    return key, rid


@jax.jit
def l0(bases, lengths):
    key2d = encode_keys(bases, lengths, K, False)
    valid = key2d != jnp.uint32(0xFFFFFFFF)
    return jnp.sum(key2d, dtype=jnp.uint32) + jnp.sum(valid)


@jax.jit
def l1(bases, lengths):
    key2d = encode_keys(bases, lengths, K, False)
    valid = key2d != jnp.uint32(0xFFFFFFFF)
    key, rid = prep(key2d)
    skey, srid = jax.lax.sort((key, rid), num_keys=2, is_stable=False)
    return jnp.sum(skey, dtype=jnp.uint32) + jnp.sum(srid) + jnp.sum(valid)


@jax.jit
def l2(bases, lengths):
    key2d = encode_keys(bases, lengths, K, False)
    valid = key2d != jnp.uint32(0xFFFFFFFF)
    key, rid = prep(key2d)
    skey, srid = jax.lax.sort((key, rid), num_keys=2, is_stable=False)
    p2, p3 = rank_cand_scan(skey, srid, fp_bits=FP_BITS, w=W, n_reads=READS)
    return (jnp.sum(skey, dtype=jnp.uint32) + jnp.sum(p2) + jnp.sum(p3)
            + jnp.sum(valid))


@jax.jit
def l3(bases, lengths):
    key2d = encode_keys(bases, lengths, K, False)
    valid = key2d != jnp.uint32(0xFFFFFFFF)
    key, rid = prep(key2d)
    skey, srid = jax.lax.sort((key, rid), num_keys=2, is_stable=False)
    p2, p3 = rank_cand_scan(skey, srid, fp_bits=FP_BITS, w=W, n_reads=READS)
    tb = 7  # log2(TILE_ROWS)
    n_tiles = ROWS // 128
    npad = skey.shape[0]
    n_chunks = npad // CHUNK
    elem_tile = jnp.minimum(
        jax.lax.shift_right_logical(skey, jnp.uint32(FP_BITS + tb)),
        jnp.uint32(n_tiles)).astype(jnp.int32)
    first_t = elem_tile[0::CHUNK]
    last_t = elem_tile[CHUNK - 1::CHUNK]
    span = jnp.where(first_t < n_tiles,
                     jnp.minimum(last_t, n_tiles - 1) - first_t + 1, 0)
    cum = jnp.cumsum(span) - span
    s_iota = jnp.arange(n_chunks + n_tiles, dtype=jnp.int32)
    le = (cum[None, :] <= s_iota[:, None]) & (span[None, :] > 0)
    step_chunkv = jnp.max(
        jnp.where(le, jnp.arange(n_chunks, dtype=jnp.int32)[None, :], -1),
        axis=1)
    return (jnp.sum(step_chunkv) + jnp.sum(p2) + jnp.sum(p3)
            + jnp.sum(valid) + jnp.sum(skey, dtype=jnp.uint32))


@partial(jax.jit, donate_argnums=(0, 1))
def l4(fp, counts, bases, lengths):
    key2d = encode_keys(bases, lengths, K, False)
    valid = key2d != jnp.uint32(0xFFFFFFFF)
    out = bucket_batch(fp, counts, key2d.reshape(-1), None, k=K, rows=ROWS,
                       depth=50, windows_per_read=W, chunk=CHUNK, keyed=True)
    return out.fp, out.counts, jnp.sum(out.high_per_read) + jnp.sum(valid)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 4, size=(4096, PAD), dtype=np.uint8)
    bases = jnp.asarray(pool[rng.integers(0, 4096, READS)])
    lengths = jnp.full((READS,), PAD, jnp.int32)

    ts = []
    for name, fn in [("L0 encode", l0), ("L1 +sort", l1),
                     ("L2 +segscan", l2), ("L3 +maps", l3)]:
        t = timeit(fn, bases, lengths)
        ts.append((name, t))

    fp = jnp.zeros((ROWS, LANES), jnp.int32)
    counts = jnp.zeros((ROWS, LANES), jnp.int32)
    fp, counts, _ = l4(fp, counts, bases, lengths)
    state = [fp, counts]

    def run4(bases, lengths):
        f, c, s = l4(state[0], state[1], bases, lengths)
        state[0], state[1] = f, c
        return s

    ts.append(("L4 +kernel", timeit(run4, bases, lengths)))

    prev = 0.0
    for name, t in ts:
        print(f"{name:12s} {t*1e3:8.2f} ms   delta {(t-prev)*1e3:7.2f} ms")
        prev = t
    print(f"L4 reads/s: {READS/ts[-1][1]/1e3:.0f}k")


if __name__ == "__main__":
    main()
