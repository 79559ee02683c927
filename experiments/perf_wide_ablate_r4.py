"""Round-4: cumulative stage ablation of the wide step vs narrow.

Times jitted prefixes of the pipeline (encode / +sort / +scan / full step)
so stage costs come from DELTAS of well-fed dispatch queues (sub-ms
standalone ops understate device cost — the host can't feed them).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from nomalise_kmers_multi_large_tpu.ops.encode_kernel import (
    encode_keys, encode_keys_wide,
)
from nomalise_kmers_multi_large_tpu.ops.segscan import rank_cand_scan

READS = 16384
_SENT = jnp.uint32(0xFFFFFFFF)
RID_BITS = 14


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def timeit(fn, *args, iters=16, rounds=3):
    for _ in range(2):
        out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def stages_narrow(k=15):
    pad = 150
    rng = np.random.default_rng(0)
    bases = jnp.asarray(rng.integers(0, 4, size=(READS, pad), dtype=np.uint8))
    lengths = jnp.asarray(np.full((READS,), pad, np.int32))
    W = pad - k + 1
    n = READS * W
    npad = -(-n // 32768) * 32768

    def enc(b, l):
        return encode_keys(b, l, k, False)

    def enc_sort(b, l):
        key = enc(b, l).reshape(n)
        key = jnp.concatenate(
            [key, jnp.full((npad - n,), _SENT, jnp.uint32)])
        rid = jnp.minimum(jnp.arange(npad, dtype=jnp.int32) // W, READS - 1)
        skey, srid = jax.lax.sort((key, rid), num_keys=2, is_stable=False)
        return skey[0] + jnp.uint32(srid[0])

    def enc_sort_scan(b, l):
        key = enc(b, l).reshape(n)
        key = jnp.concatenate(
            [key, jnp.full((npad - n,), _SENT, jnp.uint32)])
        rid = jnp.minimum(jnp.arange(npad, dtype=jnp.int32) // W, READS - 1)
        skey, srid = jax.lax.sort((key, rid), num_keys=2, is_stable=False)
        p2, p3 = rank_cand_scan(skey, srid, fp_bits=16, w=W, n_reads=READS)
        return p2[0] + p3[0]

    for name, fn in [("encode", enc), ("encode+sort", enc_sort),
                     ("encode+sort+scan", enc_sort_scan)]:
        t = timeit(jax.jit(fn), bases, lengths)
        print(f"narrow k={k} {name:18s} {t*1e3:7.3f} ms", flush=True)


def stages_wide(k=21, rows=1 << 14):
    pad = 150 + (k - 15)
    rng = np.random.default_rng(0)
    bases = jnp.asarray(rng.integers(0, 4, size=(READS, pad), dtype=np.uint8))
    lengths = jnp.asarray(np.full((READS,), pad, np.int32))
    W = pad - k + 1
    n = READS * W
    npad = -(-n // 32768) * 32768
    row_shift = 32 - int(np.log2(rows))

    def enc(b, l):
        w1, w2 = encode_keys_wide(b, l, k, False)
        return w1[0, 0] + w2[0, 0]

    def enc_sort(b, l):
        w1, w2 = encode_keys_wide(b, l, k, False)
        k1 = jnp.concatenate(
            [w1.reshape(n), jnp.full((npad - n,), _SENT, jnp.uint32)])
        k2 = jnp.concatenate(
            [w2.reshape(n), jnp.full((npad - n,), _SENT, jnp.uint32)])
        rid = jnp.minimum(jnp.arange(npad, dtype=jnp.int32) // W, READS - 1)
        k2p = jnp.where(k2 == _SENT, _SENT,
                        (k2 << jnp.uint32(RID_BITS)) | rid.astype(jnp.uint32))
        skey1, sk2p = jax.lax.sort((k1, k2p), num_keys=2, is_stable=False)
        return skey1[0] + sk2p[0]

    def enc_sort_scan(b, l):
        w1, w2 = encode_keys_wide(b, l, k, False)
        k1 = jnp.concatenate(
            [w1.reshape(n), jnp.full((npad - n,), _SENT, jnp.uint32)])
        k2 = jnp.concatenate(
            [w2.reshape(n), jnp.full((npad - n,), _SENT, jnp.uint32)])
        rid = jnp.minimum(jnp.arange(npad, dtype=jnp.int32) // W, READS - 1)
        k2p = jnp.where(k2 == _SENT, _SENT,
                        (k2 << jnp.uint32(RID_BITS)) | rid.astype(jnp.uint32))
        skey1, sk2p = jax.lax.sort((k1, k2p), num_keys=2, is_stable=False)
        srid = jax.lax.bitcast_convert_type(
            sk2p & jnp.uint32((1 << RID_BITS) - 1), jnp.int32)
        skey2 = jnp.where(sk2p == _SENT, _SENT, sk2p >> jnp.uint32(RID_BITS))
        p2, p3 = rank_cand_scan(skey1, srid, fp_bits=0, w=W, n_reads=READS,
                                skey2=skey2, row_shift=row_shift)
        return p2[0] + p3[0]

    for name, fn in [("encode", enc), ("encode+sort", enc_sort),
                     ("encode+sort+scan", enc_sort_scan)]:
        t = timeit(jax.jit(fn), bases, lengths)
        print(f"wide   k={k} {name:18s} {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    stages_narrow()
    stages_wide(21)
    stages_wide(16)
