"""Stage breakdown of the CURRENT bench path (fused encode_keys + bucket_batch
internals): encode / 1-key sort / segscan / pallas bucket kernel, each timed
separately at exact bench shapes. Ground truth for the next optimization."""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nomalise_kmers_multi_large_tpu.ops.bucket_kernel import (
    LANES, SUB, _SENT, bucket_batch,
)
from nomalise_kmers_multi_large_tpu.ops.encode_kernel import encode_keys
from nomalise_kmers_multi_large_tpu.ops.segscan import BLOCK as SCAN_BLOCK, rank_cand_scan

K = 15
ROWS = 16384
READS = 16384
PAD = 150
CHUNK = 16384
W = PAD - K + 1


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


@jax.jit
def stage_encode(bases, lengths):
    key2d = encode_keys(bases, lengths, K, False)
    return key2d, key2d != jnp.uint32(0xFFFFFFFF)


@jax.jit
def stage_sort(key2d):
    n = key2d.shape[0] * key2d.shape[1]
    key = key2d.reshape(n)
    quantum = max(CHUNK, SCAN_BLOCK)
    npad = -(-n // quantum) * quantum
    pad = npad - n
    if pad:
        key = jnp.concatenate([key, jnp.full((pad,), _SENT, jnp.uint32)])
    pos = jnp.arange(npad, dtype=jnp.int32)
    skey, src = jax.lax.sort((key, pos), num_keys=1, is_stable=True)
    return skey, src


@jax.jit
def stage_rank(skey, src):
    return rank_cand_scan(skey, src, fp_bits=2 * K - 14, w=W, n_reads=READS)


@partial(jax.jit, donate_argnums=(0, 1))
def stage_full(fp, counts, key2d):
    n = key2d.shape[0] * key2d.shape[1]
    return bucket_batch(fp, counts, key2d.reshape(n), None,
                        k=K, rows=ROWS, depth=50, windows_per_read=W,
                        chunk=CHUNK, keyed=True)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 4, size=(4096, PAD), dtype=np.uint8)
    idx = rng.integers(0, pool.shape[0], size=READS)
    bases = jnp.asarray(pool[idx])
    lengths = jnp.full((READS,), PAD, jnp.int32)
    n_windows = READS * W

    key2d, valid = stage_encode(bases, lengths)
    skey, src = stage_sort(key2d)

    t_enc = timeit(stage_encode, bases, lengths)
    t_sort = timeit(stage_sort, key2d)
    t_rank = timeit(stage_rank, skey, src)

    def run_full(key2d):
        fp = jnp.zeros((ROWS, LANES), jnp.int32)
        counts = jnp.zeros((ROWS, LANES), jnp.int32)
        return stage_full(fp, counts, key2d)

    t_full = timeit(run_full, key2d, iters=10)

    for name, t in [("encode_keys", t_enc), ("sort 1-key stable", t_sort),
                    ("segscan (pallas)", t_rank), ("FULL bucket_batch", t_full)]:
        print(f"{name:18s} {t*1e3:8.2f} ms   {t/n_windows*1e9:6.2f} ns/window"
              f"   {READS/t/1e3:8.0f}k reads/s")
    resid = t_full - t_sort - t_rank
    print(f"{'residual=kernel':18s} {resid*1e3:8.2f} ms   "
          f"{resid/n_windows*1e9:6.2f} ns/window")


if __name__ == "__main__":
    main()
