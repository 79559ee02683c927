"""Stage breakdown of the bucket step at bench shapes: encode / sort+rank
preprocessing / pallas kernel. Identifies the current wall on real hardware."""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nomalise_kmers_multi_large_tpu.ops.bucket_kernel import LANES, bucket_batch
from nomalise_kmers_multi_large_tpu.ops.codec import (
    encode_windows_canonical, window_validity,
)
from nomalise_kmers_multi_large_tpu.ops.mix import mix32

K = 15
ROWS = 16384
READS = 16384
PAD = 150
CHUNK = 16384
_SENT = jnp.uint32(0xFFFFFFFF)


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


@jax.jit
def stage_encode(bases, lengths):
    hi, lo = encode_windows_canonical(bases, K, False)
    valid = window_validity(lengths, hi, lo, K)
    n = lo.shape[0] * lo.shape[1]
    return mix32(lo.reshape(n), 2 * K), valid.reshape(n)


@jax.jit
def stage_sort(mixed_flat, valid_flat):
    n = mixed_flat.shape[0]
    npad = -(-n // CHUNK) * CHUNK
    pad = npad - n
    key = jnp.where(valid_flat, mixed_flat, _SENT)
    if pad:
        key = jnp.concatenate([key, jnp.full((pad,), _SENT, jnp.uint32)])
    pos = jnp.arange(npad, dtype=jnp.int32)
    skey, src = jax.lax.sort((key, pos), num_keys=2)
    return skey, src


@jax.jit
def stage_rank(skey, src):
    from nomalise_kmers_multi_large_tpu.ops.segscan import rank_cand_scan
    return rank_cand_scan(skey, src, fp_bits=2 * K - 14, w=PAD - K + 1,
                          n_reads=READS)


@partial(jax.jit, donate_argnums=(0, 1))
def stage_full(fp, counts, bases, lengths):
    hi, lo = encode_windows_canonical(bases, K, False)
    valid = window_validity(lengths, hi, lo, K)
    n = lo.shape[0] * lo.shape[1]
    mixed = mix32(lo.reshape(n), 2 * K)
    return bucket_batch(fp, counts, mixed, valid.reshape(n),
                        k=K, rows=ROWS, depth=50, windows_per_read=lo.shape[1],
                        chunk=CHUNK)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 4, size=(4096, PAD), dtype=np.uint8)
    idx = rng.integers(0, pool.shape[0], size=READS)
    bases = jnp.asarray(pool[idx])
    lengths = jnp.full((READS,), PAD, jnp.int32)
    n_windows = READS * (PAD - K + 1)

    mixed, valid = stage_encode(bases, lengths)
    skey, src = stage_sort(mixed, valid)

    t_enc = timeit(stage_encode, bases, lengths)
    t_sort = timeit(stage_sort, mixed, valid)
    t_rank = timeit(stage_rank, skey, src)

    def run_full(bases, lengths):
        fp = jnp.zeros((ROWS, LANES), jnp.int32)
        counts = jnp.zeros((ROWS, LANES), jnp.int32)
        return stage_full(fp, counts, bases, lengths)

    t_full = timeit(run_full, bases, lengths, iters=10)

    for name, t in [("encode+mix", t_enc), ("sort2key", t_sort),
                    ("segscan (pallas)", t_rank), ("FULL step", t_full)]:
        print(f"{name:16s} {t*1e3:8.2f} ms   {t/n_windows*1e9:6.2f} ns/window"
              f"   {READS/t/1e3:8.0f}k reads/s")
    resid = t_full - t_enc - t_sort - t_rank
    print(f"{'residual=kernel':16s} {resid*1e3:8.2f} ms   "
          f"{resid/n_windows*1e9:6.2f} ns/window")


if __name__ == "__main__":
    main()
