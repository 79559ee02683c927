"""End-to-end perf of the bucket pipeline at bench shapes (k=15, 16k reads)."""
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


K = 15
ROWS = 16384
READS = 16384
PAD = 150
CHUNK = 2048


@partial(jax.jit, static_argnums=(4,), donate_argnums=(0, 1))
def full_step(fp, counts, bases, lengths, chunk):
    hi, lo = encode_windows_canonical(bases, K, False)
    valid = window_validity(lengths, hi, lo, K)
    n = lo.shape[0] * lo.shape[1]
    mixed = mix32(lo.reshape(n), 2 * K)
    out = bucket_batch(fp, counts, mixed, valid.reshape(n),
                       k=K, rows=ROWS, depth=50, windows_per_read=lo.shape[1],
                       chunk=chunk)
    return out


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 4, size=(4096, PAD), dtype=np.uint8)
    idx = rng.integers(0, pool.shape[0], size=READS)
    bases = jnp.asarray(pool[idx])
    lengths = jnp.full((READS,), PAD, jnp.int32)

    for chunk in (2048, 4096):
        fp = jnp.zeros((ROWS, LANES), jnp.int32)
        counts = jnp.zeros((ROWS, LANES), jnp.int32)
        out = full_step(fp, counts, bases, lengths, chunk)
        print(f"chunk={chunk} uniques={int(jnp.sum(out.fp != 0))} "
              f"overflow={int(out.overflow)} "
              f"high_sum={int(jnp.sum(out.high_per_read))}")

        def run(bases, lengths, chunk=chunk):
            fp = jnp.zeros((ROWS, LANES), jnp.int32)
            counts = jnp.zeros((ROWS, LANES), jnp.int32)
            return full_step(fp, counts, bases, lengths, chunk)

        t = timeit(run, bases, lengths, iters=10)
        n_windows = READS * (PAD - K + 1)
        print(f"chunk={chunk}: {t*1e3:8.2f} ms  "
              f"{READS/t/1e3:.0f}k reads/s  {t/n_windows*1e9:.2f} ns/window")


if __name__ == "__main__":
    main()
