"""Round-4: bisect the wide kernel's ~2.2 ms fixed overhead vs narrow.

Feeds pre-made keyed streams (no encode) straight to bucket_batch /
bucket_batch_wide at bench shape and ablates the wide kernel's stages.
Internal sort+scan (~4 ms) is constant across variants; deltas attribute
the kernel-side cost.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from nomalise_kmers_multi_large_tpu.ops.bucket_kernel import (
    bucket_batch, bucket_batch_wide,
)

READS = 16384
W = 136
N = READS * W
ROWS = 1 << 14


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0:1]))


def timeit(fn, *args, iters=8, rounds=3):
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


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 1 << 30, size=500_000, dtype=np.int64)
    key_n = jnp.asarray(
        pool[rng.integers(0, len(pool), N)].astype(np.uint32))
    pool32 = rng.integers(0, 1 << 32, size=500_000, dtype=np.int64)
    key_w = jnp.asarray(
        pool32[rng.integers(0, len(pool32), N)].astype(np.uint32))
    zeros = jnp.zeros(N, jnp.uint32)

    fp = jnp.zeros((ROWS, 64), jnp.int32)
    cnt = jnp.zeros((ROWS, 64), jnp.int32)

    @jax.jit
    def narrow(fp, cnt):
        out = bucket_batch(fp, cnt, key_n, None, k=15, rows=ROWS, depth=50,
                           windows_per_read=W, lanes=64, keyed=True)
        return out.fp, out.counts, out.high_per_read

    fp2, cnt2, _ = narrow(fp, cnt)   # populate so steady state matches
    t = timeit(narrow, fp2, cnt2)
    print(f"narrow k=15 full          {t*1e3:7.3f} ms", flush=True)

    def wide_fn(ablate):
        @jax.jit
        def f(fpA, cnt):
            out = bucket_batch_wide(
                fpA, None, cnt, key_w, zeros, None, k=16, rows=ROWS,
                depth=50, windows_per_read=W, lanes=64, keyed=True,
                ablate=ablate)
            return out.fpA, out.counts, out.high_per_read
        return f

    f0 = wide_fn(())
    fpA2, cntw2, _ = f0(fp, cnt)
    for ablate in [(), ("no_insert",), ("no_insert", "no_recsum"),
                   ("no_insert", "no_recsum", "no_delta"),
                   ("no_insert", "no_recsum", "no_delta", "no_gather")]:
        t = timeit(wide_fn(ablate), fpA2, cntw2)
        print(f"wide k=16 {','.join(ablate) or 'full':40s} {t*1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
