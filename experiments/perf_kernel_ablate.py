"""In-kernel ablation of the bucket kernel: which pass-A stage costs what.

Uses bucket_batch's `ablate` toggles to compile kernel variants with stages
removed, at bench shapes (k=15, 16k reads, warm ~500k-entry table), medians
of repeated timed rounds to ride out the axon tunnel jitter.
"""
from __future__ import annotations

import statistics
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nomalise_kmers_multi_large_tpu.ops.bucket_kernel import bucket_batch
from nomalise_kmers_multi_large_tpu.ops.mix import mix32_np

K = 15
ROWS = 16384
READS = 16384
W = 136
N = READS * W


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def timeit(fn, fp, cnt, m, v, iters=8, rounds=5, warmup=2):
    # the step donates (fp, counts): chain them like the engine does
    for _ in range(warmup):
        out = fn(fp, cnt, m, v)
        fp, cnt = out.fp, out.counts
    sync(out)
    meds = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(fp, cnt, m, v)
            fp, cnt = out.fp, out.counts
        sync(out)
        meds.append((time.perf_counter() - t0) / iters)
    return min(meds)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    # bench-like redundancy: codes from a 300k-unique pool
    pool = rng.integers(1, 4**K, size=300_000, dtype=np.uint64).astype(np.uint32)
    codes = pool[rng.integers(0, pool.shape[0], size=N)]
    mixed = mix32_np(codes, 2 * K)  # host-side: large D2H hits tunnel limits
    valid = np.ones(N, bool)

    def make(ablate):
        @partial(jax.jit, donate_argnums=(0, 1))
        def f(fp, counts, m, v):
            out = bucket_batch(fp, counts, m, v, k=K, rows=ROWS, depth=50,
                               windows_per_read=W, ablate=ablate)
            return out
        return f

    # warm table: run one full batch first
    fp = jnp.zeros((ROWS, 128), jnp.int32)
    cnt = jnp.zeros((ROWS, 128), jnp.int32)
    full = make(())
    out = full(fp, cnt, jnp.asarray(mixed), jnp.asarray(valid))
    fp_w, cnt_w = out.fp, out.counts
    print("warm table occupancy:", int(jnp.sum(fp_w != 0)))

    variants = [
        ("full", ()),
        ("no_recsum", ("no_recsum",)),
        ("no_delta", ("no_delta",)),
        ("no_recsum+delta", ("no_recsum", "no_delta")),
        ("no_match(+gather only)", ("no_match", "no_recsum", "no_delta")),
        ("no_gather(decode only)", ("no_gather", "no_match", "no_recsum",
                                    "no_delta")),
    ]
    base = None
    for name, ab in variants:
        f = make(ab)
        # fresh copies (donated)
        t = timeit(f, fp_w.copy(), cnt_w.copy(), jnp.asarray(mixed),
                   jnp.asarray(valid))
        if base is None:
            base = t
        print(f"{name:26s} {t*1e3:7.2f} ms   saves {(base-t)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
