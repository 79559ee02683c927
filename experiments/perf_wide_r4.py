"""Round-4 wide-path budget: where do the extra ms go at k=21 vs k=15?

Full wide step at k = 16 / 21 / 24 (gather planes 4 / 6 / 6, match limbs
3 / 5 / 5, fpB plane absent at k=16) plus the fused wide encode alone.
Bench shape: 16384 reads, 136 windows/read.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

READS = 16384


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def full_step(k: int, group=4, iters=3, rounds=3):
    from nomalise_kmers_multi_large_tpu.engine.step import BatchStep
    from nomalise_kmers_multi_large_tpu.table import BucketTableWide

    pad = 150 + (k - 15)  # keep W = 136 windows/read like the k=15 headline
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 4, size=(4096, pad), dtype=np.uint8)
    idx = rng.integers(0, pool.shape[0], size=(group, READS))
    batches = jnp.asarray(pool[idx])
    lengths = jnp.asarray(np.full((group, READS), pad, np.int32))
    rv = jnp.asarray(np.ones((group, READS // 2), bool))

    table = BucketTableWide(k, rows=1 << 14)
    step = BatchStep(table, k=k, depth_per_shard=50, coverage=0.9,
                     canonical=False, paired=True, mode="exact")
    state = table.init()
    for _ in range(2):
        state, keep, stats, _ = step.step_many(state, batches, lengths, rv)
    sync(keep)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, keep, stats, _ = step.step_many(state, batches, lengths, rv)
        sync(keep)
        best = min(best, time.perf_counter() - t0)
    ms = best / (group * iters) * 1e3
    print(f"full wide step k={k}: {ms:6.3f} ms/batch  "
          f"{READS / best * group * iters:,.0f} reads/s", flush=True)


def encode_only(k: int, iters=32, rounds=3):
    from nomalise_kmers_multi_large_tpu.ops.encode_kernel import (
        encode_keys, encode_keys_wide,
    )

    pad = 150 + (k - 15)
    rng = np.random.default_rng(0)
    bases = jnp.asarray(
        rng.integers(0, 4, size=(READS, pad), dtype=np.uint8))
    lengths = jnp.asarray(np.full((READS,), pad, np.int32))

    if k <= 15:
        fn = jax.jit(lambda b, l: encode_keys(b, l, k, False))
    else:
        fn = jax.jit(lambda b, l: encode_keys_wide(b, l, k, False)[1])
    for _ in range(2):
        out = fn(bases, lengths)
    sync(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(bases, lengths)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"encode only k={k}: {best*1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    encode_only(15)
    encode_only(21)
    for k in (16, 21, 24):
        full_step(k)
