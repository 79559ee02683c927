"""Round-4 follow-up: packed-window wide re-measure + stride-2 narrow.

Run AFTER the packed-fingerprint-window change to _kernel_wide: same
harness as perf_wide_r4.py so the deltas are directly comparable, plus the
reference's own proposed stride optimization (nk.c:30-33) on the narrow
path (windows sampled every s-th position -> sort N/s).
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


def full_step(k: int, stride=1, mode="exact", group=4, iters=3, rounds=3):
    from nomalise_kmers_multi_large_tpu.engine.step import BatchStep
    from nomalise_kmers_multi_large_tpu.table import (
        BucketTable, BucketTableWide,
    )

    pad = 150 + max(0, k - 15)
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 4, size=(4096, pad), dtype=np.uint8)
    idx = rng.integers(0, pool.shape[0], size=(group, READS))
    batches = jnp.asarray(pool[idx])
    lengths = jnp.asarray(np.full((group, READS), pad, np.int32))
    rv = jnp.asarray(np.ones((group, READS // 2), bool))

    table = BucketTable(k) if k <= 15 else BucketTableWide(k, rows=1 << 14)
    step = BatchStep(table, k=k, depth_per_shard=50, coverage=0.9,
                     canonical=False, paired=True, mode=mode, stride=stride)
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
    print(f"k={k} stride={stride} mode={mode:8s} {ms:6.3f} ms/batch  "
          f"{READS / best * group * iters:,.0f} reads/s", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for k in (16, 21, 24):
        full_step(k)                      # packed-window wide
    full_step(15, stride=2)               # reference's stride idea, exact
    full_step(15, stride=2, mode="relaxed")
