"""Round-4: relaxed (1-key) vs exact (2-key) at bench shape, on-chip.

Measures (a) the standalone sort variants the relaxed mode trades between,
including the 1-key UNSTABLE + payload sort that ops/bucket_kernel.py now
uses for --mode relaxed (r3 measured only the stable variant), and (b) the
full BatchStep in exact vs relaxed mode (grouped dispatch, bench shape).

Methodology per CLAUDE.md: 32 back-to-back dispatches per round, forced-D2H
sync, best of 3 rounds.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

READS = 16384
W = 136
N = READS * W


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def timeit(fn, *args, iters=32, rounds=3, warmup=2):
    for _ in range(warmup):
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


def sorts():
    rng = np.random.default_rng(0)
    key = jnp.asarray(
        rng.integers(0, 1 << 30, size=N, dtype=np.int64).astype(np.uint32))
    rid = jnp.asarray((np.arange(N, dtype=np.int64) // W).astype(np.int32))

    @jax.jit
    def s2(k, r):
        sk, sr = jax.lax.sort((k, r), num_keys=2, is_stable=False)
        return sk[0] + jnp.uint32(sr[0])

    @jax.jit
    def s1_payload_unstable(k, r):
        sk, sr = jax.lax.sort((k, r), num_keys=1, is_stable=False)
        return sk[0] + jnp.uint32(sr[0])

    @jax.jit
    def s1_payload_stable(k, r):
        sk, sr = jax.lax.sort((k, r), num_keys=1, is_stable=True)
        return sk[0] + jnp.uint32(sr[0])

    @jax.jit
    def s1_keyonly(k, r):
        (sk,) = jax.lax.sort((k,), num_keys=1, is_stable=False)
        return sk[0] + jnp.uint32(r[0])

    for name, fn in [
        ("2-key unstable [exact]", s2),
        ("1-key unstable + payload [relaxed]", s1_payload_unstable),
        ("1-key stable + payload", s1_payload_stable),
        ("1-key key-only (floor)", s1_keyonly),
    ]:
        t = timeit(fn, key, rid)
        print(f"{name:38s} {t*1e3:7.3f} ms  ({t/N*1e9:.2f} ns/el)", flush=True)


def full_step(mode: str, group=10, iters=4, rounds=3):
    from nomalise_kmers_multi_large_tpu.engine.step import BatchStep
    from nomalise_kmers_multi_large_tpu.table import BucketTable

    rng = np.random.default_rng(0)
    pool = rng.integers(0, 4, size=(4096, 150), dtype=np.uint8)
    idx = rng.integers(0, pool.shape[0], size=(group, READS))
    batches = jnp.asarray(pool[idx])
    lengths = jnp.asarray(np.full((group, READS), 150, np.int32))
    rv = jnp.asarray(np.ones((group, READS // 2), bool))

    table = BucketTable(15)
    step = BatchStep(table, k=15, depth_per_shard=50, coverage=0.9,
                     canonical=False, paired=True, mode=mode)
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
    rps = READS * group * iters / best
    ms = best / (group * iters) * 1e3
    print(f"full step mode={mode:8s} {ms:6.3f} ms/batch  {rps:,.0f} reads/s",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    sorts()
    full_step("exact")
    full_step("relaxed")
