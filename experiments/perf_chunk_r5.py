"""Round 5: chunk-size A/B on the narrow bucket kernel.

At bench shape (16384 reads x 136 windows, rows=16384, tile_rows=128) the
grid runs n_chunks + n_tiles steps; with chunk=16384 that is 136 + 128 =
264 steps for 136 chunks of real work — nearly every chunk crosses a tile
boundary, and each crossing step pays the fixed per-step cost (plane
construction, block bookkeeping) even though the skip bitmask blanks its
subs. chunk=32768 halves the chunk count (68 + 128 = 196 steps); 65536
quarters it (34 + 128 = 162) at higher VMEM stream-block cost (round-1
measured 65536 as 50% WORSE at 128 lanes pre-bitmask; re-test at 64 lanes).

Run on the chip: PYTHONPATH=/root/repo:/root/.axon_site python
experiments/perf_chunk_r5.py
"""
import time

import numpy as np

READ_LEN = 150
K = 15
BATCH = 16384
GROUP = 10
ITERS = 4
ROUNDS = 3


def _sync(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def bench(chunk, mode="exact"):
    import jax.numpy as jnp

    from nomalise_kmers_multi_large_tpu.engine.step import BatchStep
    from nomalise_kmers_multi_large_tpu.table import BucketTable

    pad = READ_LEN
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 4, size=(4096, pad), dtype=np.uint8)
    idx = rng.integers(0, pool.shape[0], size=(GROUP, BATCH))
    batches = jnp.asarray(pool[idx])
    lengths = jnp.asarray(np.full((GROUP, BATCH), READ_LEN, np.int32))
    valid = jnp.asarray(np.ones((GROUP, BATCH // 2), bool))
    table = BucketTable(K, chunk=chunk)
    step = BatchStep(table, k=K, depth_per_shard=50, coverage=0.9,
                     canonical=False, paired=True, mode=mode)
    state = table.init()
    for _ in range(2):
        state, keep, stats, _ = step.step_many(state, batches, lengths, valid)
    _sync(keep)
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, keep, stats, _ = step.step_many(
                state, batches, lengths, valid)
        _sync(keep)
        best = min(best, time.perf_counter() - t0)
    rps = BATCH * GROUP * ITERS / best
    ms = best / (GROUP * ITERS) * 1e3
    print(f"chunk={chunk:6d} mode={mode:7s}: {ms:.2f} ms/batch "
          f"{rps/1e6:.3f}M reads/s", flush=True)
    return rps


if __name__ == "__main__":
    for mode in ("exact", "relaxed"):
        for chunk in (16384, 32768, 65536):
            bench(chunk, mode)
