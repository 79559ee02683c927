"""Two facts needed before the partition-kernel redesign:
1. per-dispatch overhead on the axon tunnel (empty jit roundtrip)
2. WARM bucket kernel cost alone: pre-sorted keyed input, table already
   populated (match-only steady state), sort+segscan excluded by feeding
   precomputed (skey-derived) inputs... we approximate by timing bucket_batch
   warm minus sort/segscan timed on identical input (same dispatch count).
Also: steady-state FULL step (table warm) vs cold (table empty) to see the
insert path's real cost.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nomalise_kmers_multi_large_tpu.ops.bucket_kernel import LANES, bucket_batch
from nomalise_kmers_multi_large_tpu.ops.encode_kernel import encode_keys

K = 15
ROWS = 16384
READS = 16384
PAD = 150
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
def empty(x):
    return x + 1


@partial(jax.jit, donate_argnums=(0, 1))
def warm_step(fp, counts, key2d):
    n = key2d.shape[0] * key2d.shape[1]
    out = bucket_batch(fp, counts, key2d.reshape(n), None,
                       k=K, rows=ROWS, depth=50, windows_per_read=W,
                       keyed=True)
    return out.fp, out.counts, out.high_per_read


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 4, size=(4096, PAD), dtype=np.uint8)
    idx = rng.integers(0, pool.shape[0], size=READS)
    bases = jnp.asarray(pool[idx])
    lengths = jnp.full((READS,), PAD, jnp.int32)
    n_windows = READS * W

    t_disp = timeit(empty, jnp.zeros((8, 128), jnp.float32), iters=50)
    print(f"dispatch roundtrip   {t_disp*1e3:8.3f} ms")

    key2d = jax.jit(lambda b, l: encode_keys(b, l, K, False))(bases, lengths)

    # steady state: run once to populate, then time with warm table
    fp = jnp.zeros((ROWS, LANES), jnp.int32)
    counts = jnp.zeros((ROWS, LANES), jnp.int32)
    fp, counts, _ = warm_step(fp, counts, key2d)

    state = [fp, counts]

    def run(key2d):
        f, c, h = warm_step(state[0], state[1], key2d)
        state[0], state[1] = f, c
        return h

    t_warm = timeit(run, key2d, iters=20)
    print(f"bucket_batch WARM    {t_warm*1e3:8.2f} ms  "
          f"{t_warm/n_windows*1e9:5.2f} ns/win  {READS/t_warm/1e3:7.0f}k reads/s")

    # cold: fresh empty table every call (insert path runs every step)
    def run_cold(key2d):
        f = jnp.zeros((ROWS, LANES), jnp.int32)
        c = jnp.zeros((ROWS, LANES), jnp.int32)
        return warm_step(f, c, key2d)

    t_cold = timeit(run_cold, key2d, iters=10)
    print(f"bucket_batch COLD    {t_cold*1e3:8.2f} ms  "
          f"{t_cold/n_windows*1e9:5.2f} ns/win")


if __name__ == "__main__":
    main()
