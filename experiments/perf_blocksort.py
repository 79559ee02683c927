"""How does XLA TPU sort scale with batched row-sorts vs one flat sort?

If sorting (G, N/G) rows independently is much cheaper per element than one
N-element sort, a partition pipeline can use XLA row-sorts as its block-sort
phase (blocks = rows), avoiding a hand-written bitonic kernel entirely.
Also times: u32 single-plane sort (no payload) as a lower bound, and 2-plane
stable (key + payload) which is what the pipeline needs.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 16384 * 136  # bench windows per batch = 2,228,224


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


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32))

    for rows in [1, 4, 9, 17, 34, 68, 136, 272, 544]:
        cols = N // rows
        if rows * cols != N:
            continue
        k2 = keys[: rows * cols].reshape(rows, cols)
        pay = jnp.broadcast_to(
            jnp.arange(cols, dtype=jnp.int32)[None, :], (rows, cols))

        @jax.jit
        def sort1(k):
            return jax.lax.sort((k,), num_keys=1, is_stable=False)[0]

        @jax.jit
        def sort2(k, p):
            return jax.lax.sort((k, p), num_keys=1, is_stable=True)

        t1 = timeit(sort1, k2)
        t2 = timeit(sort2, k2, pay)
        print(f"rows={rows:4d} cols={cols:7d}  "
              f"key-only {t1*1e3:7.2f} ms ({t1/N*1e9:5.2f} ns/el)   "
              f"stable+payload {t2*1e3:7.2f} ms ({t2/N*1e9:5.2f} ns/el)")


if __name__ == "__main__":
    main()
