"""Can the pipeline sort run key-only?

Exactness argument: read-level tallies are invariant to which same-code copy
WITHIN one read takes a given rank, so ordering by (code, rid) — rid = read
id — reproduces reference read decisions exactly. Then rid can live IN the
key: u64 = code30 << 16 | rid16, sorted key-only unstable. Compare against
the current 1-key-stable + i32 payload.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 16384 * 136
W = 136


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
    pool = rng.integers(0, 1 << 30, size=557056, dtype=np.uint32)
    keys = jnp.asarray(pool[rng.integers(0, pool.shape[0], size=N)])
    pos32 = jnp.arange(N, dtype=jnp.int32)
    rid32 = (jnp.arange(N, dtype=jnp.int32) // W).astype(jnp.uint32)

    f_cur = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1,
                                              is_stable=True))
    print(f"current (1-key stable + pos) {timeit(f_cur, keys, pos32)*1e3:7.2f} ms")

    f_2u = jax.jit(lambda k, r: jax.lax.sort((k, r), num_keys=2,
                                             is_stable=False))
    print(f"2-key (code,rid) unstable    {timeit(f_2u, keys, rid32)*1e3:7.2f} ms")

    def mk64(k, r):
        return (k.astype(jnp.uint64) << jnp.uint64(16)) | r.astype(jnp.uint64)

    key64 = jax.jit(mk64)(keys, rid32.astype(jnp.uint16).astype(jnp.uint32))
    f_64 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False)[0])
    print(f"u64 key-only unstable        {timeit(f_64, key64)*1e3:7.2f} ms")

    # fused: build u64 + sort + unpack, honest end-to-end replacement cost
    @jax.jit
    def full64(k, r):
        k64 = mk64(k, r)
        s = jax.lax.sort((k64,), num_keys=1, is_stable=False)[0]
        code = (s >> jnp.uint64(16)).astype(jnp.uint32)
        rid = (s & jnp.uint64(0xFFFF)).astype(jnp.int32)
        return code, rid

    print(f"u64 fused pack+sort+unpack   {timeit(full64, keys, rid32)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
