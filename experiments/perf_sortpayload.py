"""Sort-payload micro-opts + int8 MXU feasibility.

1. 1-key stable sort cost vs payload width: i32 pos (current) / u16 rid /
   i8. If XLA charges per payload byte, rid-u16 saves ~25% of the sort.
   (Read-level exactness allows rid-payload: which same-code copy inside one
   read gets the 'high' bit never changes the read's tally.)
2. int8 x int8 -> int32 matmul on the MXU via dot_general preferred int32 —
   does it lower, and at what speed vs bf16?
"""
from __future__ import annotations

import time
from functools import partial

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
    # realistic duplicated keys (pool structure like the bench)
    pool = rng.integers(0, 1 << 30, size=557056, dtype=np.uint32)
    keys = jnp.asarray(pool[rng.integers(0, pool.shape[0], size=N)])
    pos32 = jnp.arange(N, dtype=jnp.int32)
    rid16 = (jnp.arange(N, dtype=jnp.int32) // W).astype(jnp.uint16)
    rid8 = jnp.zeros((N,), jnp.int8)

    for name, payload in [("pos i32", pos32), ("rid u16", rid16),
                          ("pad i8", rid8)]:
        f = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1,
                                              is_stable=True))
        t = timeit(f, keys, payload)
        print(f"sort 1-key stable + {name:8s} {t*1e3:7.2f} ms "
              f"({t/N*1e9:5.2f} ns/el)")

    # key-only for reference
    f0 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False)[0])
    t0 = timeit(f0, keys)
    print(f"sort key-only unstable        {t0*1e3:7.2f} ms ({t0/N*1e9:5.2f} ns/el)")

    # ---- int8 MXU ----
    R, P, E = 128, 512, 2048
    a8 = jnp.asarray(rng.integers(0, 2, size=(R, P), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(0, 2, size=(R, E), dtype=np.int8))
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)

    mm8 = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    mmb = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))

    reps = 1088  # one bench batch worth of gather matmuls
    big_a8 = jnp.broadcast_to(a8[None], (reps, R, P))
    big_b8 = jnp.broadcast_to(b8[None], (reps, R, E))
    big_abf = jnp.broadcast_to(abf[None], (reps, R, P))
    big_bbf = jnp.broadcast_to(bbf[None], (reps, R, E))

    mm8v = jax.jit(lambda a, b: jax.vmap(
        lambda x, y: jax.lax.dot_general(
            x, y, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))(a, b))
    mmbv = jax.jit(lambda a, b: jax.vmap(
        lambda x, y: jax.lax.dot_general(
            x, y, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))(a, b))

    try:
        t8 = timeit(mm8v, big_a8, big_b8, iters=5)
        macs = reps * R * P * E
        print(f"int8 matmul batch  {t8*1e3:7.2f} ms  {macs/t8/1e12:6.1f} TMAC/s")
    except Exception as e:  # noqa: BLE001
        print("int8 matmul failed:", type(e).__name__, str(e)[:200])
    tb = timeit(mmbv, big_abf, big_bbf, iters=5)
    macs = reps * R * P * E
    print(f"bf16 matmul batch  {tb*1e3:7.2f} ms  {macs/tb/1e12:6.1f} TMAC/s")


if __name__ == "__main__":
    main()
