"""Sort variants + chunk sweep: find cheaper orderings for the bucket step.

Variants:
  2key     current: lax.sort((key, pos), num_keys=2)
  1key     stable single-key sort carrying pos as payload (same result:
           stability gives stream order within equal keys)
  argsort  jnp.argsort stable
  u64      single u64 key with pos packed in low bits
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 16384 * 136
_SENT = jnp.uint32(0xFFFFFFFF)


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


@jax.jit
def s2(key, pos):
    return jax.lax.sort((key, pos), num_keys=2)


@jax.jit
def s1(key, pos):
    return jax.lax.sort((key, pos), num_keys=1, is_stable=True)


@jax.jit
def s1u(key, pos):
    return jax.lax.sort((key, pos), num_keys=1, is_stable=False)


@jax.jit
def su64(key, pos):
    k64 = (key.astype(jnp.uint64) << jnp.uint64(22)) | pos.astype(jnp.uint64)
    sk = jax.lax.sort(k64)
    return (sk >> jnp.uint64(22)).astype(jnp.uint32), \
        (sk & jnp.uint64(0x3FFFFF)).astype(jnp.int32)


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32))
    pos = jnp.arange(N, dtype=jnp.int32)

    a = s2(key, pos)
    b = s1(key, pos)
    same = bool(jnp.all(a[0] == b[0]) & jnp.all(a[1] == b[1]))
    print("1key-stable == 2key:", same)

    for name, fn in [("2key", s2), ("1key-stable", s1),
                     ("1key-unstable", s1u), ("u64-packed", su64)]:
        t = timeit(fn, key, pos)
        print(f"{name:14s} {t*1e3:8.2f} ms   {t/N*1e9:5.2f} ns/elem")


if __name__ == "__main__":
    main()
