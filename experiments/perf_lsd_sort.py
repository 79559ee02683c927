"""Round-4: can two narrow 1-key passes (LSD radix style) beat the 2-key sort?

Exact mode needs the stream in (code, rid) order. LSD decomposition:
  pass 1: UNSTABLE 1-key sort by packed (code_low_b << 14 | rid)  [b+14 <= 32]
          with payload code_top (30-b bits). Unstable is safe: ties are
          (low_b, rid) collisions, separated by pass 2's key or genuinely
          interchangeable (same code, same read).
  pass 2: STABLE 1-key sort by code_top with payload packed1. Stability
          carries pass 1's (low_b, rid) order within equal code_top.
Result order = (code_top, code_low, rid) = (code, rid). Verified vs the
2-key sort below.

Worth it iff  t(pass1_unstable) + t(pass2_stable) + repack < t(2-key).
XLA TPU sort cost scales with operand count; stable sorts may pay an
internal iota tie-break operand — this measures exactly that.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

READS = 16384
W = 136
N = READS * W
RID_BITS = 14
B_LOW = 18  # low bits in pass 1 (b + 14 <= 32); top = 30 - b = 12


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


@jax.jit
def sort_2key(key, rid):
    return jax.lax.sort((key, rid), num_keys=2, is_stable=False)


@jax.jit
def sort_lsd(key, rid):
    low = key & jnp.uint32((1 << B_LOW) - 1)
    top = key >> jnp.uint32(B_LOW)
    p1 = (low << jnp.uint32(RID_BITS)) | rid.astype(jnp.uint32)
    sp1, stop = jax.lax.sort((p1, top), num_keys=1, is_stable=False)
    stop2, sp2 = jax.lax.sort((stop, sp1), num_keys=1, is_stable=True)
    skey = (stop2 << jnp.uint32(B_LOW)) | (sp2 >> jnp.uint32(RID_BITS))
    srid = (sp2 & jnp.uint32((1 << RID_BITS) - 1)).astype(jnp.int32)
    return skey, srid


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    # realistic duplication: draw codes from a 500k pool like the bench stream
    pool = rng.integers(0, 1 << 30, size=500_000, dtype=np.int64)
    key = jnp.asarray(pool[rng.integers(0, len(pool), N)].astype(np.uint32))
    rid = jnp.asarray((np.arange(N, dtype=np.int64) // W).astype(np.int32))

    k2, r2 = jax.jit(sort_2key)(key, rid)
    kl, rl = jax.jit(sort_lsd)(key, rid)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(kl))
    # rid may differ only within (code, rid)-duplicate groups; the pair
    # multiset must match exactly
    p2 = np.asarray(k2).astype(np.uint64) << 14 | np.asarray(r2).astype(np.uint64)
    pl = np.asarray(kl).astype(np.uint64) << 14 | np.asarray(rl).astype(np.uint64)
    np.testing.assert_array_equal(p2, pl)
    print("order parity: OK", flush=True)

    t2 = timeit(sort_2key, key, rid)
    tl = timeit(sort_lsd, key, rid)
    print(f"2-key unstable      {t2*1e3:7.3f} ms ({t2/N*1e9:.2f} ns/el)")
    print(f"LSD 2x1-key         {tl*1e3:7.3f} ms ({tl/N*1e9:.2f} ns/el)")


if __name__ == "__main__":
    main()
