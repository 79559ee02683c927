"""Round-3 in-graph sort variants at bench shape (N = 16384*136 = 2.23M).

All variants timed INSIDE one jit with a trivial consumer, 32 back-to-back
dispatches per timed round (CLAUDE.md measurement methodology). Questions:
  - does operand dtype change XLA TPU sort cost (u32 vs i32 vs f32-bitcast)?
  - 1-key floor (loses rid, lower bound only)
  - u16 / packed variants (re-check in-graph; standalone said no)
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


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    key_np = rng.integers(0, 1 << 30, size=N, dtype=np.int64).astype(np.uint32)
    key = jnp.asarray(key_np)
    rid = jnp.asarray(
        (np.arange(N, dtype=np.int64) // W).astype(np.int32))

    @jax.jit
    def s2_u32_i32(k, r):
        sk, sr = jax.lax.sort((k, r), num_keys=2, is_stable=False)
        return sk[0] + jnp.uint32(sr[0])

    @jax.jit
    def s2_i32_i32(k, r):
        ki = jax.lax.bitcast_convert_type(k, jnp.int32)
        sk, sr = jax.lax.sort((ki, r), num_keys=2, is_stable=False)
        return sk[0] + sr[0]

    @jax.jit
    def s2_f32_i32(k, r):
        # keys < 2^30 bitcast to f32 are positive finite floats whose IEEE
        # order equals the integer order of their bit patterns
        kf = jax.lax.bitcast_convert_type(k, jnp.float32)
        sk, sr = jax.lax.sort((kf, r), num_keys=2, is_stable=False)
        return jax.lax.bitcast_convert_type(sk, jnp.uint32)[0] + jnp.uint32(sr[0])

    @jax.jit
    def s2_f32_f32(k, r):
        kf = jax.lax.bitcast_convert_type(k, jnp.float32)
        rf = jax.lax.bitcast_convert_type(r, jnp.float32)  # rid >= 0: same trick
        sk, sr = jax.lax.sort((kf, rf), num_keys=2, is_stable=False)
        return (jax.lax.bitcast_convert_type(sk, jnp.uint32)[0]
                + jax.lax.bitcast_convert_type(sr, jnp.uint32)[0])

    @jax.jit
    def s1_u32(k, r):
        (sk,) = jax.lax.sort((k,), num_keys=1, is_stable=False)
        return sk[0] + jnp.uint32(r[0])

    @jax.jit
    def s1_f32(k, r):
        kf = jax.lax.bitcast_convert_type(k, jnp.float32)
        (sk,) = jax.lax.sort((kf,), num_keys=1, is_stable=False)
        return jax.lax.bitcast_convert_type(sk, jnp.uint32)[0] + jnp.uint32(r[0])

    @jax.jit
    def s2_stable1key(k, r):
        sk, sr = jax.lax.sort((k, r), num_keys=1, is_stable=True)
        return sk[0] + jnp.uint32(sr[0])

    @jax.jit
    def s2_u32_u16(k, r):
        r16 = (r & 0x3FFF).astype(jnp.uint16)
        sk, sr = jax.lax.sort((k, r16), num_keys=2, is_stable=False)
        return sk[0] + jnp.uint32(sr[0])

    for name, fn in [
        ("2-key (u32,i32) unstable [current]", s2_u32_i32),
        ("2-key (i32,i32) unstable", s2_i32_i32),
        ("2-key (f32,i32) unstable", s2_f32_i32),
        ("2-key (f32,f32) unstable", s2_f32_f32),
        ("1-key u32 (floor, no rid)", s1_u32),
        ("1-key f32 (floor, no rid)", s1_f32),
        ("1-key stable + payload", s2_stable1key),
        ("2-key (u32,u16) unstable", s2_u32_u16),
    ]:
        t = timeit(fn, key, rid)
        print(f"{name:38s} {t*1e3:7.3f} ms  ({t/N*1e9:.2f} ns/el)")


if __name__ == "__main__":
    main()
