"""Why does the fused encode kernel cost 1.7 ms (should be ~0.1 ms)?

Times in-graph variants of ops/encode_kernel.py at bench shapes:
  A current encode_keys (uint8 in, W=136 unaligned out)
  B same kernel but output padded to full lp lanes (aligned stores)
  C int32 input (no uint8 load)
  D both
  E roll-free: precompute k shifted COPIES via XLA slicing, kernel only ORs
Each wrapped in a sum-reduction so outputs are consumed identically.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nomalise_kmers_multi_large_tpu.ops.encode_kernel import (
    _SENT, _mix_inline, encode_keys,
)
from nomalise_kmers_multi_large_tpu.ops.mix import mix32_np

K = 15
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


def _kernel_var(k, w, lp, mix0, full_out, b_ref, key_ref, valid_ref):
    b = b_ref[:].astype(jnp.int32)
    fwd = jnp.zeros_like(b)
    for j in range(k):
        col = b if j == 0 else pltpu.roll(b, lp - j, 1)
        fwd = fwd | (col << (2 * (k - 1 - j)))
    mixed = _mix_inline(fwd, 2 * k)
    length = b[:, lp - 2:lp - 1] * 256 + b[:, lp - 1:lp]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    valid = (w_iota <= (length - k)) & (mixed != mix0)
    if full_out:
        key_ref[:] = jnp.where(valid, mixed, _SENT)
        valid_ref[:] = jnp.where(valid, 1, 0)
    else:
        key_ref[:] = jnp.where(valid, mixed, _SENT)[:, :w]
        valid_ref[:] = jnp.where(valid, 1, 0)[:, :w]


def make_variant(full_out: bool, in_dtype, br=512):
    lp = 256
    mix0 = int(mix32_np(np.zeros(1, np.uint32), 2 * K)[0])
    wout = lp if full_out else W

    @jax.jit
    def run(padded):
        x = padded.astype(in_dtype)
        key, valid = pl.pallas_call(
            partial(_kernel_var, K, W, lp, mix0, full_out),
            grid=(READS // br,),
            in_specs=[pl.BlockSpec((br, lp), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((br, wout), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, wout), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((READS, wout), jnp.int32),
                jax.ShapeDtypeStruct((READS, wout), jnp.int32),
            ],
        )(x)
        return jnp.sum(key, dtype=jnp.int32) + jnp.sum(valid)

    return run


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    bases = rng.integers(0, 4, size=(READS, PAD), dtype=np.uint8)
    lengths = np.full((READS,), PAD, np.int32)
    bases_d = jnp.asarray(bases)
    lengths_d = jnp.asarray(lengths)

    @jax.jit
    def current(b, ln):
        key = encode_keys(b, ln, K, False)
        return jnp.sum(jax.lax.bitcast_convert_type(key, jnp.int32),
                       dtype=jnp.int32)

    t = timeit(current, bases_d, lengths_d)
    print(f"A current encode_keys              {t*1e3:7.2f} ms")

    # pre-padded input (build once, outside timing)
    lp = 256
    lens = np.clip(lengths, 0, 1023).astype(np.int32)
    padded = np.concatenate(
        [bases, np.zeros((READS, lp - PAD - 2), np.uint8),
         (lens[:, None] >> 8).astype(np.uint8),
         (lens[:, None] & 255).astype(np.uint8)], axis=1)
    padded_u8 = jnp.asarray(padded)
    padded_i32 = jnp.asarray(padded.astype(np.int32))

    for label, full_out, arr, dt in [
        ("B kernel u8-in, W=136 out      ", False, padded_u8, jnp.uint8),
        ("C kernel u8-in, 256-lane out   ", True, padded_u8, jnp.uint8),
        ("D kernel i32-in, W=136 out     ", False, padded_i32, jnp.int32),
        ("E kernel i32-in, 256-lane out  ", True, padded_i32, jnp.int32),
    ]:
        run = make_variant(full_out, dt)
        try:
            t = timeit(run, arr)
            print(f"{label}   {t*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label}   FAILED {type(e).__name__}", flush=True)

    for br in (128, 256, 1024):
        run = make_variant(True, jnp.int32, br=br)
        try:
            t = timeit(run, padded_i32)
            print(f"F i32-in 256-out block={br:5d}     {t*1e3:7.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"F block={br}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()


# ---- log-doubling roll variant -------------------------------------------

def _kernel_ld(k, w, lp, mix0, b_ref, key_ref, valid_ref):
    b = b_ref[:].astype(jnp.int32)
    # doubling stages: c[m][i] = code of m consecutive bases starting at i
    stages = {1: b}
    m = 1
    while m * 2 <= k:
        c = stages[m]
        stages[m * 2] = (c << (2 * m)) | pltpu.roll(c, lp - m, 1)
        m *= 2
    # compose k from binary decomposition, rolling accumulated offset
    fwd = None
    off = 0
    rem = k
    mm = m
    while rem:
        if rem >= mm:
            part = stages[mm] if off == 0 else pltpu.roll(
                stages[mm], lp - off, 1)
            fwd = part if fwd is None else (fwd << (2 * mm)) | part
            off += mm
            rem -= mm
        mm //= 2
    mixed = _mix_inline(fwd, 2 * k)
    length = b[:, lp - 2:lp - 1] * 256 + b[:, lp - 1:lp]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    valid = (w_iota <= (length - k)) & (mixed != mix0)
    key_ref[:] = jnp.where(valid, mixed, _SENT)[:, :w]
    valid_ref[:] = jnp.where(valid, 1, 0)[:, :w]


def run_ld(padded_u8, br=512):
    lp = 256
    mix0 = int(mix32_np(np.zeros(1, np.uint32), 2 * K)[0])

    @jax.jit
    def run(padded):
        key, valid = pl.pallas_call(
            partial(_kernel_ld, K, W, lp, mix0),
            grid=(READS // br,),
            in_specs=[pl.BlockSpec((br, lp), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((br, W), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((br, W), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((READS, W), jnp.int32),
                jax.ShapeDtypeStruct((READS, W), jnp.int32),
            ],
        )(padded)
        return jnp.sum(key, dtype=jnp.int32) + jnp.sum(valid)

    return run


def main_ld():
    rng = np.random.default_rng(0)
    bases = rng.integers(0, 4, size=(READS, PAD), dtype=np.uint8)
    lengths = np.full((READS,), PAD, np.int32)
    lp = 256
    lens = np.clip(lengths, 0, 1023).astype(np.int32)
    padded = np.concatenate(
        [bases, np.zeros((READS, lp - PAD - 2), np.uint8),
         (lens[:, None] >> 8).astype(np.uint8),
         (lens[:, None] & 255).astype(np.uint8)], axis=1)
    padded_u8 = jnp.asarray(padded)
    run = run_ld(padded_u8)
    # correctness vs current
    ref_key = jax.jit(
        lambda b, ln: encode_keys(b, ln, K, False))(
        jnp.asarray(bases), jnp.asarray(lengths))
    got = jnp.sum(jax.lax.bitcast_convert_type(ref_key, jnp.int32),
                  dtype=jnp.int32) + jnp.sum(
        (ref_key != jnp.uint32(0xFFFFFFFF)).astype(jnp.int32))
    mine = run(padded_u8)
    print("LD checksum match:", bool(np.asarray(got) == np.asarray(mine)))
    t = timeit(run, padded_u8)
    print(f"G log-doubling u8-in W-out         {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main_ld()
