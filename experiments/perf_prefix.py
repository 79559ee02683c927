"""Incremental-composite breakdown of preprocessing: each variant runs the
pipeline up to stage i; deltas give true in-context stage costs (standalone
per-stage timings overstate dispatch/transfer overhead)."""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nomalise_kmers_multi_large_tpu.ops.codec import (
    encode_windows_canonical, window_validity,
)
from nomalise_kmers_multi_large_tpu.ops.mix import mix32
from nomalise_kmers_multi_large_tpu.ops.segscan import BLOCK, rank_cand_scan

K = 15
READS = 16384
PAD = 150
W = PAD - K + 1
CHUNK = 16384
_SENT = jnp.uint32(0xFFFFFFFF)


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


@partial(jax.jit, static_argnums=(2,))
def upto(bases, lengths, stage):
    from nomalise_kmers_multi_large_tpu.ops.encode_kernel import encode_mixed
    from nomalise_kmers_multi_large_tpu.ops.mix import mix32_np
    m2 = encode_mixed(bases, K, False)
    mix0 = int(mix32_np(np.zeros(1, np.uint32), 2 * K)[0])
    win = jax.lax.broadcasted_iota(jnp.int32, m2.shape, 1)
    in_read = win <= (lengths[:, None].astype(jnp.int32) - K)
    validw = in_read & (m2 != mix0)
    mixed = jax.lax.bitcast_convert_type(m2, jnp.uint32).reshape(-1)
    valid = validw
    n = mixed.shape[0]
    if stage == 0:
        return mixed
    quantum = max(CHUNK, BLOCK)
    npad = -(-n // quantum) * quantum
    key = jnp.where(valid.reshape(n), mixed, _SENT)
    key = jnp.concatenate([key, jnp.full((npad - n,), _SENT, jnp.uint32)])
    if stage == 1:
        return key
    pos = jnp.arange(npad, dtype=jnp.int32)
    skey, src = jax.lax.sort((key, pos), num_keys=1, is_stable=True)
    if stage == 2:
        return skey
    p2, p3 = rank_cand_scan(skey, src, fp_bits=2 * K - 14, w=W, n_reads=READS)
    return p2


def main():
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 4, size=(4096, PAD), dtype=np.uint8)
    bases = jnp.asarray(pool[rng.integers(0, 4096, size=READS)])
    lengths = jnp.full((READS,), PAD, jnp.int32)
    names = ["encode+mix", "+key/pad", "+sort", "+segscan"]
    prev = 0.0
    for stage in range(4):
        t = timeit(upto, bases, lengths, stage)
        print(f"{names[stage]:12s} cum {t*1e3:7.2f} ms   delta {(t-prev)*1e3:6.2f} ms")
        prev = t


if __name__ == "__main__":
    main()
