"""Prototype: in-VMEM bitonic block sort of (key uint32, rid int32) pairs.

Phase 1 of the Pallas sort design (docs/SORT_DESIGN.md Option A): grid over
blocks of BS elements; each block laid out (BS/2048, 2048) in VMEM and sorted
by a bitonic network — lane-dim butterflies for strides < 2048, sublane-dim
butterflies above. Measures ns/element vs the XLA lax.sort baseline.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 2048


def _butterfly(x, s: int, rows: int):
    """Partner values at index i ^ s for a (rows, LANE) block."""
    if s < LANE:
        up = pltpu.roll(x, s, 1)        # up[i] = x[i - s]
        dn = pltpu.roll(x, LANE - s, 1)  # dn[i] = x[i + s]
    else:
        r = s // LANE
        up = pltpu.roll(x, r, 0)
        dn = pltpu.roll(x, rows - r, 0)
    return up, dn


def _sort_kernel(bs: int, key_ref, rid_ref, okey_ref, orid_ref):
    rows = bs // LANE
    k = key_ref[:]
    r = rid_ref[:]
    li = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    si = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
    gidx = si * LANE + li
    nbits = bs.bit_length() - 1
    for j in range(1, nbits + 1):
        m = 1 << j
        desc = (gidx & m) != 0   # final pass: m == bs > any gidx -> all ascending
        for e in range(j - 1, -1, -1):
            s = 1 << e
            bit = (gidx & s) != 0
            ku, kd = _butterfly(k, s, rows)
            ru, rd = _butterfly(r, s, rows)
            pk = jnp.where(bit, ku, kd)
            pr = jnp.where(bit, ru, rd)
            kuu = pltpu.bitcast(k, jnp.uint32)
            pku = pltpu.bitcast(pk, jnp.uint32)
            lower = (pku < kuu) | ((pku == kuu) & (pr < r))
            take = lower ^ bit ^ desc
            k = jnp.where(take, pk, k)
            r = jnp.where(take, pr, r)
    okey_ref[:] = k
    orid_ref[:] = r


def block_sort(key, rid, bs: int, interpret: bool = False):
    n = key.shape[0]
    assert n % bs == 0
    rows = bs // LANE
    k2 = jax.lax.bitcast_convert_type(key, jnp.int32).reshape(-1, LANE)
    r2 = rid.reshape(-1, LANE)
    spec = pl.BlockSpec((rows, LANE), lambda g: (g, 0),
                        memory_space=pltpu.VMEM)
    ok, orid = pl.pallas_call(
        partial(_sort_kernel, bs),
        grid=(n // bs,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((n // LANE, LANE), jnp.int32)] * 2,
        interpret=interpret,
    )(k2, r2)
    return (jax.lax.bitcast_convert_type(ok.reshape(n), jnp.uint32),
            orid.reshape(n))


def main():
    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    n = 2_359_296 if not interpret else 65536
    npad = n
    key = rng.integers(0, 1 << 30, size=npad, dtype=np.uint32)
    rid = (np.arange(npad) // 136).astype(np.int32)

    for bs in ([65536, 32768, 131072] if not interpret else [65536]):
        if npad % bs:
            continue
        kd, rd = jnp.asarray(key), jnp.asarray(rid)
        f = jax.jit(partial(block_sort, bs=bs, interpret=interpret))
        ok, orid = f(kd, rd)
        # correctness: every block sorted by (key, rid)
        okn, orn = np.asarray(ok), np.asarray(orid)
        for b in range(0, npad, bs):
            kk, rr = okn[b:b + bs], orn[b:b + bs]
            packed = (kk.astype(np.uint64) << np.uint64(32)) | rr.astype(np.uint64)
            want = np.sort((key[b:b + bs].astype(np.uint64) << np.uint64(32))
                           | rid[b:b + bs].astype(np.uint64))
            assert np.array_equal(packed, want), f"block {b//bs} wrong"
        print(f"bs={bs}: correct")
        if interpret:
            continue
        # timing
        def sync(x):
            np.asarray(jax.device_get(x[0].ravel()[0:1]))
        for _ in range(2):
            out = f(kd, rd)
        sync(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(8):
                out = f(kd, rd)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 8)
        print(f"bs={bs}: {best*1e3:.2f} ms  ({best/npad*1e9:.3f} ns/el)")

    if not interpret:
        # XLA baseline
        kd, rd = jnp.asarray(key), jnp.asarray(rid)
        g = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2,
                                              is_stable=False))
        out = g(kd, rd)
        np.asarray(jax.device_get(out[0].ravel()[0:1]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                out = g(kd, rd)
            np.asarray(jax.device_get(out[0].ravel()[0:1]))
            best = min(best, (time.perf_counter() - t0) / 4)
        print(f"lax.sort full: {best*1e3:.2f} ms ({best/npad*1e9:.3f} ns/el)")


if __name__ == "__main__":
    main()
