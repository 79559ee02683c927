"""Ablate the bucket kernel: measure cumulative cost of each in-kernel stage.

Levels (cumulative):
  0 load p1/p2/p3 + A one-hot + dummy write
  1 + gather matmul (planes prep + (E,128)@(128,512))
  2 + match + merged is_match/prior reduction
  3 + delta update matmul (A^T @ B_upd) + flush
  4 + recsum (Ar, Br construction + matmul)
  5 full kernel minus insert path (steady state)
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nomalise_kmers_multi_large_tpu.ops.bucket_kernel import LANES
from nomalise_kmers_multi_large_tpu.ops.codec import (
    encode_windows_canonical, window_validity,
)
from nomalise_kmers_multi_large_tpu.ops.mix import mix32
from nomalise_kmers_multi_large_tpu.ops.segscan import BLOCK, rank_cand_scan

K = 15
ROWS = 16384
READS = 16384
PAD = 150
CHUNK = 2048
W = PAD - K + 1
TR = 128
_SENT = jnp.uint32(0xFFFFFFFF)
FP_BITS = 2 * K - 14


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def timeit(fn, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def _onehot(cond):
    return jnp.where(cond, 1.0, 0.0).astype(jnp.bfloat16)


def _kernel(level, step_tile, step_chunk, step_active, seed_ref,
            p1_ref, p2_ref, p3_ref, fp_in_ref, cnt_in_ref,
            fp_out_ref, cnt_out_ref, recsum_ref, stats_ref, delta_ref):
    s = pl.program_id(0)
    nsteps = pl.num_programs(0)
    tile = step_tile[s]
    active = step_active[s] != 0
    prev_tile = step_tile[jnp.maximum(s - 1, 0)]
    next_tile = step_tile[jnp.minimum(s + 1, nsteps - 1)]
    is_first = jnp.logical_or(s == 0, prev_tile != tile)
    is_last = jnp.logical_or(s == nsteps - 1, next_tile != tile)

    @pl.when(s == 0)
    def _():
        recsum_ref[:] = jnp.zeros_like(recsum_ref)
        stats_ref[:] = jnp.zeros_like(stats_ref)

    @pl.when(jnp.logical_and(is_first, active))
    def _():
        fp_out_ref[:] = fp_in_ref[:]
        cnt_out_ref[:] = cnt_in_ref[:]
        delta_ref[:] = jnp.zeros_like(delta_ref)

    if level == -1:
        stats_ref[:] += jnp.ones((8, 128), jnp.float32)
        return

    E = CHUNK
    R = TR
    fmask = jnp.int32((1 << FP_BITS) - 1)
    p1 = p1_ref[:]
    p2 = pltpu.bitcast(p2_ref[:], jnp.uint32)
    mixed = p1
    grow = jax.lax.shift_right_logical(pltpu.bitcast(p1, jnp.uint32),
                                       jnp.uint32(FP_BITS)).astype(jnp.int32)
    tile_eff = jnp.where(active, tile, -2)
    lrow = grow - tile_eff * R
    fpv1 = jnp.bitwise_and(mixed, fmask) + 1
    rank = jnp.bitwise_and(p2, jnp.uint32(0xFFFF)).astype(jnp.int32)
    rid = jax.lax.shift_right_logical(p2, jnp.uint32(16)).astype(jnp.int32)
    valid = (mixed >= 0) & (lrow >= 0) & (lrow < R)

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (E, R), 1)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (E, LANES), 1)
    A = _onehot(lrow == r_iota)

    mm = partial(jax.lax.dot_general, preferred_element_type=jnp.float32)
    mm_nt = lambda a, b: mm(a, b, (((1,), (0,)), ((), ())))
    mm_tn = lambda a, b: mm(a, b, (((0,), (0,)), ((), ())))

    if level == 0:
        stats_ref[:] += jnp.sum(A).astype(jnp.float32) * jnp.ones((8, 128), jnp.float32)
        return

    fpt = fp_out_ref[:]
    cntt = jnp.minimum(cnt_out_ref[:], 65535)
    planes = jnp.concatenate(
        [(fpt >> 8).astype(jnp.bfloat16), (fpt & 255).astype(jnp.bfloat16),
         (cntt >> 8).astype(jnp.bfloat16), (cntt & 255).astype(jnp.bfloat16)],
        axis=1)
    rows = mm_nt(A, planes)
    row_fp = rows[:, 0:LANES] * 256.0 + rows[:, LANES:2 * LANES]
    row_cnt = rows[:, 2 * LANES:3 * LANES] * 256.0 + rows[:, 3 * LANES:]
    if level == 1:
        stats_ref[:] += jnp.sum(row_fp).astype(jnp.float32) * jnp.ones((8, 128), jnp.float32)
        return

    fpv1_f = fpv1.astype(jnp.float32)
    match = (row_fp == fpv1_f).astype(jnp.float32)
    mboth = jnp.sum(match * (row_cnt + 131072.0), axis=1, keepdims=True)
    is_match = jnp.where(mboth >= 131072.0, 1.0, 0.0)
    prior = mboth - is_match * 131072.0
    if level == 2:
        stats_ref[:] += jnp.sum(prior) * jnp.ones((8, 128), jnp.float32)
        return

    B_upd = match.astype(jnp.bfloat16)
    delta_ref[:] += mm_tn(A, B_upd)

    @pl.when(is_last)
    def _():
        cnt_out_ref[:] = cnt_out_ref[:] + delta_ref[:].astype(jnp.int32)
        delta_ref[:] = jnp.zeros_like(delta_ref)

    if level == 3:
        return

    observed = prior + jnp.minimum(rank, 65535).astype(jnp.float32)
    high = _onehot((observed >= 50.0) & valid)
    rrow = jax.lax.shift_right_logical(rid, 7)
    rcol = jnp.bitwise_and(rid, 127)
    rr_iota = jax.lax.broadcasted_iota(jnp.int32, (E, 128), 1)
    Ar = _onehot(rrow == rr_iota)
    Br = _onehot(rcol == l_iota)
    recsum_ref[:] += jax.lax.dot_general(
        Ar * high, Br, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def build(level):
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(fp, counts, bases, lengths):
        hi, lo = encode_windows_canonical(bases, K, False)
        valid = window_validity(lengths, hi, lo, K)
        n = lo.shape[0] * lo.shape[1]
        mixed = mix32(lo.reshape(n), 2 * K)
        quantum = max(CHUNK, BLOCK)
        npad = -(-n // quantum) * quantum
        key = jnp.where(valid.reshape(n), mixed, _SENT)
        key = jnp.concatenate([key, jnp.full((npad - n,), _SENT, jnp.uint32)])
        pos = jnp.arange(npad, dtype=jnp.int32)
        skey, src = jax.lax.sort((key, pos), num_keys=1, is_stable=True)
        p2f, p3f = rank_cand_scan(skey, src, fp_bits=FP_BITS, w=W,
                                  n_reads=READS)
        p1 = jax.lax.bitcast_convert_type(skey, jnp.int32)[:, None]
        p2 = p2f[:, None]
        p3 = p3f[:, None]
        n_tiles = ROWS // TR
        n_chunks = npad // CHUNK
        n_steps = n_chunks + n_tiles
        elem_tile = jnp.minimum(
            jax.lax.shift_right_logical(skey, jnp.uint32(FP_BITS + 7)),
            jnp.uint32(n_tiles)).astype(jnp.int32)
        first_t = elem_tile[0::CHUNK]
        last_t = elem_tile[CHUNK - 1::CHUNK]
        span = jnp.where(first_t < n_tiles,
                         jnp.minimum(last_t, n_tiles - 1) - first_t + 1, 0)
        span = span.at[0].set(jnp.maximum(span[0], 1))
        first_t = first_t.at[0].set(jnp.minimum(first_t[0], n_tiles - 1))
        cum = jnp.cumsum(span) - span
        n_real = cum[-1] + span[-1]
        s_iota = jnp.arange(n_steps, dtype=jnp.int32)
        le = (cum[None, :] <= s_iota[:, None]) & (span[None, :] > 0)
        step_chunkv = jnp.max(
            jnp.where(le, jnp.arange(n_chunks, dtype=jnp.int32)[None, :], -1),
            axis=1)
        step_chunkv = jnp.maximum(step_chunkv, 0)
        step_tilev = first_t[step_chunkv] + (s_iota - cum[step_chunkv])
        active = s_iota < n_real
        last_tile = step_tilev[jnp.maximum(n_real - 1, 0)]
        last_chunk = step_chunkv[jnp.maximum(n_real - 1, 0)]
        step_tilev = jnp.where(active, step_tilev, last_tile)
        step_chunkv = jnp.where(active, step_chunkv, last_chunk)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((CHUNK, 1), lambda s, st, sc, sa, sf: (sc[s], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, 1), lambda s, st, sc, sa, sf: (sc[s], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, 1), lambda s, st, sc, sa, sf: (sc[s], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, LANES), lambda s, st, sc, sa, sf: (st[s], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, LANES), lambda s, st, sc, sa, sf: (st[s], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TR, LANES), lambda s, st, sc, sa, sf: (st[s], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, LANES), lambda s, st, sc, sa, sf: (st[s], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, LANES), lambda s, st, sc, sa, sf: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda s, st, sc, sa, sf: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((TR, LANES), jnp.float32)],
        )
        outs = pl.pallas_call(
            partial(_kernel, level),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
                jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
                jax.ShapeDtypeStruct((128, LANES), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ],
            input_output_aliases={7: 0, 8: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(step_tilev, step_chunkv, active.astype(jnp.int32),
          jnp.zeros((1,), jnp.int32), p1, p2, p3, fp, counts)
        return outs

    return step


def main():
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 4, size=(4096, PAD), dtype=np.uint8)
    batches = [jnp.asarray(pool[rng.integers(0, 4096, size=READS)])
               for _ in range(4)]
    lengths = jnp.full((READS,), PAD, jnp.int32)
    it = [0]
    prev = None
    for level in (-1, 0, 1, 2, 3, 4):
        step = build(level)
        fp = jnp.zeros((ROWS, LANES), jnp.int32)
        counts = jnp.zeros((ROWS, LANES), jnp.int32)
        outs = step(fp, counts, batches[0], lengths)

        state = [outs]

        def run():
            o = state[0]
            state[0] = step(o[0], o[1], batches[it[0] % 4], lengths)
            it[0] += 1
            return state[0][3]

        t = timeit(run)
        d = "" if prev is None else f"  (+{(t-prev)*1e3:5.2f} ms)"
        print(f"level {level}: {t*1e3:7.2f} ms{d}")
        prev = t


if __name__ == "__main__":
    main()
