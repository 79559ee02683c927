"""Prototype: megablox-style bucket-table kernel shell.

Validates on the real chip:
  1. PrefetchScalarGridSpec with index_map driven by prefetched step arrays
  2. input_output_aliases for in-place HBM table state
  3. (CHUNK, 1) element blocks, lane broadcast, (E,128)@(128,128) matmuls
  4. end-to-end time for a 2.2M-element batch at representative compute

Compute here is a REPRESENTATIVE STAND-IN (correct histogram by (row, lane)
where lane = low 7 bits of fp — i.e. a sketch table without matching), so we
can check numerics against numpy while carrying the full matmul load of the
real kernel (8 matmuls/step).
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 4096
R = 128          # bucket rows per tile
LANES = 128


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def kernel(
    # scalar prefetch
    step_tile, step_active, seed_flag,
    # inputs
    smixed_ref, rank_ref, rid_ref, counts_in_ref,
    # outputs
    counts_out_ref, recsum_ref,
    # scratch
    delta_ref,
):
    s = pl.program_id(0)
    tile = step_tile[s]
    active = step_active[s]
    is_first = jnp.logical_or(s == 0, step_tile[jnp.maximum(s - 1, 0)] != tile)
    nsteps = pl.num_programs(0)
    is_last = jnp.logical_or(
        s == nsteps - 1, step_tile[jnp.minimum(s + 1, nsteps - 1)] != tile
    )

    @pl.when(jnp.logical_and(is_first, active))
    def _():
        delta_ref[:] = jnp.zeros_like(delta_ref)
        # out blocks are never loaded from HBM by pallas; seed the pristine
        # counts from the aliased input block at each tile's first visit
        counts_out_ref[:] = counts_in_ref[:]

    @pl.when(s == 0)
    def _():
        recsum_ref[:] = jnp.zeros_like(recsum_ref)

    smixed = smixed_ref[:]            # (CHUNK, 1) int32 (mixed code, sentinel<0)
    rank = rank_ref[:]                # (CHUNK, 1) int32
    rid = rid_ref[:]                  # (CHUNK, 1) int32

    # decompose: row = smixed >> 7 (tile-local after subtracting), lane = low 7
    grow = jax.lax.shift_right_logical(smixed, 7)
    lrow = grow - tile * R            # tile-local row
    lane = jnp.bitwise_and(smixed, 127)

    # tile membership matters: a chunk that straddles tiles is processed once
    # per tile, and every per-element output (recsum, later: keep flags) must
    # only fire in the element's own tile's step.
    valid = (smixed >= 0) & active & (lrow >= 0) & (lrow < R)

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, R), 1)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LANES), 1)

    A = jnp.where((lrow == r_iota) & valid, 1.0, 0.0).astype(jnp.bfloat16)
    B = jnp.where((lane == l_iota) & valid, 1.0, 0.0).astype(jnp.bfloat16)

    mm = partial(jax.lax.dot_general, preferred_element_type=jnp.float32)

    # gather side: ONE wide matmul (E,128)@(128,512) for all 4 limb planes
    # (real kernel: fp_hi, fp_lo, cnt_hi, cnt_lo)
    cnt = jnp.minimum(counts_out_ref[:], 65535)
    c_hi = (cnt >> 8).astype(jnp.bfloat16)
    c_lo = (cnt & 255).astype(jnp.bfloat16)
    planes = jnp.concatenate([c_hi, c_lo, c_lo, c_hi], axis=1)  # (128, 512)
    rows = mm(A, planes, (((1,), (0,)), ((), ())))              # (CHUNK, 512)
    row_cnt = rows[:, 0:128] * 256.0 + rows[:, 128:256]
    prior = jnp.sum(row_cnt * B.astype(jnp.float32), axis=1, keepdims=True)
    extra = jnp.sum(rows[:, 256:384] - rows[:, 384:512], axis=1, keepdims=True)

    observed = prior + jnp.minimum(rank, 65535).astype(jnp.float32) + 0.0 * extra
    high = jnp.where(valid & (observed >= 4.0), 1.0, 0.0).astype(jnp.float32)

    # scatter side: histogram delta += A^T @ B (masked by valid via A)
    dmul = jnp.where(seed_flag[0] == 0, 1.0, 0.0)
    delta_ref[:] += mm(A, B, (((0,), (0,)), ((), ()))) * dmul

    # rec aggregation: recsum[recrow, reccol] += high
    rrow = jax.lax.shift_right_logical(rid, 7)
    rcol = jnp.bitwise_and(rid, 127)
    Ar = jnp.where((rrow == r_iota) & valid, 1.0, 0.0).astype(jnp.bfloat16)
    Br = jnp.where((rcol == l_iota) & valid, 1.0, 0.0).astype(jnp.bfloat16)
    Arh = Ar * high.astype(jnp.bfloat16)
    recsum_ref[:] += mm(Arh, Br, (((0,), (0,)), ((), ())))

    # flush must NOT be gated on `active`: the final tile's last real step is
    # followed by inactive pad steps with the same tile index, so only the very
    # last pad step sees is_last. Pads contribute nothing (A is masked) and
    # delta is re-zeroed after each flush, so flushing on pads is a no-op add.
    @pl.when(is_last)
    def _():
        counts_out_ref[:] = counts_out_ref[:] + delta_ref[:].astype(jnp.int32)
        delta_ref[:] = jnp.zeros_like(delta_ref)


def run(T_rows: int, N: int, n_steps: int):
    n_tiles = T_rows // R
    n_chunks = N // CHUNK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((CHUNK, 1), lambda s, st, sa, sf: (sc_chunk(s, st, sa, sf), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 1), lambda s, st, sa, sf: (sc_chunk(s, st, sa, sf), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 1), lambda s, st, sa, sf: (sc_chunk(s, st, sa, sf), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda s, st, sa, sf: (st[s], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, LANES), lambda s, st, sa, sf: (st[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda s, st, sa, sf: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((R, LANES), jnp.float32)],
    )

    # step -> chunk mapping is ALSO a prefetch-derived value; we pass it merged
    # into step_tile's companion array instead. To keep index_map simple we use
    # a module-level trick: step_chunk passed as 4th prefetch? Simpler: closure.
    raise NotImplementedError  # replaced below


# --- simpler structure: pass step_chunk as its own prefetch array ---

def build(T_rows: int, N: int, n_steps: int, interpret=False):
    n_tiles = T_rows // R

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # step_tile, step_chunk, step_active, seed
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((CHUNK, 1), lambda s, st, sc, sa, sf: (sc[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 1), lambda s, st, sc, sa, sf: (sc[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 1), lambda s, st, sc, sa, sf: (sc[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda s, st, sc, sa, sf: (st[s], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, LANES), lambda s, st, sc, sa, sf: (st[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda s, st, sc, sa, sf: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((R, LANES), jnp.float32)],
    )

    def kern(step_tile, step_chunk, step_active, seed_flag,
             smixed_ref, rank_ref, rid_ref, counts_in_ref,
             counts_out_ref, recsum_ref, delta_ref):
        kernel(step_tile, step_active, seed_flag,
               smixed_ref, rank_ref, rid_ref, counts_in_ref,
               counts_out_ref, recsum_ref, delta_ref)

    @jax.jit
    def call(step_tile, step_chunk, step_active, seed, smixed, rank, rid, counts):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((T_rows, LANES), jnp.int32),
                jax.ShapeDtypeStruct((R, LANES), jnp.float32),
            ],
            input_output_aliases={7: 0},  # counts (4 prefetch + 3 tensor) -> out 0
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(step_tile, step_chunk, step_active, seed, smixed, rank, rid, counts)

    return call


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    T_rows = 16384           # 2M slots
    n_tiles = T_rows // R    # 128
    N = CHUNK * 1074         # ~2.2M
    n_chunks = N // CHUNK
    n_steps = n_chunks + n_tiles

    # synthetic sorted stream: uniform mixed codes in [0, T_rows*128)
    mixed = np.sort(rng.integers(0, T_rows * 128, size=N, dtype=np.int64)).astype(np.int32)
    # ranks: 1-based rank within equal runs
    rank = np.ones(N, np.int32)
    same = mixed[1:] == mixed[:-1]
    for i in np.nonzero(same)[0]:
        rank[i + 1] = rank[i] + 1
    rid = rng.integers(0, 16384, size=N, dtype=np.int32)

    # step mapping
    elem_tile = mixed >> (7 + 7)   # row = mixed>>7; tile = row>>7
    first_t = elem_tile[0::CHUNK]
    last_t = elem_tile[CHUNK - 1::CHUNK]
    steps_tile, steps_chunk = [], []
    for c in range(n_chunks):
        for t in range(first_t[c], last_t[c] + 1):
            steps_tile.append(t)
            steps_chunk.append(c)
    n_real = len(steps_tile)
    assert n_real <= n_steps, (n_real, n_steps)
    pad = n_steps - n_real
    step_tile = np.asarray(steps_tile + [steps_tile[-1]] * pad, np.int32)
    step_chunk = np.asarray(steps_chunk + [steps_chunk[-1]] * pad, np.int32)
    step_active = np.asarray([1] * n_real + [0] * pad, np.int32)

    call = build(T_rows, N, n_steps)
    counts0 = jnp.zeros((T_rows, LANES), jnp.int32)
    args = (
        jnp.asarray(step_tile), jnp.asarray(step_chunk), jnp.asarray(step_active),
        jnp.zeros((1,), jnp.int32),
        jnp.asarray(mixed[:, None]), jnp.asarray(rank[:, None]),
        jnp.asarray(rid[:, None]), counts0,
    )

    counts, recsum = call(*args)
    counts = np.asarray(counts)

    # numpy oracle
    want = np.zeros((T_rows, LANES), np.int64)
    np.add.at(want, (mixed >> 7, mixed & 127), 1)
    ok = np.array_equal(counts.astype(np.int64), want)
    print("histogram correct:", ok, "total:", counts.sum(), "want:", want.sum())

    want_rec = np.zeros((R, LANES), np.float64)
    high = rank >= 4  # table starts empty: observed = 0 + rank
    np.add.at(want_rec, (rid >> 7, rid & 127), high.astype(np.float64))
    rec_ok = np.allclose(np.asarray(recsum), want_rec)
    print("recsum correct:", rec_ok)

    t = timeit(call, *args)
    print(f"kernel N={N} steps={n_steps}: {t*1e3:.2f} ms  "
          f"{t/N*1e9:.2f} ns/elem  ({N/t/1e6:.0f} M elem/s)")


if __name__ == "__main__":
    main()
