"""Isolate Pallas grid-step overhead vs input block shape.

Grid of N_STEPS steps, each loading three stream blocks (like the bucket
kernel's p1/p2/p3) shaped either (2048, 1) [element-per-sublane, 256 sparse
VMEM tiles per block] or (16, 128) [dense, 2 tiles], plus a (128,128) tile
pair, doing no compute.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 16384 * 136
CHUNK = 2048
NPAD = -(-N // 32768) * 32768
N_CHUNKS = NPAD // CHUNK
N_STEPS = N_CHUNKS + 128


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


def _kernel(st_ref, sc_ref, p1_ref, p2_ref, p3_ref, t1_ref, t2_ref, o_ref):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)


def build(shape2d: bool, n_inputs: int = 3):
    if shape2d:
        arr_shape = (NPAD // 128, 128)
        blk = (CHUNK // 128, 128)
    else:
        arr_shape = (NPAD, 1)
        blk = (CHUNK, 1)

    def index(s, st, sc):
        return (sc[s], 0)

    def tindex(s, st, sc):
        return (st[s], 0)

    @jax.jit
    def run(p, t, step_tilev, step_chunkv):
        ins = [p] * n_inputs + [t, t]
        in_specs = (
            [pl.BlockSpec(blk, index, memory_space=pltpu.VMEM)] * n_inputs
            + [pl.BlockSpec((128, 128), tindex, memory_space=pltpu.VMEM)] * 2
        )
        return pl.pallas_call(
            _kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(N_STEPS,),
                in_specs=in_specs,
                out_specs=[pl.BlockSpec((8, 128), lambda s, st, sc: (0, 0),
                                        memory_space=pltpu.VMEM)],
            ),
            out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)],
        )(step_tilev, step_chunkv, *ins)

    return run


def main():
    step_tilev = jnp.minimum(
        jnp.arange(N_STEPS, dtype=jnp.int32) * 128 // max(N_STEPS, 1), 127)
    step_chunkv = jnp.minimum(jnp.arange(N_STEPS, dtype=jnp.int32),
                              N_CHUNKS - 1)
    t = jnp.zeros((16384, 128), jnp.int32)

    for shape2d in (False, True):
        if shape2d:
            p = jnp.zeros((NPAD // 128, 128), jnp.int32)
        else:
            p = jnp.zeros((NPAD, 1), jnp.int32)
        run = build(shape2d)
        tm = timeit(run, p, t, step_tilev, step_chunkv)
        print(f"shape2d={shape2d}: {tm*1e3:7.2f} ms "
              f"({tm/N_STEPS*1e6:5.2f} us/step)")


if __name__ == "__main__":
    main()
