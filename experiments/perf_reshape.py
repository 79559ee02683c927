"""Is an in-kernel (16,128)->(2048,1) reshape cheaper than the sparse DMA of
a (2048,1) block? Loads three dense (16,128) blocks per step, reshapes each to
(2048,1), and does an A-one-hot compare + matmul like the bucket kernel."""
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


def _onehot(c):
    return jnp.where(c, 1.0, 0.0).astype(jnp.bfloat16)


def _kernel(mode, st_ref, sc_ref, p1_ref, p2_ref, p3_ref, t1_ref, o_ref):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    if mode == "none":
        return
    if mode == "flat":
        p1 = p1_ref[:]          # already (2048, 1)
        p2 = p2_ref[:]
        p3 = p3_ref[:]
    else:
        p1 = p1_ref[:].reshape(CHUNK, 1)
        p2 = p2_ref[:].reshape(CHUNK, 1)
        p3 = p3_ref[:].reshape(CHUNK, 1)

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 128), 1)
    A = _onehot((p1 & 127) == r_iota)
    planes = t1_ref[:].astype(jnp.bfloat16)
    rows = jax.lax.dot_general(A, planes, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    v = jnp.sum(rows * (p2 + p3).astype(jnp.float32), axis=1, keepdims=True)
    o_ref[:] += jnp.sum(v) * jnp.ones((8, 128), jnp.float32)


def build(mode):
    if mode == "flat":
        arr_shape = (NPAD, 1)
        blk = (CHUNK, 1)
    else:
        arr_shape = (NPAD // 128, 128)
        blk = (CHUNK // 128, 128)

    @jax.jit
    def run(p, t, step_tilev, step_chunkv):
        return pl.pallas_call(
            partial(_kernel, mode),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(N_STEPS,),
                in_specs=(
                    [pl.BlockSpec(blk, lambda s, st, sc: (sc[s], 0),
                                  memory_space=pltpu.VMEM)] * 3
                    + [pl.BlockSpec((128, 128), lambda s, st, sc: (st[s], 0),
                                    memory_space=pltpu.VMEM)]
                ),
                out_specs=[pl.BlockSpec((8, 128), lambda s, st, sc: (0, 0),
                                        memory_space=pltpu.VMEM)],
            ),
            out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)],
        )(step_tilev, step_chunkv, p, p, p, t)

    return run


def main():
    step_tilev = jnp.minimum(
        jnp.arange(N_STEPS, dtype=jnp.int32) * 128 // max(N_STEPS, 1), 127)
    step_chunkv = jnp.minimum(jnp.arange(N_STEPS, dtype=jnp.int32),
                              N_CHUNKS - 1)
    t = jnp.zeros((16384, 128), jnp.int32)
    for mode in ("flat", "reshape"):
        p = jnp.zeros((NPAD, 1) if mode == "flat" else (NPAD // 128, 128),
                      jnp.int32)
        try:
            run = build(mode)
            tm = timeit(run, p, t, step_tilev, step_chunkv)
            print(f"{mode:8s}: {tm*1e3:7.2f} ms ({tm/N_STEPS*1e6:5.2f} us/step)")
        except Exception as e:
            print(f"{mode:8s}: FAILED {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
