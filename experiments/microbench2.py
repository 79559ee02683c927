"""Follow-ups: (a) is the 3ms pallas sweep a fixed overhead or bandwidth?
(b) XLA elementwise bandwidth reference; (c) vector-RMW scalar loop rate;
(d) one-hot matmul histogram rate in pallas."""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def sweep_kernel(tab_ref, out_ref):
    out_ref[:] = tab_ref[:] + 1


def make_sweep(T, TILE):
    n_tiles = T // TILE

    @jax.jit
    def sweep(tab):
        t2 = tab.reshape(n_tiles * (TILE // 128), 128)
        return pl.pallas_call(
            sweep_kernel,
            out_shape=jax.ShapeDtypeStruct(t2.shape, t2.dtype),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TILE // 128, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((TILE // 128, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(t2)
    return sweep


def main():
    print("devices:", jax.devices())

    # (a) sweep scaling with table size
    for logT, TILE in [(21, 16384), (24, 16384), (26, 65536), (26, 262144)]:
        T = 1 << logT
        tab = jnp.zeros((T,), jnp.int32)
        f = make_sweep(T, TILE)
        t = timeit(f, tab)
        gb = T * 4 * 2 / 1e9
        print(f"(a) sweep T=2^{logT} tile={TILE}: {t*1e3:8.2f} ms  {gb/t:5.0f} GB/s")

    # (b) XLA elementwise reference on same sizes
    @jax.jit
    def xla_inc(tab):
        return tab + 1

    for logT in [21, 24, 26]:
        T = 1 << logT
        tab = jnp.zeros((T,), jnp.int32)
        t = timeit(xla_inc, tab)
        gb = T * 4 * 2 / 1e9
        print(f"(b) XLA +1  T=2^{logT}: {t*1e3:8.2f} ms  {gb/t:5.0f} GB/s")

    # (b2) empty-ish call overhead: tiny op
    @jax.jit
    def tiny(x):
        return x + 1

    x = jnp.zeros((8, 128), jnp.int32)
    t = timeit(tiny, x, iters=50)
    print(f"(b2) tiny XLA call: {t*1e6:.0f} us")

    tinyp = jax.jit(lambda x: pl.pallas_call(
        sweep_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    t = timeit(tinyp, x, iters=50)
    print(f"(b2) tiny pallas call: {t*1e6:.0f} us")

    # (c) vector-RMW: scalar loop, each iteration does a (1,128) row add
    TV_ROWS = 4096  # 4096x128 = 512K-slot table, 2 MB VMEM
    E = 1 << 15

    def rmw_kernel(rows_ref, lanes_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[:]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, _):
            r = rows_ref[i]
            onehot = (lane_iota == lanes_ref[i]).astype(jnp.int32)
            out_ref[pl.ds(r, 1), :] = out_ref[pl.ds(r, 1), :] + onehot
            return 0

        jax.lax.fori_loop(0, E, body, 0)

    @jax.jit
    def rmw(tab, rows, lanes):
        return pl.pallas_call(
            rmw_kernel,
            out_shape=jax.ShapeDtypeStruct((TV_ROWS, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(rows, lanes, tab)

    rng = np.random.default_rng(0)
    tabv = jnp.zeros((TV_ROWS, 128), jnp.int32)
    rows = jnp.asarray(rng.integers(0, TV_ROWS, size=E, dtype=np.int32))
    lanes = jnp.asarray(rng.integers(0, 128, size=E, dtype=np.int32))
    try:
        t = timeit(rmw, tabv, rows, lanes, iters=5)
        print(f"(c) vector-RMW loop E={E}: {t*1e3:8.2f} ms  "
              f"{t/E*1e9:.1f} ns/elem ({E/t/1e6:.0f} M/s)")
    except Exception as e:  # noqa: BLE001
        print(f"(c) vector-RMW failed: {type(e).__name__}: {str(e)[:200]}")

    # (d) one-hot matmul histogram: E elements into T=R*128 slots
    # counts[r,l] = sum_e (row_e==r)*(lane_e==l)  via  A^T @ B on MXU
    R = 512           # table rows -> T = 65536 slots per tile
    EC = 1024         # elements per chunk

    def hist_kernel(rows_ref, lanes_ref, out_ref):
        rows = rows_ref[:]                      # (EC, 1) int32
        lanes = lanes_ref[:]
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (EC, R), 1)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (EC, 128), 1)
        A = (rows == r_iota).astype(jnp.bfloat16)     # (EC, R)
        B = (lanes == l_iota).astype(jnp.bfloat16)    # (EC, 128)
        out_ref[:] += jax.lax.dot_general(
            A, B, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    n_chunks = 64

    @jax.jit
    def hist(rows, lanes):
        return pl.pallas_call(
            hist_kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((EC, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((EC, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(rows, lanes)

    Etot = n_chunks * EC
    hrows = jnp.asarray(rng.integers(0, R, size=(Etot, 1), dtype=np.int32))
    hlanes = jnp.asarray(rng.integers(0, 128, size=(Etot, 1), dtype=np.int32))
    try:
        t = timeit(hist, hrows, hlanes)
        print(f"(d) onehot-matmul hist E={Etot} T={R*128}: {t*1e3:8.2f} ms  "
              f"{t/Etot*1e9:.1f} ns/elem ({Etot/t/1e6:.0f} M/s)")
    except Exception as e:  # noqa: BLE001
        print(f"(d) onehot hist failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
