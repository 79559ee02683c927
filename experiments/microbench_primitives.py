"""Micro-benchmarks on the real chip to pick the next table architecture.

M1: single-key fused uint64 sort (sort-based pipeline wall candidate)
M2: XLA scatter/gather with indices_are_sorted / unique_indices hints
M3: Pallas tile-sweep (grid DMA in/out) raw throughput
M4: Pallas scalar fori_loop RMW rate on a VMEM table

Run: python experiments/microbench_primitives.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


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


def main():
    print("devices:", jax.devices())
    N = 2_200_000  # windows for a 16k-read batch with 136 windows/read
    rng = np.random.default_rng(0)
    codes30 = jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32))
    idx32 = jnp.arange(N, dtype=jnp.uint32)

    # ---- M1: sorts ----
    @jax.jit
    def sort_u32(x):
        return jax.lax.sort(x)

    @jax.jit
    def sort_u64_fused(c, i):
        key = (c.astype(jnp.uint64) << jnp.uint64(32)) | i.astype(jnp.uint64)
        return jax.lax.sort(key)

    @jax.jit
    def sort_2key(c, i):
        return jax.lax.sort((c, i), num_keys=1)

    t = timeit(sort_u32, codes30)
    print(f"M1 sort u32 single-key      N={N}: {t*1e3:8.2f} ms  {t/N*1e9:.2f} ns/elem")
    t = timeit(sort_u64_fused, codes30, idx32)
    print(f"M1 sort u64 fused key       N={N}: {t*1e3:8.2f} ms  {t/N*1e9:.2f} ns/elem")
    t = timeit(sort_2key, codes30, idx32)
    print(f"M1 sort 2-arr 1-key         N={N}: {t*1e3:8.2f} ms  {t/N*1e9:.2f} ns/elem")

    # ---- M2: scatter/gather with hints ----
    T = 1 << 21  # 2M-slot table
    table = jnp.zeros((T,), jnp.int32)
    slots_rand = jnp.asarray(rng.integers(0, T, size=N, dtype=np.int32))
    slots_sorted = jnp.sort(slots_rand)
    uniq = jnp.asarray(
        np.sort(rng.choice(T, size=500_000, replace=False)).astype(np.int32)
    )

    def mk_gather(sorted_hint):
        @jax.jit
        def g(tab, idx):
            return tab.at[idx].get(
                indices_are_sorted=sorted_hint, mode="promise_in_bounds"
            )
        return g

    def mk_scatter(sorted_hint, unique_hint):
        @jax.jit
        def s(tab, idx):
            return tab.at[idx].add(
                1,
                indices_are_sorted=sorted_hint,
                unique_indices=unique_hint,
                mode="promise_in_bounds",
            )
        return s

    t = timeit(mk_gather(False), table, slots_rand)
    print(f"M2 gather rand  no-hint     N={N}: {t*1e3:8.2f} ms  {t/N*1e9:.2f} ns/elem")
    t = timeit(mk_gather(True), table, slots_sorted)
    print(f"M2 gather sorted hint       N={N}: {t*1e3:8.2f} ms  {t/N*1e9:.2f} ns/elem")
    t = timeit(mk_scatter(False, False), table, slots_rand)
    print(f"M2 scatter rand no-hint     N={N}: {t*1e3:8.2f} ms  {t/N*1e9:.2f} ns/elem")
    t = timeit(mk_scatter(True, False), table, slots_sorted)
    print(f"M2 scatter sorted hint      N={N}: {t*1e3:8.2f} ms  {t/N*1e9:.2f} ns/elem")
    n_u = uniq.shape[0]
    t = timeit(mk_scatter(True, True), table, uniq)
    print(f"M2 scatter sorted+unique    N={n_u}: {t*1e3:8.2f} ms  {t/n_u*1e9:.2f} ns/elem")

    # ---- M3: Pallas tile sweep: stream whole table through VMEM, in+out ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE = 16384  # slots per tile (rows of 128 lanes x 128 sublanes)
    n_tiles = T // TILE

    def sweep_kernel(tab_ref, out_ref):
        out_ref[:] = tab_ref[:] + 1

    @jax.jit
    def sweep(tab):
        t2 = tab.reshape(n_tiles * (TILE // 128), 128)
        return pl.pallas_call(
            sweep_kernel,
            out_shape=jax.ShapeDtypeStruct(t2.shape, t2.dtype),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (TILE // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (TILE // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        )(t2).reshape(-1)

    t = timeit(sweep, table)
    gb = T * 4 * 2 / 1e9
    print(f"M3 pallas sweep {n_tiles} tiles of {TILE}: {t*1e3:8.2f} ms  "
          f"{gb/t:.0f} GB/s  {t/n_tiles*1e6:.2f} us/tile")

    # bigger table sweep to separate bandwidth from per-tile overhead
    T2 = 1 << 24
    table2 = jnp.zeros((T2,), jnp.int32)
    n_tiles2 = T2 // TILE

    @jax.jit
    def sweep2(tab):
        t2 = tab.reshape(n_tiles2 * (TILE // 128), 128)
        return pl.pallas_call(
            sweep_kernel,
            out_shape=jax.ShapeDtypeStruct(t2.shape, t2.dtype),
            grid=(n_tiles2,),
            in_specs=[
                pl.BlockSpec(
                    (TILE // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (TILE // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        )(t2).reshape(-1)

    t = timeit(sweep2, table2)
    gb = T2 * 4 * 2 / 1e9
    print(f"M3 pallas sweep {n_tiles2} tiles of {TILE}: {t*1e3:8.2f} ms  "
          f"{gb/t:.0f} GB/s  {t/n_tiles2*1e6:.2f} us/tile")

    # ---- M4: Pallas scalar RMW loop into VMEM table ----
    TV = 1 << 19  # 512K-slot VMEM table (2 MB)
    E = 1 << 17   # 131072 elements to RMW

    def rmw_kernel(idx_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[:]

        def body(i, _):
            j = idx_ref[i]
            out_ref[j, 0] = out_ref[j, 0] + 1
            return 0

        jax.lax.fori_loop(0, E, body, 0)

    @jax.jit
    def rmw(tab, idx):
        return pl.pallas_call(
            rmw_kernel,
            out_shape=jax.ShapeDtypeStruct((TV, 1), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, tab)

    tabv = jnp.zeros((TV, 1), jnp.int32)
    idxs = jnp.asarray(rng.integers(0, TV, size=E, dtype=np.int32))
    try:
        t = timeit(rmw, tabv, idxs)
        print(f"M4 pallas scalar RMW loop   E={E}: {t*1e3:8.2f} ms  "
              f"{t/E*1e9:.2f} ns/elem ({E/t/1e6:.0f} M/s)")
    except Exception as e:  # noqa: BLE001
        print(f"M4 pallas scalar RMW loop failed: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
