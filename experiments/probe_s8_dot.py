"""Probe: does Pallas/Mosaic lower s8 x s8 -> s32 dots on this chip, and at
what rate vs bf16? Shapes mimic the bucket kernel's gather:
planes (128, P) x C (128, 2048) contracting dim 0."""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, P, E = 128, 256, 2048
STEPS = 1024


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0:1]))


def kern(dtype, a_ref, b_ref, o_ref):
    acc = jnp.zeros((P, E), jnp.float32 if dtype == jnp.bfloat16 else jnp.int32)
    a = a_ref[:].astype(dtype)
    b = b_ref[:].astype(dtype)
    pref = jnp.float32 if dtype == jnp.bfloat16 else jnp.int32
    for _ in range(8):
        acc = acc + jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=pref)
    o_ref[:] = acc.astype(jnp.float32)


def run(dtype, name):
    a = jnp.asarray(np.random.default_rng(0).integers(
        0, 100, size=(R, P), dtype=np.int32))
    b = jnp.asarray(np.random.default_rng(1).integers(
        0, 2, size=(R, E), dtype=np.int32))
    f = pl.pallas_call(
        partial(kern, dtype),
        grid=(STEPS,),
        in_specs=[pl.BlockSpec((R, P), lambda s: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((R, E), lambda s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((P, E), lambda s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, E), jnp.float32),
    )
    g = jax.jit(lambda a, b: f(a, b))
    try:
        out = g(a, b)
        sync(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED to lower/run: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            out = g(a, b)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / 8)
    macs = STEPS * 8 * R * P * E
    print(f"{name}: {best*1e3:7.3f} ms  {macs/best/1e12:6.1f} TMAC/s",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run(jnp.bfloat16, "bf16xbf16->f32")
    run(jnp.int8, "s8xs8->s32   ")
