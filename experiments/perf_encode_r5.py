"""Round 5: where does the fused encode's 0.69 ms/batch go?

Hypothesis: the kernel loads (512, 256) uint8 blocks and immediately
converts to int32 — an 8-bit Mosaic load + relayout per block that may
dominate (round-1 noted a same-shape COPY kernel cost the same as the whole
encode, i.e. the compute is nearly free). Variants, each a G=10 lax.scan:

  enc_u8   — production encode_keys (uint8 input)
  enc_i32  — same kernel body, input pre-converted to int32 by XLA (the
             convert is HBM-bandwidth: ~20 MB at ~800 GB/s = 25 us)
  copy_u8  — u8-in, i32-out kernel doing only astype+slice (relayout floor)
  copy_i32 — i32-in copy kernel (DMA floor)

Run: PYTHONPATH=/root/repo:/root/.axon_site python
experiments/perf_encode_r5.py
"""
import time
from functools import partial

import numpy as np

READ_LEN = 150
K = 15
BATCH = 16384
GROUP = 10
ITERS = 4
ROUNDS = 3


def _sync(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nomalise_kmers_multi_large_tpu.ops import encode_kernel as ek

    rng = np.random.default_rng(0)
    pool = rng.integers(0, 4, size=(4096, READ_LEN), dtype=np.uint8)
    idx = rng.integers(0, pool.shape[0], size=(GROUP, BATCH))
    batches = jnp.asarray(pool[idx])
    lengths = jnp.asarray(np.full((GROUP, BATCH), READ_LEN, np.int32))
    W = READ_LEN - K + 1
    L = READ_LEN
    lp = -(-(L + 2) // 128) * 128
    br = 512
    mix0 = int(ek.mix32_np(np.zeros(1, np.uint32), 2 * K)[0])

    def pad_block(b, ln, dtype):
        lens = jnp.clip(ln.astype(jnp.int32), 0, 1023)
        tail = jnp.zeros((BATCH, lp - L - 2), jnp.uint8)
        padded = jnp.concatenate(
            [b, tail, (lens[:, None] >> 8).astype(jnp.uint8),
             (lens[:, None] & 255).astype(jnp.uint8)], axis=1)
        return padded.astype(dtype)

    def call(kern, x, in_dtype):
        return pl.pallas_call(
            kern,
            grid=(BATCH // br,),
            in_specs=[pl.BlockSpec((br, lp), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((br, W), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BATCH, W), jnp.int32),
        )(x)

    def copy_kernel(b_ref, o_ref):
        o_ref[:] = b_ref[:].astype(jnp.int32)[:, :W]

    def variant(name, dtype, kern):
        def f(c, b, ln):
            x = pad_block(b, ln, dtype)
            out = call(kern, x, dtype)
            return c + jnp.sum(pltpu.bitcast(out, jnp.uint32)
                               if False else out.astype(jnp.uint32)), out[0, 0]

        def body(c, xs):
            return f(c, *xs)

        @jax.jit
        def run(c):
            return jax.lax.scan(body, c, (batches, lengths))

        c, outs = run(jnp.zeros((), jnp.uint32))
        _sync(outs)
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                c, outs = run(jnp.zeros((), jnp.uint32))
            _sync(outs)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:10s}: {best / (GROUP * ITERS) * 1e3:6.2f} ms/batch",
              flush=True)

    enc = partial(ek._kernel, K, False, W, lp, mix0)
    variant("enc_u8", jnp.uint8, enc)
    variant("enc_i32", jnp.int32, enc)
    variant("copy_u8", jnp.uint8, copy_kernel)
    variant("copy_i32", jnp.int32, copy_kernel)


if __name__ == "__main__":
    main()
