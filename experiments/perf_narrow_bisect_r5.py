"""Round 5: narrow-kernel cost bisect at bench shape (k=15, 16384x150bp).

Methodology per CLAUDE.md: no standalone sub-ms ops (the tunnel's ~0.9 ms
dispatch floor swamps them). Every variant is a lax.scan of G=10 batch
iterations inside ONE jit, so each timed dispatch does >= 4 ms of work;
costs are the DELTAS between cumulative pipeline prefixes / ablations.

Prefixes: encode -> +sort(+rid) -> +segscan -> +kernel(ablations).
Kernel ablations (ops/bucket_kernel.py `ablate`): no_gather (drop the limb
plane matmul), no_match (drop fp compare + mboth reduction), no_delta
(drop the counts-update matmul), no_recsum (drop the per-read tally
matmul).

Run: PYTHONPATH=/root/repo:/root/.axon_site python
experiments/perf_narrow_bisect_r5.py
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
ROWS = 16384
DEPTH = 50


def _sync(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def main():
    import jax
    import jax.numpy as jnp

    from nomalise_kmers_multi_large_tpu.ops.bucket_kernel import (
        bucket_batch,
    )
    from nomalise_kmers_multi_large_tpu.ops.encode_kernel import encode_keys
    from nomalise_kmers_multi_large_tpu.ops.segscan import rank_cand_scan

    rng = np.random.default_rng(0)
    pool = rng.integers(0, 4, size=(4096, READ_LEN), dtype=np.uint8)
    idx = rng.integers(0, pool.shape[0], size=(GROUP, BATCH))
    batches = jnp.asarray(pool[idx])
    lengths = jnp.asarray(np.full((GROUP, BATCH), READ_LEN, np.int32))
    W = READ_LEN - K + 1
    N = BATCH * W
    fp_bits = 2 * K - int(np.log2(ROWS))

    def scan_over(fn, carry_init):
        def body(c, xs):
            b, ln = xs
            return fn(c, b, ln)

        @jax.jit
        def run(c):
            c, outs = jax.lax.scan(body, c, (batches, lengths))
            return c, outs

        return run, carry_init

    def enc_only(c, b, ln):
        key = encode_keys(b, ln, K, False)
        return c + jnp.sum(key.astype(jnp.uint32)), key[0, 0]

    def enc_sort(c, b, ln):
        key = encode_keys(b, ln, K, False).reshape(N)
        rid = jnp.minimum(jnp.arange(N, dtype=jnp.int32) // W, BATCH - 1)
        skey, srid = jax.lax.sort((key, rid), num_keys=2, is_stable=False)
        return c + jnp.sum(skey) + jnp.sum(srid.astype(jnp.uint32)), skey[0]

    def enc_sort_scan(c, b, ln):
        key = encode_keys(b, ln, K, False).reshape(N)
        rid = jnp.minimum(jnp.arange(N, dtype=jnp.int32) // W, BATCH - 1)
        skey, srid = jax.lax.sort((key, rid), num_keys=2, is_stable=False)
        p2f, p3f = rank_cand_scan(skey, srid, fp_bits=fp_bits, w=W,
                                  n_reads=BATCH, interpret=False)
        return (c + jnp.sum(skey) + jnp.sum(p2f.astype(jnp.uint32))
                + jnp.sum(p3f.astype(jnp.uint32))), skey[0]

    def full(ablate):
        def f(carry, b, ln):
            fp, cnt, acc = carry
            key = encode_keys(b, ln, K, False)
            out = bucket_batch(
                fp, cnt, key.reshape(N), None, k=K, rows=ROWS, depth=DEPTH,
                windows_per_read=W, keyed=True, lanes=64, ablate=ablate)
            return ((out.fp, out.counts,
                     acc + jnp.sum(out.high_per_read).astype(jnp.uint32)),
                    out.overflow)

        return f

    z = jnp.zeros((), jnp.uint32)
    tbl = (jnp.zeros((ROWS, 64), jnp.int32), jnp.zeros((ROWS, 64), jnp.int32))
    variants = [
        ("encode", *scan_over(enc_only, z)),
        ("encode+sort2", *scan_over(enc_sort, z)),
        ("encode+sort2+scan", *scan_over(enc_sort_scan, z)),
        ("full(no_gather,no_match,no_delta,no_recsum)",
         *scan_over(full(("no_gather", "no_match", "no_delta", "no_recsum")),
                    (*tbl, z))),
        ("full(no_match,no_delta,no_recsum)",
         *scan_over(full(("no_match", "no_delta", "no_recsum")), (*tbl, z))),
        ("full(no_delta,no_recsum)",
         *scan_over(full(("no_delta", "no_recsum")), (*tbl, z))),
        ("full(no_recsum)", *scan_over(full(("no_recsum",)), (*tbl, z))),
        ("full()", *scan_over(full(()), (*tbl, z))),
    ]

    prev = 0.0
    for name, run, init in variants:
        c, outs = run(init)
        _sync(outs)
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                c, outs = run(init)
            _sync(outs)
            best = min(best, time.perf_counter() - t0)
        ms = best / (GROUP * ITERS) * 1e3
        print(f"{name:45s}: {ms:6.2f} ms/batch  (delta {ms - prev:+5.2f})",
              flush=True)
        prev = ms

    # NOTE: the ablated "full" variants still run sort+scan inside
    # bucket_batch, so full(all-ablations) - (encode+sort2+scan) isolates
    # the kernel's non-matmul frame (grid/DMA/decode/insert-cond overhead).


if __name__ == "__main__":
    main()
