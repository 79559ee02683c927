"""Correctness check of ops/bucket_kernel.py against a numpy oracle.

Run CPU-interpret: JAX_PLATFORMS=cpu python experiments/test_bucket_correctness.py
Run on chip:       python experiments/test_bucket_correctness.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

interpret = os.environ.get("JAX_PLATFORMS", "") == "cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nomalise_kmers_multi_large_tpu.ops.bucket_kernel import (  # noqa: E402
    LANES, bucket_batch,
)
from nomalise_kmers_multi_large_tpu.ops.mix import mix32, mix32_np, unmix32_np  # noqa: E402


def oracle(batches, seeds, k, depth, w):
    """Sequential reference: dict code->count; returns per-batch high_per_read."""
    table = {}
    for s in seeds:
        for code, v in zip(s[0], s[1]):
            if v:
                table.setdefault(int(code), 0)
    outs = []
    for codes, valid in batches:
        n_reads = codes.shape[0] // w
        high = np.zeros(n_reads, np.int64)
        for i in range(codes.shape[0]):
            if not valid[i]:
                continue
            c = int(codes[i])
            table[c] = table.get(c, 0) + 1
            if table[c] >= depth:
                high[i // w] += 1
        outs.append(high)
    return table, outs


def main():
    rng = np.random.default_rng(42)
    k = 8                      # 16-bit code space
    rows = 512                 # fp_bits = 16 - 9 = 7
    depth = 3
    w = 16                     # windows per read
    n_reads = 64
    n = n_reads * w

    def rand_batch(density):
        codes = rng.integers(1, 4 ** k, size=n, dtype=np.uint32)
        if density:  # force duplicates: draw from a small pool
            pool = rng.integers(1, 4 ** k, size=density, dtype=np.uint32)
            codes = pool[rng.integers(0, density, size=n)]
        valid = rng.random(n) > 0.15
        return codes, valid

    # mix round-trip sanity
    x = rng.integers(0, 4 ** k, size=1000, dtype=np.uint32)
    m = mix32_np(x, 2 * k)
    assert np.array_equal(unmix32_np(m, 2 * k), x), "mix not bijective!"
    assert np.array_equal(np.asarray(mix32(jnp.asarray(x), 2 * k)), m), \
        "device/host mix mismatch"

    seeds = [rand_batch(300)]
    batches = [rand_batch(200), rand_batch(0), rand_batch(150), rand_batch(200)]

    want_table, want_high = oracle(batches, seeds, k, depth, w)

    fp = jnp.zeros((rows, LANES), jnp.int32)
    counts = jnp.zeros((rows, LANES), jnp.int32)

    kw = dict(k=k, rows=rows, depth=depth, windows_per_read=w,
              chunk=256, interpret=interpret)
    # seed pass
    codes, valid = seeds[0]
    out = bucket_batch(fp, counts, mix32(jnp.asarray(codes), 2 * k),
                       jnp.asarray(valid), seed=True, **kw)
    fp, counts = out.fp, out.counts
    assert int(out.overflow) == 0
    got_used = int(jnp.sum(out.fp != 0))
    want_used = len(want_table)  # oracle table after seeds (all count 0) +
    # ... seeds only; compare after full run below

    for bi, (codes, valid) in enumerate(batches):
        out = bucket_batch(fp, counts, mix32(jnp.asarray(codes), 2 * k),
                           jnp.asarray(valid), seed=False, **kw)
        fp, counts = out.fp, out.counts
        got = np.asarray(out.high_per_read)
        if not np.array_equal(got, want_high[bi]):
            bad = np.nonzero(got != want_high[bi])[0]
            print(f"batch {bi}: MISMATCH at reads {bad[:10]}")
            print("got ", got[bad[:10]])
            print("want", want_high[bi][bad[:10]])
            sys.exit(1)
        print(f"batch {bi}: high_per_read OK (sum={got.sum()}), "
              f"overflow={int(out.overflow)}")

    # final table contents
    fp_np = np.asarray(fp)
    cnt_np = np.asarray(counts)
    occ_r, occ_l = np.nonzero(fp_np)
    fp_bits = 2 * k - int(np.log2(rows))
    mixedv = (occ_r.astype(np.uint64) << np.uint64(fp_bits)) | \
        (fp_np[occ_r, occ_l].astype(np.uint64) - 1)
    codes_back = unmix32_np(mixedv.astype(np.uint32), 2 * k)
    got_tab = {int(c): int(v) for c, v in zip(codes_back, cnt_np[occ_r, occ_l])}
    if got_tab != want_table:
        missing = set(want_table) - set(got_tab)
        extra = set(got_tab) - set(want_table)
        diffs = {c for c in set(got_tab) & set(want_table)
                 if got_tab[c] != want_table[c]}
        print(f"TABLE MISMATCH: missing={len(missing)} extra={len(extra)} "
              f"diff={len(diffs)}")
        for c in list(diffs)[:10]:
            print(f"  code {c}: got {got_tab[c]} want {want_table[c]}")
        sys.exit(1)
    print(f"table contents OK ({len(got_tab)} entries, "
          f"{sum(v == 0 for v in got_tab.values())} seed-only)")
    print("ALL OK")


if __name__ == "__main__":
    main()
