"""Scaling-evidence measurements for docs/SCALING.md (round-4 verdict item 7).

Real multi-chip hardware is not available in this environment, so the
evidence is (a) the compiled-HLO collective inventory of each sharding mode
on a virtual 8-device CPU mesh — what XLA will actually put on the ICI — and
(b) functional step costs vs device count D on the same virtual mesh
(relative shape only: CPU interpret-mode Pallas is orders of magnitude off
TPU absolute speed, but the collective STRUCTURE and the per-shard work
scaling are backend-independent).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python experiments/scaling_evidence_r5.py
"""
from __future__ import annotations

import os
import re
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# the axon sitecustomize pins jax_platforms via config (beats the env var):
# always pin CPU + 8 virtual devices explicitly BEFORE backend init
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np

from nomalise_kmers_multi_large_tpu.engine.step import BatchStep
from nomalise_kmers_multi_large_tpu.parallel.mesh import data_mesh
from nomalise_kmers_multi_large_tpu.parallel.modes import (
    ModeAStep, ModeBBucketStep,
)
from nomalise_kmers_multi_large_tpu.table.bucket import BucketTable

K = 13
READS = 64          # tiny: CPU interpret mode
PAD = 32

_OPS = ("all-reduce", "all-gather", "all-to-all", "collective-permute",
        "reduce-scatter")


def _inventory(hlo: str) -> dict:
    """Collective op -> list of result types in a compiled HLO dump.

    Line-based and tolerant: matches sync and async (-start) forms, and
    takes everything between '=' and the op name as the result type."""
    out: dict[str, list[str]] = {}
    for line in hlo.splitlines():
        for op in _OPS:
            if f" {op}(" in line or f" {op}-start(" in line:
                m = re.search(r"=\s*(.*?)\s*" + op, line)
                shape = m.group(1).strip() if m else "?"
                out.setdefault(op, []).append(shape or "?")
                break
    return out


def _mk(mode_cls, ndev):
    mesh = data_mesh(ndev)
    t = BucketTable(K, rows=1024, interpret=True)
    step = BatchStep(t, k=K, depth_per_shard=4, coverage=0.9,
                     canonical=False, paired=False, mode="exact")
    ms = mode_cls(mesh, step)
    if mode_cls is ModeAStep:
        state = ms.init_states(t.init())
    else:
        state = ms.init_state(t.init())
    rng = np.random.default_rng(0)
    bases = rng.integers(0, 4, size=(READS, PAD), dtype=np.uint8)
    lengths = np.full(READS, PAD, np.int32)
    rv = np.ones(READS, bool)
    return ms, state, bases, lengths, rv


def collect(mode_cls, name):
    for ndev in (2, 4, 8):
        ms, state, bases, lengths, rv = _mk(mode_cls, ndev)
        t0 = time.perf_counter()
        state, keep, stats, tallies = ms(state, bases, lengths, rv)
        jax.block_until_ready(keep)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            state, keep, stats, tallies = ms(state, bases, lengths, rv)
            jax.block_until_ready(keep)
            best = min(best, time.perf_counter() - t0)
        hlo = ms._fn.lower(
            state, jax.numpy.asarray(bases), jax.numpy.asarray(lengths),
            jax.numpy.asarray(rv)).compile().as_text() \
            if hasattr(ms, "_fn") else ""
        inv = _inventory(hlo)
        print(f"{name} D={ndev}: step {best*1e3:.1f} ms "
              f"(compile {compile_s:.1f} s)")
        for op, shapes in sorted(inv.items()):
            print(f"    {op} x{len(shapes)}: {', '.join(shapes[:6])}"
                  + (" ..." if len(shapes) > 6 else ""))
        if not inv:
            print("    (no collectives in compiled HLO)")


if __name__ == "__main__":
    print(f"devices: {jax.device_count()} ({jax.default_backend()})")
    collect(ModeAStep, "ModeA")
    collect(ModeBBucketStep, "ModeB-bucket")
