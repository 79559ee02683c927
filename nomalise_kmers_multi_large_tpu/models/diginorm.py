"""The digital-normalization decision model.

Pure functions mapping per-read (high_count_kmers, total_kmers) tallies to
keep/skip decisions — the reference's classification math
(normalise_kmers_multi_large.c:1641-1646 paired, :1986-1992 single):

- ratio = total > 0 ? high / total : 0   (float; :1641-1642)
- keep a single read iff ratio < coverage         (STRICT <, so --coverage 1 drops
  only exact 100% redundancy; CHANGELOG.md:2)
- keep a pair iff ratio_fwd < coverage AND ratio_rev < coverage (:1646)

`rule="avg"` implements the reference's commented-out alternative — classify on the
pair-pooled ratio (:1638-1645) — exposed as a real option here.
"""
from __future__ import annotations

import jax.numpy as jnp


def coverage_ratios(high: jnp.ndarray, total: jnp.ndarray) -> jnp.ndarray:
    """float32 ratio with the reference's total==0 => 0 convention (:1641)."""
    h = high.astype(jnp.float32)
    t = total.astype(jnp.float32)
    return jnp.where(total > 0, h / jnp.maximum(t, 1.0), 0.0)


def keep_mask_single(high, total, coverage: float) -> jnp.ndarray:
    return coverage_ratios(high, total) < jnp.float32(coverage)


def keep_mask_paired(high_f, total_f, high_r, total_r, coverage: float,
                     rule: str = "and") -> jnp.ndarray:
    if rule == "avg":
        return keep_mask_single(high_f + high_r, total_f + total_r, coverage)
    cov = jnp.float32(coverage)
    return (coverage_ratios(high_f, total_f) < cov) & (
        coverage_ratios(high_r, total_r) < cov
    )
