"""Tracing / profiling.

The reference has no profiling subsystem beyond its 60-second rate lines
(SURVEY.md section 5.1). Here: lightweight host-side stage timers built into
the streaming loop (frame/pack/dispatch/write) and an optional
``jax.profiler`` device trace via --profile.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulates wall time per pipeline stage; ~100ns overhead per use."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        if not self.totals:
            return ""
        total = sum(self.totals.values())
        lines = ["--- Host stage timing ---"]
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"{name}: {t:.3f}s ({t / max(total, 1e-12) * 100:.1f}%), "
                f"{self.counts[name]} calls, {t / max(self.counts[name], 1) * 1e3:.2f} ms/call"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace wrapper (TensorBoard/xprof-compatible)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
