"""Profiling / observability helpers.

The reference's only instrumentation is a wall-clock print per frame and
a per-tile progress bar (reference src/main.rs:75-82, src/film.rs:636;
SURVEY.md §5). Here: phase timers with samples/sec derivation, and a thin
wrapper over jax.profiler for device traces viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class PhaseTimer:
    """Accumulates wall time per named phase; blocks on device work so
    timings are real."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, samples: Optional[int] = None) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            line = f"{name:>20}: {total:8.3f}s x{self.counts[name]}"
            if samples:
                line += f"  ({samples / total / 1e6:.3f} Msamples/s)"
            lines.append(line)
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace (XLA ops, Pallas kernels) into
    log_dir for TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def live_samples_per_sec(fn, *args, warmup: int = 1, iters: int = 3,
                         samples_per_call: int = 0):
    """Time a jitted callable; returns (seconds_per_call, Msamples/s)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    ms = samples_per_call / dt / 1e6 if samples_per_call else 0.0
    return dt, ms
