"""Per-phase timing + run statistics (≙ wgcore GpuTimestamps + wgrapier RunStats).

The reference wraps wgpu timestamp query sets so each labeled compute pass
records begin/end pairs (wgcore/src/timestamps.rs:9-248) and the physics
pipeline reports per-phase GPU ms plus counters in ``RunStats``
(wgrapier/src/pipeline.rs:41-66). On TPU the equivalent is wall-clock timing
around ``block_until_ready`` per labeled phase, plus optional
``jax.profiler`` traces for kernel-level breakdowns.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any

import jax


@dataclasses.dataclass
class RunStats:
    """Accumulated per-phase timings (ms) and counters for one run."""

    phase_ms: dict[str, float] = dataclasses.field(default_factory=dict)
    counters: dict[str, int] = dataclasses.field(default_factory=dict)

    def add_phase(self, name: str, ms: float) -> None:
        self.phase_ms[name] = self.phase_ms.get(name, 0.0) + ms

    def bump(self, name: str, n: int = 1) -> None:
        self.counters[name] = self.counters.get(name, 0) + n

    def total_ms(self) -> float:
        return sum(self.phase_ms.values())

    def summary(self) -> str:
        lines = [f"total: {self.total_ms():8.3f} ms"]
        for name, ms in sorted(self.phase_ms.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {name:<28s} {ms:8.3f} ms")
        for name, n in sorted(self.counters.items()):
            lines.append(f"  {name:<28s} {n}")
        return "\n".join(lines)


class PhaseTimer:
    """Labelled phase timer; blocks on device results for honest timings.

    Usage::

        stats = RunStats()
        timer = PhaseTimer(stats)
        with timer.phase("broad_phase"):
            pairs = find_pairs(...)   # traced+executed
        # block target: pass arrays to sync on
        with timer.phase("solve", sync=lambda: out):
            out = solve(...)
    """

    def __init__(self, stats: RunStats):
        self.stats = stats

    @contextlib.contextmanager
    def phase(self, name: str, result: Any = None):
        start = time.perf_counter()
        holder: list[Any] = []
        try:
            yield holder
        finally:
            to_sync = holder[0] if holder else result
            if to_sync is not None:
                jax.block_until_ready(to_sync)
            self.stats.add_phase(name, (time.perf_counter() - start) * 1e3)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace wrapper (kernel-level breakdown on real TPU)."""
    with jax.profiler.trace(log_dir):
        yield


def timeit(fn, *args, iters: int = 10, warmup: int = 3) -> float:
    """Median wall-clock seconds per call of a jitted fn (blocks per call)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
