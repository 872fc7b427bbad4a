"""Host memory-map pressure management for XLA:CPU's LLVM JIT.

Every compiled (or persistent-cache-loaded) XLA:CPU executable is JIT-linked
by LLVM ORC, which mmaps its code/rodata sections as separate regions — big
pipeline programs hold thousands of maps each. A process that compiles or
loads a few hundred such executables exhausts the kernel's default
``vm.max_map_count`` (65530); the next mmap fails with ENOMEM, LLVM logs
"LLVM compilation error: Cannot allocate memory", and XLA segfaults.

This was the root cause of the "XLA CPU segfaults after ~120 cold compiles"
flake first seen in round 1 (CLAUDE.md): the crash count tracked *map*
count, not executable count — reproduced 2026-08-20 with a /proc poller
(crash at maps=64209, rss only 5.6 GB).

Two remedies, both best-effort:

- :func:`raise_map_limit` bumps ``vm.max_map_count`` (needs root — true in
  this environment; standard practice for mmap-heavy processes).
- :func:`map_pressure_guard` drops JAX's in-process executable caches when
  the map count nears the limit (``jax.clear_caches()`` verifiably unmaps
  LLVM's regions; the persistent compile cache makes reloads cheap).
"""

from __future__ import annotations

import gc
import os

_MAP_COUNT_PATH = "/proc/sys/vm/max_map_count"
_TARGET = 1_048_576


def current_map_limit() -> int:
    """The kernel per-process mmap-region cap (0 if unreadable)."""
    try:
        with open(_MAP_COUNT_PATH) as f:
            return int(f.read())
    except (OSError, ValueError):  # pragma: no cover - non-Linux
        return 0


def current_map_count() -> int:
    """This process's live mmap-region count (0 if unreadable)."""
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:  # pragma: no cover - non-Linux
        return 0


def raise_map_limit(target: int = _TARGET) -> bool:
    """Best-effort bump of ``vm.max_map_count``; True if the cap >= target."""
    cur = current_map_limit()
    if cur >= target:
        return True
    try:
        with open(_MAP_COUNT_PATH, "w") as f:
            f.write(str(target))
    except OSError:
        return False
    return current_map_limit() >= target


def map_pressure_guard(frac: float = 0.6) -> bool:
    """Clear JAX executable caches if map count exceeds ``frac`` of the cap.

    Returns True if caches were cleared. Call between tests / bench phases;
    cheap (one /proc read) when below the threshold.
    """
    limit = current_map_limit()
    if not limit:
        return False
    if current_map_count() <= frac * limit:
        return False
    import jax

    jax.clear_caches()
    gc.collect()
    return True
