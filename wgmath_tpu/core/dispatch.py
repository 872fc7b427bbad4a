"""Grid math + capacity management (≙ wgcore KernelDispatch / WgIndirect).

The reference sizes workgroup grids with ``div_ceil`` (wgcore/src/kernel.rs:140)
and handles GPU-decided workload sizes with indirect dispatch
(indirect.rs:1-15). XLA is shape-static, so the TPU-native equivalents are:

- :func:`cdiv` / :func:`round_up` — Pallas grid sizing.
- :func:`capacity_bucket` — next-power-of-two capacity bucketing with a floor,
  bounding the number of distinct compiled programs when dynamic counts
  (collision pairs, contacts) overflow. This mirrors the reference's
  reallocate-at-next-power-of-two resize path (wgrapier pipeline.rs:505-545),
  but here the bucket also keys the jit cache.
- masking helpers — indirect dispatch becomes "static padded shapes + validity
  masks"; the actual count travels as a device scalar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_power_of_two(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (int(n - 1).bit_length())


def capacity_bucket(n: int, *, floor: int = 1024) -> int:
    """Smallest capacity bucket >= max(n, floor), from the 1.5x-granular
    ladder {1024·2^k, 1536·2^k} = 1024, 1536, 2048, 3072, 4096, 6144, ...

    Pure power-of-two buckets (≙ the reference's next_power_of_two
    reallocation, pipeline.rs:505-545) overshoot by up to 2x, and every
    capacity-sized pass (broad phase, coloring, narrow phase, GS windows)
    pays for the overshoot every frame; the intermediate 1.5x buckets cap
    the waste at 50% for one extra recompile step during growth.
    """
    n = max(int(n), floor, 1)
    p = next_power_of_two(n)
    if p // 2 * 3 // 2 >= n and p // 2 * 3 // 2 >= floor:
        return p // 2 * 3 // 2
    return p


@functools.cache
def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def pallas_interpret() -> bool:
    """Pallas TPU kernels run in interpreter mode off-TPU (CPU test mesh)."""
    return not on_tpu()


def lane_pad(n: int) -> int:
    """Pad a trailing dimension to the 128-wide TPU lane count."""
    return round_up(max(n, 1), 128)


def length_mask(capacity: int, count: jax.Array) -> jax.Array:
    """Validity mask for the first ``count`` slots of a ``capacity`` buffer.

    This is the static-shape replacement for indirect dispatch: kernels run
    over the full capacity and mask out slots >= count.
    """
    return jnp.arange(capacity, dtype=jnp.int32) < count.astype(jnp.int32)
