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
    """Smallest power-of-two capacity >= max(n, floor).

    Default floor matches the reference's 1024-element default contact-buffer
    allocations (wgrapier pipeline.rs:477+).
    """
    return max(next_power_of_two(max(int(n), 1)), floor)


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
