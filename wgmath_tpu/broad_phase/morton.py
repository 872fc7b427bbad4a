"""Morton codes + bit utilities (≙ wgparry lbvh.wgsl compute_morton:155 and
the radix-sorted key machinery).

All pure vectorized integer ops; the sort itself is ``jax.lax.sort_key_val``
(the TPU-native replacement for the WGSL radix sort — see
broad_phase/sort.py for the parity wrapper and rationale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def expand_bits_3(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v so consecutive bits are 3 apart."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def expand_bits_2(v: jax.Array) -> jax.Array:
    """Spread the low 16 bits of v so consecutive bits are 2 apart."""
    v = v.astype(jnp.uint32)
    v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.uint32(0x33333333)
    v = (v | (v << 1)) & jnp.uint32(0x55555555)
    return v


def morton_codes(points: jax.Array, domain_min: jax.Array,
                 domain_max: jax.Array) -> jax.Array:
    """Quantize points into the domain AABB and interleave bits.

    3D: 10 bits/axis → 30-bit code; 2D: 16 bits/axis → 32-bit code.
    ≙ lbvh.wgsl compute_domain (the min/max reduce) + compute_morton.
    """
    dim = points.shape[-1]
    extent = jnp.maximum(domain_max - domain_min, 1e-9)
    unit = (points - domain_min) / extent
    if dim == 3:
        q = jnp.clip(unit * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
        return (expand_bits_3(q[..., 0]) << 2 | expand_bits_3(q[..., 1]) << 1
                | expand_bits_3(q[..., 2]))
    q = jnp.clip(unit * 65536.0, 0.0, 65535.0).astype(jnp.uint32)
    return expand_bits_2(q[..., 0]) << 1 | expand_bits_2(q[..., 1])


def clz32(x: jax.Array) -> jax.Array:
    """Count leading zeros of a uint32, branch-free."""
    x = x.astype(jnp.uint32)
    n = jnp.zeros(x.shape, jnp.int32)
    for s in (16, 8, 4, 2, 1):
        mask = x < (jnp.uint32(1) << (32 - s))  # top s bits all zero
        n = jnp.where(mask, n + s, n)
        x = jnp.where(mask, x << s, x)
    return jnp.where(x == 0, 32, n)
