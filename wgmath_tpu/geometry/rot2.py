"""Batched 2D rotations as (cos, sin) pairs (≙ wgebra WgRot2,
geometry/rot2.rs:6 + rot2.wgsl). Stored as ``[..., 2]`` arrays."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module


def identity(batch_shape=()) -> jax.Array:
    r = jnp.zeros(batch_shape + (2,), jnp.float32)
    return r.at[..., 0].set(1.0)


def from_angle(theta: jax.Array) -> jax.Array:
    return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def angle(r: jax.Array) -> jax.Array:
    return jnp.arctan2(r[..., 1], r[..., 0])


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    ca, sa = a[..., 0], a[..., 1]
    cb, sb = b[..., 0], b[..., 1]
    return jnp.stack([ca * cb - sa * sb, sa * cb + ca * sb], axis=-1)


def inv(r: jax.Array) -> jax.Array:
    return jnp.stack([r[..., 0], -r[..., 1]], axis=-1)


def normalize(r: jax.Array) -> jax.Array:
    return r * jax.lax.rsqrt(jnp.sum(r * r, axis=-1, keepdims=True) + 1e-30)


def mul_vec(r: jax.Array, v: jax.Array) -> jax.Array:
    c, s = r[..., 0], r[..., 1]
    return jnp.stack([c * v[..., 0] - s * v[..., 1],
                      s * v[..., 0] + c * v[..., 1]], axis=-1)


def inv_mul_vec(r: jax.Array, v: jax.Array) -> jax.Array:
    return mul_vec(inv(r), v)


def to_matrix(r: jax.Array) -> jax.Array:
    c, s = r[..., 0], r[..., 1]
    return jnp.stack([jnp.stack([c, -s], axis=-1),
                      jnp.stack([s, c], axis=-1)], axis=-2)


register_module(
    KernelModule(
        "geometry.rot2",
        provides={
            "rot2_identity": identity,
            "rot2_from_angle": from_angle,
            "rot2_angle": angle,
            "rot2_mul": mul,
            "rot2_inv": inv,
            "rot2_normalize": normalize,
            "rot2_mul_vec": mul_vec,
            "rot2_inv_mul_vec": inv_mul_vec,
            "rot2_to_matrix": to_matrix,
        },
        entries={
            "rotate2_batch": EntryPoint(
                fn=lambda r, v: mul_vec(normalize(r), v),
                example_args=lambda: (
                    jnp.ones((1024, 2), jnp.float32),
                    jnp.ones((1024, 2), jnp.float32),
                ),
            )
        },
        doc="Composable 2D rotation ops (≙ wgebra geometry/rot2.wgsl).",
    )
)
