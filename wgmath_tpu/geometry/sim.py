"""Batched 2D/3D similarity transforms (≙ wgebra WgSim2/WgSim3,
geometry/sim2.rs / sim3.rs:6-11 + sim2.wgsl / sim3.wgsl:19-69).

A similarity is (uniform scale s, rotation R, translation t) acting as
``p ↦ s·R·p + t``. Stored SoA as a pytree: ``rotation [..., 4]`` (quaternion,
3D) or ``[..., 2]`` (cos/sin, 2D), ``translation [..., dim]``,
``scale [...]``. The dimension is a value-level choice, not a build flavor —
the single-package replacement for the reference's dim2/dim3 cargo features
(wgparry lib.rs:46-62).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import tree_util

from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module
from wgmath_tpu.geometry import quat, rot2


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class Sim:
    """Batched similarity; ``dim`` inferred from translation's last axis."""

    rotation: jax.Array  # [..., 4] (3D quat xyzw) or [..., 2] (2D cos/sin)
    translation: jax.Array  # [..., dim]
    scale: jax.Array  # [...]

    def tree_flatten(self):
        return (self.rotation, self.translation, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def dim(self) -> int:
        return self.translation.shape[-1]

    def _rot(self):
        return quat if self.dim == 3 else rot2


def identity(batch_shape=(), dim: int = 3) -> Sim:
    rot = quat.identity(batch_shape) if dim == 3 else rot2.identity(batch_shape)
    return Sim(rot, jnp.zeros(batch_shape + (dim,), jnp.float32),
               jnp.ones(batch_shape, jnp.float32))


def from_parts(rotation, translation, scale=None) -> Sim:
    translation = jnp.asarray(translation)
    if scale is None:
        scale = jnp.ones(translation.shape[:-1], jnp.float32)
    return Sim(jnp.asarray(rotation), translation, jnp.asarray(scale))


def mul(a: Sim, b: Sim) -> Sim:
    """Composition a ∘ b: (sa·sb, Ra·Rb, sa·Ra·tb + ta)."""
    r = a._rot()
    return Sim(
        r.mul(a.rotation, b.rotation),
        a.scale[..., None] * r.mul_vec(a.rotation, b.translation) + a.translation,
        a.scale * b.scale,
    )


def inv(a: Sim) -> Sim:
    r = a._rot()
    inv_s = 1.0 / a.scale
    inv_rot = r.inv(a.rotation)
    return Sim(inv_rot, -inv_s[..., None] * r.mul_vec(inv_rot, a.translation), inv_s)


def inv_mul(a: Sim, b: Sim) -> Sim:
    """a⁻¹ ∘ b without forming the full inverse."""
    r = a._rot()
    inv_s = 1.0 / a.scale
    inv_rot = r.inv(a.rotation)
    return Sim(
        r.mul(inv_rot, b.rotation),
        inv_s[..., None] * r.mul_vec(inv_rot, b.translation - a.translation),
        inv_s * b.scale,
    )


def mul_pt(a: Sim, p: jax.Array) -> jax.Array:
    return a.scale[..., None] * a._rot().mul_vec(a.rotation, p) + a.translation


def inv_mul_pt(a: Sim, p: jax.Array) -> jax.Array:
    return a._rot().inv_mul_vec(a.rotation, p - a.translation) / a.scale[..., None]


def mul_vec(a: Sim, v: jax.Array) -> jax.Array:
    return a.scale[..., None] * a._rot().mul_vec(a.rotation, v)


def inv_mul_vec(a: Sim, v: jax.Array) -> jax.Array:
    return a._rot().inv_mul_vec(a.rotation, v) / a.scale[..., None]


def mul_unit_vec(a: Sim, v: jax.Array) -> jax.Array:
    return a._rot().mul_vec(a.rotation, v)


def inv_mul_unit_vec(a: Sim, v: jax.Array) -> jax.Array:
    return a._rot().inv_mul_vec(a.rotation, v)


def _example(dim):
    n = 256
    rot = jnp.tile(jnp.asarray([0, 0, 0, 1.0] if dim == 3 else [1.0, 0]), (n, 1))
    return (Sim(rot, jnp.ones((n, dim), jnp.float32), jnp.ones((n,), jnp.float32)),
            Sim(rot, jnp.ones((n, dim), jnp.float32), jnp.ones((n,), jnp.float32)))


register_module(
    KernelModule(
        "geometry.sim",
        deps=("geometry.quat", "geometry.rot2"),
        provides={
            "sim_identity": identity,
            "sim_mul": mul,
            "sim_inv": inv,
            "sim_inv_mul": inv_mul,
            "sim_mul_pt": mul_pt,
            "sim_inv_mul_pt": inv_mul_pt,
            "sim_mul_vec": mul_vec,
            "sim_inv_mul_vec": inv_mul_vec,
            "sim_mul_unit_vec": mul_unit_vec,
            "sim_inv_mul_unit_vec": inv_mul_unit_vec,
        },
        entries={
            "sim3_compose": EntryPoint(
                fn=lambda a, b: mul(a, inv(b)),
                example_args=lambda: _example(3),
            ),
            "sim2_compose": EntryPoint(
                fn=lambda a, b: mul(a, inv(b)),
                example_args=lambda: _example(2),
            ),
        },
        doc="Composable similarity transforms (≙ wgebra geometry/sim{2,3}.wgsl).",
    )
)
