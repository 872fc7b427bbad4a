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
import numpy as np
from jax import tree_util

from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module
from wgmath_tpu.geometry import quat, rot2


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class Sim:
    """Batched similarity; ``dim`` inferred from translation's last axis.

    ``cm=True`` marks component-major SoA storage — ``rotation`` is a
    TUPLE of 4 ``[N]`` arrays (xyzw), ``translation`` a tuple of ``dim``
    ``[N]`` arrays, ``scale [N]`` — the TPU-native layout for large flat
    batches. Row-major ``[N, 3/4]`` wastes 124/128 VPU lanes per op;
    worse, even a ``[4, N]`` array layout re-materializes a stacked
    array at every op boundary (jnp.stack = a concat XLA will not fuse
    through — measured 2.3 Gop/s on the 1M compose chain vs 5.9 for the
    tuple form, with ~6.7 the bandwidth+VPU roofline). Tuples of rows
    keep every intermediate a free-floating ``[N]`` vector that fuses
    end-to-end. Build with :func:`to_cm`; composition ops dispatch on the
    flag (static pytree aux, so jit caches per-layout programs).
    """

    rotation: jax.Array | tuple  # [..., 4] quat xyzw / [..., 2] cos-sin;
    # cm: tuple of component rows
    translation: jax.Array | tuple  # [..., dim]; cm: tuple of rows
    scale: jax.Array  # [...]
    cm: bool = False  # static: component-major SoA storage

    def tree_flatten(self):
        return (self.rotation, self.translation, self.scale), self.cm

    @classmethod
    def tree_unflatten(cls, aux, children):
        # bool(aux): pre-cm treedefs (e.g. pickled checkpoints) carry
        # aux=None — normalize to False so re-flattened Sims are uniform
        return cls(*children, cm=bool(aux))

    @property
    def dim(self) -> int:
        return len(self.translation) if self.cm else self.translation.shape[-1]

    def _rot(self):
        return quat if self.dim == 3 else rot2


def to_cm(a: Sim) -> Sim:
    """Row-major flat batch → component-major SoA storage."""
    if a.cm:
        return a
    assert a.rotation.ndim == 2, "component-major needs a flat batch"
    return Sim(tuple(a.rotation[:, i] for i in range(a.rotation.shape[1])),
               tuple(a.translation[:, i] for i in range(a.dim)),
               a.scale, cm=True)


def from_cm(a: Sim) -> Sim:
    if not a.cm:
        return a
    return Sim(jnp.stack(a.rotation, axis=-1),
               jnp.stack(a.translation, axis=-1), a.scale, cm=False)


def identity(batch_shape=(), dim: int = 3) -> Sim:
    rot = quat.identity(batch_shape) if dim == 3 else rot2.identity(batch_shape)
    return Sim(rot, jnp.zeros(batch_shape + (dim,), jnp.float32),
               jnp.ones(batch_shape, jnp.float32))


def from_parts(rotation, translation, scale=None) -> Sim:
    translation = jnp.asarray(translation)
    if scale is None:
        scale = jnp.ones(translation.shape[:-1], jnp.float32)
    return Sim(jnp.asarray(rotation), translation, jnp.asarray(scale))


def _cm3(a: Sim, b: Sim | None = None) -> bool:
    """Large flat-batch 3D: route through the component-major fast path.

    ``[N, 3/4]`` arrays put the component axis on the TPU's 128-lane minor
    dim (3-4/128 occupancy); transposing at the op boundary runs the
    arithmetic full-lane, and chained compositions cancel adjacent
    transposes (same mechanism as quat.mul_vec: 5.96 → 12.95 Gop/s at 1M).
    """
    ok = (a.dim == 3 and a.rotation.ndim == 2
          and a.rotation.shape[0] >= quat._CM_MIN_BATCH)
    if b is not None:
        ok = ok and b.rotation.ndim == 2
    return ok


# [4,1] conjugation sign column (numpy: never captures a live tracer)
_CONJ_COL = np.asarray([[-1.0], [-1.0], [-1.0], [1.0]], np.float32)


def _conj_cm(q_t):
    return q_t * _CONJ_COL


def normalize_rotation(a: Sim) -> Sim:
    """Renormalize the rotation (drift control in long compose chains)."""
    if a.cm:
        x, y, z, w = a.rotation
        inv_n = jax.lax.rsqrt(x * x + y * y + z * z + w * w + 1e-30)
        return Sim((x * inv_n, y * inv_n, z * inv_n, w * inv_n),
                   a.translation, a.scale, cm=True)
    return Sim(a._rot().normalize(a.rotation), a.translation, a.scale)


def mul(a: Sim, b: Sim) -> Sim:
    """Composition a ∘ b: (sa·sb, Ra·Rb, sa·Ra·tb + ta)."""
    r = a._rot()
    if a.cm or b.cm:
        assert a.cm and b.cm and a.dim == 3, \
            "component-major composition is 3D and needs both operands cm"
        rot = quat._mul_soa(a.rotation, b.rotation)
        rt = quat._mul_vec_soa(a.rotation, b.translation)
        tr = tuple(a.scale * r + t for r, t in zip(rt, a.translation))
        return Sim(rot, tr, a.scale * b.scale, cm=True)
    if _cm3(a, b):
        qa_t, tb_t = a.rotation.T, b.translation.T
        rot = quat._mul_cm(qa_t, b.rotation.T)
        tr = a.scale[None, :] * quat._mul_vec_cm(qa_t, tb_t) + a.translation.T
        return Sim(rot.T, tr.T, a.scale * b.scale)
    return Sim(
        r.mul(a.rotation, b.rotation),
        a.scale[..., None] * r.mul_vec(a.rotation, b.translation) + a.translation,
        a.scale * b.scale,
    )


def inv(a: Sim) -> Sim:
    r = a._rot()
    inv_s = 1.0 / a.scale
    if a.cm:
        assert a.dim == 3, "component-major inverse is 3D-only"
        inv_rot = quat._conj_soa(a.rotation)
        rt = quat._mul_vec_soa(inv_rot, a.translation)
        return Sim(inv_rot, tuple(-inv_s * r for r in rt), inv_s, cm=True)
    if _cm3(a):
        inv_rot_t = _conj_cm(a.rotation.T)
        tr = -inv_s[None, :] * quat._mul_vec_cm(inv_rot_t, a.translation.T)
        return Sim(inv_rot_t.T, tr.T, inv_s)
    inv_rot = r.inv(a.rotation)
    return Sim(inv_rot, -inv_s[..., None] * r.mul_vec(inv_rot, a.translation), inv_s)


def inv_mul(a: Sim, b: Sim) -> Sim:
    """a⁻¹ ∘ b without forming the full inverse."""
    r = a._rot()
    inv_s = 1.0 / a.scale
    if a.cm or b.cm:
        assert a.cm and b.cm and a.dim == 3, \
            "component-major composition is 3D and needs both operands cm"
        inv_rot = quat._conj_soa(a.rotation)
        rot = quat._mul_soa(inv_rot, b.rotation)
        rt = quat._mul_vec_soa(
            inv_rot, tuple(bb - aa for bb, aa
                           in zip(b.translation, a.translation)))
        return Sim(rot, tuple(inv_s * r for r in rt), inv_s * b.scale,
                   cm=True)
    if _cm3(a, b):
        inv_rot_t = _conj_cm(a.rotation.T)
        rot = quat._mul_cm(inv_rot_t, b.rotation.T)
        tr = inv_s[None, :] * quat._mul_vec_cm(
            inv_rot_t, (b.translation - a.translation).T)
        return Sim(rot.T, tr.T, inv_s * b.scale)
    inv_rot = r.inv(a.rotation)
    return Sim(
        r.mul(inv_rot, b.rotation),
        inv_s[..., None] * r.mul_vec(inv_rot, b.translation - a.translation),
        inv_s * b.scale,
    )


def mul_pt(a: Sim, p: jax.Array) -> jax.Array:
    if a.cm:  # p is a tuple of [N] component rows
        rt = quat._mul_vec_soa(a.rotation, p)
        return tuple(a.scale * r + t for r, t in zip(rt, a.translation))
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
            "sim_to_cm": to_cm,
            "sim_from_cm": from_cm,
            "sim_normalize_rotation": normalize_rotation,
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
