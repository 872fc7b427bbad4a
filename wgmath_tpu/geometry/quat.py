"""Batched quaternion algebra (≙ wgebra WgQuat, geometry/quat.rs:7 + quat.wgsl:1-136).

Quaternions are ``[..., 4]`` arrays in **xyzw** order (nalgebra/parry
convention, which the reference's GPU structs mirror). Every function is
elementwise over leading batch axes and traces cleanly into Pallas kernels —
the TPU equivalent of a composable WGSL module. 1M-element batches are
benchmark config #2 (BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module


def identity(batch_shape=()) -> jax.Array:
    q = jnp.zeros(batch_shape + (4,), jnp.float32)
    return q.at[..., 3].set(1.0)


def from_scaled_axis(v: jax.Array) -> jax.Array:
    """Exponential map: rotation of angle |v| about axis v/|v| (3→4)."""
    angle = jnp.linalg.norm(v, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sin(x)/x is 1 - x²/6 + O(x⁴); switch to the series near 0.
    small = angle < 1e-6
    sinc_half = jnp.where(small, 0.5 - angle * angle / 48.0,
                          jnp.sin(half) / jnp.maximum(angle, 1e-30))
    xyz = v * sinc_half
    w = jnp.cos(half)
    return jnp.concatenate([xyz, w], axis=-1)


def to_scaled_axis(q: jax.Array) -> jax.Array:
    """Logarithmic map (inverse of from_scaled_axis), for unit quaternions."""
    w = jnp.clip(q[..., 3:4], -1.0, 1.0)
    xyz = q[..., :3]
    n = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(n, w)
    scale = jnp.where(n < 1e-9, 2.0, angle / jnp.maximum(n, 1e-30))
    return xyz * scale


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b."""
    ax, ay, az, aw = (a[..., i] for i in range(4))
    bx, by, bz, bw = (b[..., i] for i in range(4))
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


def inv(q: jax.Array) -> jax.Array:
    """Inverse for unit quaternions (= conjugate)."""
    return conj(q)


def normalize(q: jax.Array) -> jax.Array:
    return q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-30)


def mul_vec(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by unit quaternion q: v + 2 w (u×v) + 2 u×(u×v).

    Large flat batches take a component-major path: [N, 3/4] arrays put the
    3/4-wide component axis on the TPU's 128-lane minor dimension, wasting
    125/128 lanes of every VPU op. Transposing to [3/4, N] at the boundary
    runs the arithmetic at full lane occupancy — and in chained pipelines XLA
    cancels adjacent out/in transposes, leaving pure component-major compute
    (measured 5.96 → 12.95 Gop/s at 1M on v5e).
    """
    if q.ndim == 2 and v.ndim == 2 and v.shape[0] >= 32768:
        qt = q.T
        vt = v.T
        ux, uy, uz, w = qt[0], qt[1], qt[2], qt[3]
        vx, vy, vz = vt[0], vt[1], vt[2]
        cx = uy * vz - uz * vy
        cy = uz * vx - ux * vz
        cz = ux * vy - uy * vx
        dx = uy * cz - uz * cy
        dy = uz * cx - ux * cz
        dz = ux * cy - uy * cx
        return jnp.stack([vx + 2.0 * (w * cx + dx),
                          vy + 2.0 * (w * cy + dy),
                          vz + 2.0 * (w * cz + dz)]).T
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def inv_mul_vec(q: jax.Array, v: jax.Array) -> jax.Array:
    return mul_vec(conj(q), v)


def to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion → rotation matrix ``[..., 3, 3]``."""
    x, y, z, w = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    rows = [
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def from_matrix(r: jax.Array) -> jax.Array:
    """Rotation matrix ``[..., 3, 3]`` → unit quaternion (Shepperd's method,
    branch-free via jnp.where for TPU)."""
    m = r
    t = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]

    # four candidate constructions; pick the numerically best per element
    def cand_w():
        s = jnp.sqrt(jnp.maximum(1.0 + t, 1e-12)) * 2
        return jnp.stack([(m[..., 2, 1] - m[..., 1, 2]) / s,
                          (m[..., 0, 2] - m[..., 2, 0]) / s,
                          (m[..., 1, 0] - m[..., 0, 1]) / s,
                          0.25 * s], axis=-1)

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2], 1e-12)) * 2
        return jnp.stack([0.25 * s,
                          (m[..., 0, 1] + m[..., 1, 0]) / s,
                          (m[..., 0, 2] + m[..., 2, 0]) / s,
                          (m[..., 2, 1] - m[..., 1, 2]) / s], axis=-1)

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2], 1e-12)) * 2
        return jnp.stack([(m[..., 0, 1] + m[..., 1, 0]) / s,
                          0.25 * s,
                          (m[..., 1, 2] + m[..., 2, 1]) / s,
                          (m[..., 0, 2] - m[..., 2, 0]) / s], axis=-1)

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2], 1e-12)) * 2
        return jnp.stack([(m[..., 0, 2] + m[..., 2, 0]) / s,
                          (m[..., 1, 2] + m[..., 2, 1]) / s,
                          0.25 * s,
                          (m[..., 1, 0] - m[..., 0, 1]) / s], axis=-1)

    d = jnp.stack([m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]], axis=-1)
    big = jnp.argmax(d, axis=-1)
    use_w = (t > 0.0)[..., None]
    by_diag = jnp.where(
        (big == 0)[..., None], cand_x(),
        jnp.where((big == 1)[..., None], cand_y(), cand_z()))
    return normalize(jnp.where(use_w, cand_w(), by_diag))


def slerp(a: jax.Array, b: jax.Array, t) -> jax.Array:
    """Spherical linear interpolation (shortest arc)."""
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(d < 0, -b, b)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    lin = normalize(a * (1 - t) + b * t)  # fallback when nearly parallel
    wa = jnp.sin((1 - t) * theta) / jnp.maximum(sin_theta, 1e-30)
    wb = jnp.sin(t * theta) / jnp.maximum(sin_theta, 1e-30)
    sph = a * wa + b * wb
    return jnp.where(sin_theta < 1e-5, lin, sph)


register_module(
    KernelModule(
        "geometry.quat",
        provides={
            "quat_identity": identity,
            "quat_from_scaled_axis": from_scaled_axis,
            "quat_to_scaled_axis": to_scaled_axis,
            "quat_mul": mul,
            "quat_conj": conj,
            "quat_inv": inv,
            "quat_normalize": normalize,
            "quat_mul_vec": mul_vec,
            "quat_inv_mul_vec": inv_mul_vec,
            "quat_to_matrix": to_matrix,
            "quat_from_matrix": from_matrix,
            "quat_slerp": slerp,
        },
        entries={
            "rotate_batch": EntryPoint(
                fn=lambda q, v: mul_vec(normalize(q), v),
                example_args=lambda: (
                    jnp.ones((1024, 4), jnp.float32),
                    jnp.ones((1024, 3), jnp.float32),
                ),
            )
        },
        doc="Composable quaternion ops (≙ wgebra geometry/quat.wgsl).",
    )
)
