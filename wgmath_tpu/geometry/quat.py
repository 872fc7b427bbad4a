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


def _mul_cm(a_t: jax.Array, b_t: jax.Array) -> jax.Array:
    """Hamilton product on component-major ``[4, N]`` operands → ``[4, N]``."""
    ax, ay, az, aw = a_t[0], a_t[1], a_t[2], a_t[3]
    bx, by, bz, bw = b_t[0], b_t[1], b_t[2], b_t[3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ])


# minimum flat-batch size for the component-major fast paths: below this the
# boundary transposes cost more than the lane-occupancy win
_CM_MIN_BATCH = 32768


def _mul_soa(a, b):
    """Hamilton product on tuples of component rows (fully fusible SoA)."""
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz)


def _mul_vec_soa(q, v):
    """Rotate a tuple-of-rows vector by a tuple-of-rows unit quaternion."""
    ux, uy, uz, w = q
    vx, vy, vz = v
    cx = uy * vz - uz * vy
    cy = uz * vx - ux * vz
    cz = ux * vy - uy * vx
    dx = uy * cz - uz * cy
    dy = uz * cx - ux * cz
    dz = ux * cy - uy * cx
    return (vx + 2.0 * (w * cx + dx),
            vy + 2.0 * (w * cy + dy),
            vz + 2.0 * (w * cz + dz))


def _conj_soa(q):
    ux, uy, uz, w = q
    return (-ux, -uy, -uz, w)


def _mul_vec_cm(q_t: jax.Array, v_t: jax.Array) -> jax.Array:
    """Rotate component-major ``[3, N]`` vectors by ``[4, N]`` unit quats."""
    ux, uy, uz, w = q_t[0], q_t[1], q_t[2], q_t[3]
    vx, vy, vz = v_t[0], v_t[1], v_t[2]
    cx = uy * vz - uz * vy
    cy = uz * vx - ux * vz
    cz = ux * vy - uy * vx
    dx = uy * cz - uz * cy
    dy = uz * cx - ux * cz
    dz = ux * cy - uy * cx
    return jnp.stack([vx + 2.0 * (w * cx + dx),
                      vy + 2.0 * (w * cy + dy),
                      vz + 2.0 * (w * cz + dz)])


def _cm_eligible(*arrs) -> bool:
    return all(a.ndim == 2 for a in arrs) and arrs[0].shape[0] >= _CM_MIN_BATCH


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b.

    Large flat batches go component-major (see ``mul_vec``): ``[N, 4]``
    puts the 4-wide component axis on the 128-lane minor dim, wasting
    124/128 lanes; transposing at the boundary runs the products at full
    occupancy, and chained pipelines cancel adjacent transposes.
    """
    if _cm_eligible(a, b):
        return _mul_cm(a.T, b.T).T
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
    if _cm_eligible(q):
        qt = q.T
        inv_n = jax.lax.rsqrt(qt[0] * qt[0] + qt[1] * qt[1]
                              + qt[2] * qt[2] + qt[3] * qt[3] + 1e-30)
        return (qt * inv_n).T
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
    if q.ndim == 2 and v.ndim == 2 and v.shape[0] >= _CM_MIN_BATCH:
        return _mul_vec_cm(q.T, v.T).T
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def inv_mul_vec(q: jax.Array, v: jax.Array) -> jax.Array:
    return mul_vec(conj(q), v)


def split_soa(arr: jax.Array) -> tuple:
    """``[N, C]`` → tuple of C ``[N]`` component rows (TPU-native SoA).

    For CHAINED elementwise pipelines, tuples of rows are the fast layout:
    every stacked-array op boundary re-materializes a ``[N, C]`` (or
    ``[C, N]``) buffer that XLA will not fuse through (a jnp.stack is a
    concat), costing ~4x on v5e for the 1M rotate chain. Convert once,
    chain with the ``*_soa`` ops, merge at the end.
    """
    return tuple(arr[:, i] for i in range(arr.shape[1]))


def merge_soa(rows: tuple) -> jax.Array:
    """Inverse of :func:`split_soa`."""
    return jnp.stack(rows, axis=-1)


def mul_vec_soa(q: tuple, v: tuple) -> tuple:
    """SoA rotate: tuple-of-rows quaternion x tuple-of-rows vectors."""
    return _mul_vec_soa(q, v)


def mul_soa(a: tuple, b: tuple) -> tuple:
    """SoA Hamilton product on tuples of component rows."""
    return _mul_soa(a, b)


def normalize_soa(q: tuple) -> tuple:
    x, y, z, w = q
    inv_n = jax.lax.rsqrt(x * x + y * y + z * z + w * w + 1e-30)
    return (x * inv_n, y * inv_n, z * inv_n, w * inv_n)


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
