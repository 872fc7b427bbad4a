"""Impulse joints: generic 6-DoF (3-DoF in 2D) joints with locked / limited /
motorized / coupled axes (≙ wgrapier dynamics/joint.rs:96-464 +
joint.wgsl + joint_constraint_builder.wgsl — the largest WGSL file in the
reference).

TPU-native redesign:
- The reference packs a *variable-length* element list per joint (up to
  SPATIAL_DIM) built by per-thread control flow. Here every possible element
  has a FIXED slot — [angular motors | linear motors] (group 1, orthogonalized
  together) and [angular locks | linear locks | angular limits | linear
  limits] (group 2) — with an ``active`` mask. Masked slots are no-ops in the
  solver and are skipped by the Gram-Schmidt orthogonalization, preserving
  the reference's element ordering semantics with zero divergence.
- The reference colors the joint graph greedily on the CPU at build time
  (joint.rs:228-290, u128 color masks + bucket sort); we do the same in
  NumPy at ``JointSet`` construction — joints are persistent topology, so a
  host-side pass at build is the right cost model on TPU too.
- The per-color solve loop becomes a ``fori_loop`` with masked scatter-adds
  (same scheme as the contact solver).

Axis bit order (3D): bits 0..2 = linear x/y/z, bits 3..5 = angular x/y/z.
2D: bits 0..1 linear, bit 2 angular.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util

from wgmath_tpu.dynamics.body import Velocity, WorldMassProperties
from wgmath_tpu.dynamics.constraint import gdot, ii_mul
from wgmath_tpu.dynamics.sim_params import SimParams
from wgmath_tpu.geometry import quat, rot2
from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.geometry.sim import Sim

MAX = 1.0e20
ACCELERATION_BASED = 0
FORCE_BASED = 1


def spatial_dim(dim: int) -> int:
    return 6 if dim == 3 else 3


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class JointSet:
    """SoA impulse joints (≙ GpuImpulseJointSet, joint.rs:200)."""

    body_a: jax.Array  # i32 [J]
    body_b: jax.Array  # i32 [J]
    local_frame_a: Sim  # [J]
    local_frame_b: Sim  # [J]
    locked_axes: jax.Array  # i32 [J] bitmask
    limit_axes: jax.Array
    motor_axes: jax.Array
    coupled_axes: jax.Array
    limit_min: jax.Array  # [J, S]
    limit_max: jax.Array  # [J, S]
    motor_target_vel: jax.Array  # [J, S]
    motor_target_pos: jax.Array  # [J, S]
    motor_stiffness: jax.Array  # [J, S]
    motor_damping: jax.Array  # [J, S]
    motor_max_force: jax.Array  # [J, S]
    motor_model: jax.Array  # i32 [J, S]
    valid: jax.Array  # bool [J]
    colors: jax.Array  # i32 [J] — CPU greedy coloring at build

    def tree_flatten(self):
        fields = dataclasses.fields(self)
        return tuple(getattr(self, f.name) for f in fields), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_joints(self):
        return self.body_a.shape[0]

    @property
    def dim(self):
        return self.local_frame_a.translation.shape[-1]


def _greedy_color(body_a: np.ndarray, body_b: np.ndarray,
                  valid: np.ndarray, dynamic: np.ndarray) -> np.ndarray:
    """CPU greedy joint coloring (≙ joint.rs:228-290): two joints sharing a
    dynamic body get different colors; colors start at 1."""
    n = len(body_a)
    colors = np.zeros(n, np.int32)
    body_masks: dict[int, int] = {}
    for j in range(n):
        if not valid[j]:
            continue
        used = 0
        for b in (int(body_a[j]), int(body_b[j])):
            if dynamic[b]:
                used |= body_masks.get(b, 0)
        c = 1
        while used & (1 << (c - 1)):
            c += 1
        colors[j] = c
        for b in (int(body_a[j]), int(body_b[j])):
            if dynamic[b]:
                body_masks[b] = body_masks.get(b, 0) | (1 << (c - 1))
    return colors


def make_joint_set(body_a, body_b, local_frame_a: Sim, local_frame_b: Sim,
                   *, locked_axes, limit_axes=None, motor_axes=None,
                   coupled_axes=None, limit_min=None, limit_max=None,
                   motor_target_vel=None, motor_target_pos=None,
                   motor_stiffness=None, motor_damping=None,
                   motor_max_force=None, motor_model=None,
                   dynamic_mask=None) -> JointSet:
    body_a = np.asarray(body_a, np.int32)
    j = len(body_a)
    dim = local_frame_a.translation.shape[-1]
    s = spatial_dim(dim)

    def arr(x, default, shape=(j,)):
        if x is None:
            return jnp.full(shape, default)
        return jnp.asarray(x)

    locked = np.asarray(locked_axes, np.int32)
    valid = np.ones(j, bool)
    dyn = (np.ones(int(max(np.max(body_a), np.max(body_b))) + 1, bool)
           if dynamic_mask is None else np.asarray(dynamic_mask))
    from wgmath_tpu import native

    colors = native.greedy_color(body_a, np.asarray(body_b, np.int32), dyn,
                                 valid)
    return JointSet(
        jnp.asarray(body_a), jnp.asarray(body_b, jnp.int32),
        local_frame_a, local_frame_b,
        jnp.asarray(locked),
        arr(limit_axes, 0).astype(jnp.int32),
        arr(motor_axes, 0).astype(jnp.int32),
        arr(coupled_axes, 0).astype(jnp.int32),
        arr(limit_min, -MAX, (j, s)).astype(jnp.float32),
        arr(limit_max, MAX, (j, s)).astype(jnp.float32),
        arr(motor_target_vel, 0.0, (j, s)).astype(jnp.float32),
        arr(motor_target_pos, 0.0, (j, s)).astype(jnp.float32),
        arr(motor_stiffness, 0.0, (j, s)).astype(jnp.float32),
        arr(motor_damping, 0.0, (j, s)).astype(jnp.float32),
        arr(motor_max_force, MAX, (j, s)).astype(jnp.float32),
        arr(motor_model, ACCELERATION_BASED, (j, s)).astype(jnp.int32),
        jnp.asarray(valid),
        jnp.asarray(colors),
    )


# -- joint type constructors (≙ rapier's typed joint builders) -----------------


def _frames_at_anchor(poses_np, body_a, body_b, anchors_a, anchors_b, axes=None,
                      dim=3):
    n = len(body_a)
    if dim == 3:
        if axes is None:
            rot = jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (n, 1))
        else:
            rot = _quat_from_x_axis(jnp.asarray(axes, jnp.float32))
    else:
        if axes is None:
            rot = jnp.tile(jnp.asarray([1.0, 0.0]), (n, 1))
        else:
            # rot2 [cos, sin] rotating +x onto the (unit) axis
            ax = jnp.asarray(axes, jnp.float32)
            rot = ax / jnp.linalg.norm(ax, axis=-1, keepdims=True)
    fa = Sim(rot, jnp.asarray(anchors_a, jnp.float32), jnp.ones((n,)))
    fb = Sim(rot, jnp.asarray(anchors_b, jnp.float32), jnp.ones((n,)))
    return fa, fb


def _quat_from_x_axis(axis: jax.Array) -> jax.Array:
    """Quaternion rotating +x onto ``axis`` (unit)."""
    x = jnp.zeros_like(axis).at[..., 0].set(1.0)
    d = jnp.sum(x * axis, -1)
    c = jnp.cross(x, axis)
    w = 1.0 + d
    q = jnp.concatenate([c, w[..., None]], axis=-1)
    # antiparallel fallback: 180° about y
    q = jnp.where((w < 1e-6)[..., None],
                  jnp.asarray([0.0, 1.0, 0.0, 0.0]), q)
    return quat.normalize(q)


def fixed_joints(body_a, body_b, anchors_a, anchors_b, *, dim=3,
                 dynamic_mask=None) -> JointSet:
    """All axes locked (≙ rapier FixedJoint)."""
    n = len(body_a)
    fa, fb = _frames_at_anchor(None, body_a, body_b, anchors_a, anchors_b,
                               dim=dim)
    mask = (1 << spatial_dim(dim)) - 1
    return make_joint_set(body_a, body_b, fa, fb,
                          locked_axes=np.full(n, mask, np.int32),
                          dynamic_mask=dynamic_mask)


def spherical_joints(body_a, body_b, anchors_a, anchors_b, *,
                     swing_limit=None, dynamic_mask=None) -> JointSet:
    """Ball-and-socket: linear axes locked, rotation free (≙ SphericalJoint).

    ``swing_limit``: optional cone half-angle (radians) about the joint
    frame's +x — a COUPLED angular limit over the y/z angular axes (the
    reference stubs this out; implemented here)."""
    n = len(body_a)
    fa, fb = _frames_at_anchor(None, body_a, body_b, anchors_a, anchors_b)
    kw = {}
    if swing_limit is not None:
        kw["coupled_axes"] = np.full(n, 0b110000, np.int32)
        kw["limit_axes"] = np.full(n, 1 << 4, np.int32)
        lmin = np.full((n, 6), -MAX, np.float32)
        lmax = np.full((n, 6), MAX, np.float32)
        lmin[:, 4] = -swing_limit
        lmax[:, 4] = swing_limit
        kw["limit_min"] = lmin
        kw["limit_max"] = lmax
    return make_joint_set(body_a, body_b, fa, fb,
                          locked_axes=np.full(n, 0b000111, np.int32),
                          dynamic_mask=dynamic_mask, **kw)


def revolute_joints(body_a, body_b, anchors_a, anchors_b, axes=None, *,
                    limits=None, motor_vel=None, motor_damping: float = 1.0,
                    dim=3, dynamic_mask=None) -> JointSet:
    """Hinge about ``axes`` (joint-frame +x): locks everything except angular
    x (≙ RevoluteJoint). Optional rotation ``limits`` (min,max) and velocity
    motor. In 2D the hinge axis is implicit (out of plane — rapier2d's
    RevoluteJoint): linear x/y locked, the single angular axis free."""
    n = len(body_a)
    if dim == 2:
        fa, fb = _frames_at_anchor(None, body_a, body_b, anchors_a,
                                   anchors_b, dim=2)
        locked = np.full(n, 0b011, np.int32)  # free: angular (bit 2)
        kw = {}
        if limits is not None:
            kw["limit_axes"] = np.full(n, 1 << 2, np.int32)
            lmin = np.full((n, 3), -MAX, np.float32)
            lmax = np.full((n, 3), MAX, np.float32)
            lmin[:, 2] = limits[0]
            lmax[:, 2] = limits[1]
            kw["limit_min"] = lmin
            kw["limit_max"] = lmax
        if motor_vel is not None:
            kw["motor_axes"] = np.full(n, 1 << 2, np.int32)
            tv = np.zeros((n, 3), np.float32)
            tv[:, 2] = motor_vel
            kw["motor_target_vel"] = tv
            damp = np.zeros((n, 3), np.float32)
            damp[:, 2] = motor_damping
            kw["motor_damping"] = damp
        return make_joint_set(body_a, body_b, fa, fb, locked_axes=locked,
                              dynamic_mask=dynamic_mask, **kw)
    assert axes is not None, "3D revolute joints need hinge axes"
    fa, fb = _frames_at_anchor(None, body_a, body_b, anchors_a, anchors_b,
                               axes=axes)
    locked = np.full(n, 0b110111, np.int32)  # free: angular x (bit 3)
    kw = {}
    if limits is not None:
        kw["limit_axes"] = np.full(n, 1 << 3, np.int32)
        lmin = np.full((n, 6), -MAX, np.float32)
        lmax = np.full((n, 6), MAX, np.float32)
        lmin[:, 3] = limits[0]
        lmax[:, 3] = limits[1]
        kw["limit_min"] = lmin
        kw["limit_max"] = lmax
    if motor_vel is not None:
        kw["motor_axes"] = np.full(n, 1 << 3, np.int32)
        tv = np.zeros((n, 6), np.float32)
        tv[:, 3] = motor_vel
        kw["motor_target_vel"] = tv
        damp = np.zeros((n, 6), np.float32)
        # acceleration-based damping: the motor's time constant is
        # I_pivot / (I_com · damping) — raise damping for snappy motors
        damp[:, 3] = motor_damping
        kw["motor_damping"] = damp
    return make_joint_set(body_a, body_b, fa, fb, locked_axes=locked,
                          dynamic_mask=dynamic_mask, **kw)


def prismatic_joints(body_a, body_b, anchors_a, anchors_b, axes, *,
                     limits=None, dim=3, dynamic_mask=None) -> JointSet:
    """Slider along ``axes``: everything locked except linear x
    (≙ PrismaticJoint, 2D and 3D — the joint frame rotates +x onto the
    slide axis in either dimension)."""
    n = len(body_a)
    s = spatial_dim(dim)
    fa, fb = _frames_at_anchor(None, body_a, body_b, anchors_a, anchors_b,
                               axes=axes, dim=dim)
    # free: linear x (bit 0); everything else locked
    locked = np.full(n, ((1 << s) - 1) & ~1, np.int32)
    kw = {}
    if limits is not None:
        kw["limit_axes"] = np.full(n, 1, np.int32)
        lmin = np.full((n, s), -MAX, np.float32)
        lmax = np.full((n, s), MAX, np.float32)
        lmin[:, 0] = limits[0]
        lmax[:, 0] = limits[1]
        kw["limit_min"] = lmin
        kw["limit_max"] = lmax
    return make_joint_set(body_a, body_b, fa, fb, locked_axes=locked,
                          dynamic_mask=dynamic_mask, **kw)


# ---------------------------------------------------------------------------
# Constraint building (≙ joint_constraint_builder.wgsl update_constraint)
# ---------------------------------------------------------------------------
#
# Fixed slot layout, 3D (E = 18):
#   group 1 (motors, orthogonalized together):
#     slots 0..2  angular motors (axes 3..5)
#     slots 3..5  linear motors (axes 0..2); a coupled linear motor occupies
#                 the slot of the first coupled axis
#   group 2 (locks + limits):
#     slots 6..8   angular locks
#     slots 9..11  linear locks
#     slots 12..14 angular limits
#     slots 15..17 linear limits (coupled limit → slot of first coupled axis)

NUM_SLOTS_3D = 18
GROUP1_END = 6


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class JointConstraints:
    """Per-joint constraint elements in fixed slots (≙ GpuJointConstraint)."""

    body_a: jax.Array  # i32 [J]
    body_b: jax.Array  # i32 [J]
    im_a: jax.Array  # [J, dim]
    im_b: jax.Array  # [J, dim]
    active: jax.Array  # bool [J, E]
    lin_jac: jax.Array  # [J, E, dim]
    ang_jac_a: jax.Array  # [J, E, 3] (3D)
    ang_jac_b: jax.Array
    ii_ang_jac_a: jax.Array
    ii_ang_jac_b: jax.Array
    inv_lhs: jax.Array  # [J, E]
    rhs: jax.Array
    rhs_wo_bias: jax.Array
    cfm_gain: jax.Array
    cfm_coeff: jax.Array
    bounds_min: jax.Array  # [J, E]
    bounds_max: jax.Array
    impulse: jax.Array  # [J, E]
    valid: jax.Array  # bool [J]

    def tree_flatten(self):
        fields = dataclasses.fields(self)
        return tuple(getattr(self, f.name) for f in fields), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _motor_params(jset: JointSet, axis: int, dt: float):
    """≙ joint.wgsl motor_params."""
    stiff = jset.motor_stiffness[:, axis]
    damp = jset.motor_damping[:, axis]
    denom_e = dt * stiff + damp
    erp_inv_dt = stiff * jnp.where(denom_e == 0, 0.0, 1.0 / jnp.where(denom_e == 0, 1.0, denom_e))
    denom_c = dt * dt * stiff + dt * damp
    inv_c = jnp.where(denom_c == 0, 0.0, 1.0 / jnp.where(denom_c == 0, 1.0, denom_c))
    accel = jset.motor_model[:, axis] == ACCELERATION_BASED
    cfm_coeff = jnp.where(accel, inv_c, 0.0)
    cfm_gain = jnp.where(accel, 0.0, inv_c)
    return {
        "erp_inv_dt": erp_inv_dt,
        "cfm_coeff": cfm_coeff,
        "cfm_gain": cfm_gain,
        "target_pos": jset.motor_target_pos[:, axis],
        "target_vel": jset.motor_target_vel[:, axis],
        "max_impulse": jset.motor_max_force[:, axis] * dt,
    }


def _smallest_angle_diff(a, b):
    s_err = a - b
    comp = s_err - jnp.sign(s_err) * 2.0 * jnp.pi
    return jnp.where(jnp.abs(s_err) < jnp.abs(comp), s_err, comp)


def _pseudo_inv(x):
    return jnp.where(x == 0.0, 0.0, 1.0 / jnp.where(x == 0.0, 1.0, x))


def _diff_conj1_2(a: jax.Array, b: jax.Array) -> jax.Array:
    """0.5·(v1 v2ᵀ + w1 w2 I − [v1 w2 + v2 w1]× + [v1]× [v2]×)
    (≙ wgebra quat.wgsl diff_conj1_2)."""
    v1, w1 = a[..., :3], a[..., 3]
    v2, w2 = b[..., :3], b[..., 3]

    def cross_mat(v):
        z = jnp.zeros_like(v[..., 0])
        return jnp.stack([
            jnp.stack([z, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], z, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], z], -1),
        ], -2)

    outer = v1[..., :, None] * v2[..., None, :]
    eye = jnp.eye(3, dtype=a.dtype)
    return 0.5 * (outer + (w1 * w2)[..., None, None] * eye
                  - cross_mat(v1 * w2[..., None] + v2 * w1[..., None])
                  + jnp.einsum("...ij,...jk->...ik", cross_mat(v1), cross_mat(v2)))


def build_joint_constraints(jset: JointSet, poses: Sim,
                            mprops: WorldMassProperties,
                            params: SimParams) -> JointConstraints:
    """Vectorized constraint (re)build — runs once per substep, matching the
    reference's full-rebuild `update` kernel. Dispatches to the 2D variant
    (scalar angular algebra, S=3 slots) for planar worlds."""
    if jset.dim != 3:
        return _build_joint_constraints_2d(jset, poses, mprops, params)
    j = jset.num_joints
    e = NUM_SLOTS_3D
    ba, bb = jset.body_a, jset.body_b
    pose1 = Sim(poses.rotation[ba], poses.translation[ba], poses.scale[ba])
    pose2 = Sim(poses.rotation[bb], poses.translation[bb], poses.scale[bb])
    frame1 = sim_ops.mul(pose1, jset.local_frame_a)
    frame2 = sim_ops.mul(pose2, jset.local_frame_b)
    com1, com2 = mprops.com[ba], mprops.com[bb]
    im1, im2 = mprops.inv_mass[ba], mprops.inv_mass[bb]
    ii1, ii2 = mprops.inv_inertia[ba], mprops.inv_inertia[bb]

    q1, q2 = frame1.rotation, frame2.rotation
    basis = quat.to_matrix(q1)  # columns = joint axes in world
    lin_err = frame2.translation - frame1.translation

    # snap the anchor along free linear axes (≙ new_helper's re-centering)
    locked = jset.locked_axes
    t1 = frame2.translation
    for i in range(3):
        axis = basis[..., :, i]
        has = (locked & (1 << i)) != 0
        t1 = t1 - jnp.where(has[:, None],
                            axis * jnp.sum(axis * lin_err, -1, keepdims=True),
                            0.0)
    r1 = t1 - com1
    r2 = frame2.translation - com2

    def cr(r, m):  # r × (each column of m)
        return jnp.stack([jnp.cross(r, m[..., :, i]) for i in range(3)], -1)

    cmat1_basis = cr(r1, basis)
    cmat2_basis = cr(r2, basis)

    sgn = jnp.where(jnp.sum(q1 * q2, -1) > 0.0, 1.0, -1.0)
    ang_basis = jnp.swapaxes(_diff_conj1_2(q1, q2), -1, -2) * sgn[:, None, None]
    ang_err = quat.mul(quat.inv(q1), q2) * sgn[:, None]

    erp_inv_dt = params.joint_erp_inv_dt
    cfm_coeff_j = params.joint_cfm_coeff
    inv_dt = params.inv_dt

    zeros3 = jnp.zeros((j, 3), jnp.float32)
    zeros = jnp.zeros((j,), jnp.float32)

    # slot accumulators
    def empty(shape_tail=()):
        return jnp.zeros((j, e) + shape_tail, jnp.float32)

    active = jnp.zeros((j, e), bool)
    lin_jac = empty((3,))
    ang_a = empty((3,))
    ang_b = empty((3,))
    rhs = empty()
    rhs_wo = empty()
    cfm_c = empty()
    cfm_g = empty()
    bmin = jnp.full((j, e), -MAX, jnp.float32)
    bmax = jnp.full((j, e), MAX, jnp.float32)

    motor_mask = jset.motor_axes & ~locked
    limit_mask = jset.limit_axes & ~locked
    coupled = jset.coupled_axes
    lin_coupled_mask = coupled & 0b111
    has_lin_coupling = lin_coupled_mask != 0
    # first coupled linear axis id (count trailing zeros over 3 bits)
    fcl = jnp.where((lin_coupled_mask & 1) != 0, 0,
                    jnp.where((lin_coupled_mask & 2) != 0, 1, 2))

    def put(slot, act, lj, aa, ab, r, rw, cc, cg, lo, hi):
        nonlocal active, lin_jac, ang_a, ang_b, rhs, rhs_wo, cfm_c, cfm_g, bmin, bmax
        active = active.at[:, slot].set(act)
        lin_jac = lin_jac.at[:, slot].set(jnp.where(act[:, None], lj, 0.0))
        ang_a = ang_a.at[:, slot].set(jnp.where(act[:, None], aa, 0.0))
        ang_b = ang_b.at[:, slot].set(jnp.where(act[:, None], ab, 0.0))
        rhs = rhs.at[:, slot].set(jnp.where(act, r, 0.0))
        rhs_wo = rhs_wo.at[:, slot].set(jnp.where(act, rw, 0.0))
        cfm_c = cfm_c.at[:, slot].set(jnp.where(act, cc, 0.0))
        cfm_g = cfm_g.at[:, slot].set(jnp.where(act, cg, 0.0))
        bmin = bmin.at[:, slot].set(jnp.where(act, lo, -MAX))
        bmax = bmax.at[:, slot].set(jnp.where(act, hi, MAX))

    # ---- group 1: motors -----------------------------------------------------
    for i in range(3):  # angular motors (axes 3+i) → slots 0..2
        bit = 1 << (3 + i)
        act = ((motor_mask & ~coupled) & bit) != 0
        mp = _motor_params(jset, 3 + i, params.dt)
        aj = basis[..., :, i]
        clamped = jnp.clip(ang_err[:, i], -1.0, 1.0)
        ang_dist = jnp.arcsin(clamped) * 2.0
        r_wo = (_smallest_angle_diff(ang_dist, mp["target_pos"])
                * mp["erp_inv_dt"]) - mp["target_vel"]
        put(i, act, zeros3, aj, aj, r_wo, r_wo, mp["cfm_coeff"],
            mp["cfm_gain"], -mp["max_impulse"], mp["max_impulse"])

    for i in range(3):  # linear motors (axes i) → slots 3..5
        bit = 1 << i
        per_axis = ((motor_mask & ~coupled) & bit) != 0
        is_coupled_slot = has_lin_coupling & (fcl == i) & \
            (((motor_mask & coupled) & 0b111) != 0)
        mp = _motor_params(jset, i, params.dt)

        # per-axis jacobians
        lj_axis = basis[..., :, i]
        aa_axis = cmat1_basis[..., :, i]
        ab_axis = cmat2_basis[..., :, i]
        dist_axis = jnp.sum(lin_err * lj_axis, -1)

        # coupled jacobians
        lj_c = jnp.zeros_like(lj_axis)
        aa_c = jnp.zeros_like(aa_axis)
        ab_c = jnp.zeros_like(ab_axis)
        for k in range(3):
            sel = ((coupled & (1 << k)) != 0)[:, None]
            coeff = jnp.sum(basis[..., :, k] * lin_err, -1, keepdims=True)
            lj_c = lj_c + jnp.where(sel, basis[..., :, k] * coeff, 0.0)
            aa_c = aa_c + jnp.where(sel, cmat1_basis[..., :, k] * coeff, 0.0)
            ab_c = ab_c + jnp.where(sel, cmat2_basis[..., :, k] * coeff, 0.0)
        dist_c = jnp.linalg.norm(lj_c, axis=-1)
        inv_d = _pseudo_inv(dist_c)
        lj_c = lj_c * inv_d[:, None]
        aa_c = aa_c * inv_d[:, None]
        ab_c = ab_c * inv_d[:, None]

        use_c = is_coupled_slot
        lj = jnp.where(use_c[:, None], lj_c, lj_axis)
        aa = jnp.where(use_c[:, None], aa_c, aa_axis)
        ab = jnp.where(use_c[:, None], ab_c, ab_axis)
        dist = jnp.where(use_c, dist_c, dist_axis)

        has_lim = (limit_mask & bit) != 0
        lo_l = jnp.where(has_lim, jset.limit_min[:, i], -MAX)
        hi_l = jnp.where(has_lim, jset.limit_max[:, i], MAX)
        target_vel = jnp.where(
            has_lim,
            jnp.clip(mp["target_vel"], (lo_l - dist) * inv_dt,
                     (hi_l - dist) * inv_dt),
            mp["target_vel"])
        r_wo = (dist - mp["target_pos"]) * mp["erp_inv_dt"] - target_vel

        act = per_axis | use_c
        put(3 + i, act, lj, aa, ab, r_wo, r_wo, mp["cfm_coeff"],
            mp["cfm_gain"], -mp["max_impulse"], mp["max_impulse"])

    # ---- group 2: locks ------------------------------------------------------
    for i in range(3):  # angular locks → slots 6..8
        bit = 1 << (3 + i)
        act = (locked & bit) != 0
        aj = ang_basis[..., :, i]
        r_bias = ang_err[:, i] * erp_inv_dt
        put(6 + i, act, zeros3, aj, aj, r_bias, zeros,
            jnp.full((j,), cfm_coeff_j), zeros, -MAX, MAX)

    for i in range(3):  # linear locks → slots 9..11
        bit = 1 << i
        act = (locked & bit) != 0
        lj = basis[..., :, i]
        r_bias = jnp.sum(lj * lin_err, -1) * erp_inv_dt
        put(9 + i, act, lj, cmat1_basis[..., :, i], cmat2_basis[..., :, i],
            r_bias, zeros, jnp.full((j,), cfm_coeff_j), zeros, -MAX, MAX)

    ang_coupled_mask = coupled & 0b111000
    has_ang_coupling = ang_coupled_mask != 0
    # first coupled angular axis id as 0..2 (count trailing zeros, bits 3..5)
    fca = jnp.where((ang_coupled_mask & 0b001000) != 0, 0,
                    jnp.where((ang_coupled_mask & 0b010000) != 0, 1, 2))

    for i in range(3):  # angular limits → slots 12..14
        bit = 1 << (3 + i)
        per_axis = ((limit_mask & ~coupled) & bit) != 0
        is_coupled_slot = has_ang_coupling & (fca == i) & \
            ((limit_mask & ang_coupled_mask) != 0)
        s_min = jnp.sin(jset.limit_min[:, 3 + i] * 0.5)
        s_max = jnp.sin(jset.limit_max[:, 3 + i] * 0.5)
        s_ang = ang_err[:, i]
        min_en = s_ang <= s_min
        max_en = s_max <= s_ang
        aj_axis = ang_basis[..., :, i]
        r_bias_axis = (jnp.maximum(s_ang - s_max, 0.0)
                       - jnp.maximum(s_min - s_ang, 0.0)) * erp_inv_dt

        # coupled angular limit (swing cone, max side only): the joint-space
        # error restricted to the coupled angular subspace; jacobian along
        # the swing direction (≙ the reference's stubbed
        # limit_angular_coupled, joint_constraint_builder.wgsl:334-348 —
        # implemented here, exceeding the reference's live surface)
        aj_c = jnp.zeros_like(aj_axis)
        s2_c = jnp.zeros_like(s_ang)
        for k in range(3):
            sel = ((coupled & (1 << (3 + k))) != 0)
            comp = jnp.where(sel, ang_err[:, k], 0.0)
            aj_c = aj_c + ang_basis[..., :, k] * comp[:, None]
            s2_c = s2_c + comp * comp
        s_c = jnp.sqrt(s2_c)
        aj_c = aj_c * _pseudo_inv(s_c)[:, None]
        r_wo_c = jnp.minimum(s_c - s_max, 0.0) * inv_dt
        r_bias_c = r_wo_c + jnp.maximum(s_c - s_max, 0.0) * erp_inv_dt

        use_c = is_coupled_slot
        act = per_axis | use_c
        aj = jnp.where(use_c[:, None], aj_c, aj_axis)
        r_all = jnp.where(use_c, r_bias_c, r_bias_axis)
        r_wo_all = jnp.where(use_c, r_wo_c, zeros)
        lo_b = jnp.where(use_c, 0.0, jnp.where(min_en, -MAX, 0.0))
        hi_b = jnp.where(use_c, MAX, jnp.where(max_en, MAX, 0.0))
        put(12 + i, act, zeros3, aj, aj, r_all, r_wo_all,
            jnp.full((j,), cfm_coeff_j), zeros, lo_b, hi_b)

    for i in range(3):  # linear limits → slots 15..17
        bit = 1 << i
        per_axis = ((limit_mask & ~coupled) & bit) != 0
        is_coupled_slot = has_lin_coupling & (fcl == i) & \
            (((limit_mask & coupled) & 0b111) != 0)
        lj_axis = basis[..., :, i]
        aa_axis = cmat1_basis[..., :, i]
        ab_axis = cmat2_basis[..., :, i]
        dist_axis = jnp.sum(lin_err * lj_axis, -1)
        lo_l = jset.limit_min[:, i]
        hi_l = jset.limit_max[:, i]

        # per-axis limit
        min_en = dist_axis <= lo_l
        max_en = hi_l <= dist_axis
        r_bias_axis = (jnp.maximum(dist_axis - hi_l, 0.0)
                       - jnp.maximum(lo_l - dist_axis, 0.0)) * erp_inv_dt

        # coupled limit (max side only, ≙ limit_linear_coupled)
        lj_c = jnp.zeros_like(lj_axis)
        aa_c = jnp.zeros_like(aa_axis)
        ab_c = jnp.zeros_like(ab_axis)
        for k in range(3):
            sel = ((coupled & (1 << k)) != 0)[:, None]
            coeff = jnp.sum(basis[..., :, k] * lin_err, -1, keepdims=True)
            lj_c = lj_c + jnp.where(sel, basis[..., :, k] * coeff, 0.0)
            aa_c = aa_c + jnp.where(sel, cmat1_basis[..., :, k] * coeff, 0.0)
            ab_c = ab_c + jnp.where(sel, cmat2_basis[..., :, k] * coeff, 0.0)
        dist_c = jnp.linalg.norm(lj_c, axis=-1)
        inv_d = _pseudo_inv(dist_c)
        lj_c = lj_c * inv_d[:, None]
        aa_c = aa_c * inv_d[:, None]
        ab_c = ab_c * inv_d[:, None]
        r_wo_c = jnp.minimum(dist_c - hi_l, 0.0) * inv_dt
        r_bias_c = r_wo_c + jnp.maximum(dist_c - hi_l, 0.0) * erp_inv_dt

        use_c = is_coupled_slot
        act = per_axis | use_c
        lj = jnp.where(use_c[:, None], lj_c, lj_axis)
        aa = jnp.where(use_c[:, None], aa_c, aa_axis)
        ab = jnp.where(use_c[:, None], ab_c, ab_axis)
        r_all = jnp.where(use_c, r_bias_c, r_bias_axis)
        r_wo_all = jnp.where(use_c, r_wo_c, zeros)
        lo_b = jnp.where(use_c, 0.0, jnp.where(min_en, -MAX, 0.0))
        hi_b = jnp.where(use_c, MAX, jnp.where(max_en, MAX, 0.0))
        put(15 + i, act, lj, aa, ab, r_all, r_wo_all,
            jnp.full((j,), cfm_coeff_j), zeros, lo_b, hi_b)

    cons = JointConstraints(
        body_a=ba, body_b=bb, im_a=im1, im_b=im2,
        active=active & jset.valid[:, None],
        lin_jac=lin_jac, ang_jac_a=ang_a, ang_jac_b=ang_b,
        ii_ang_jac_a=jnp.einsum("nij,nej->nei", ii1, ang_a),
        ii_ang_jac_b=jnp.einsum("nij,nej->nei", ii2, ang_b),
        inv_lhs=jnp.zeros((j, e), jnp.float32),
        rhs=rhs, rhs_wo_bias=rhs_wo, cfm_gain=cfm_g, cfm_coeff=cfm_c,
        bounds_min=bmin, bounds_max=bmax,
        impulse=jnp.zeros((j, e), jnp.float32),
        valid=jset.valid,
    )
    return _orthogonalize(cons)


def _orthogonalize(cons: JointConstraints) -> JointConstraints:
    """Masked modified Gram-Schmidt within the two slot groups
    (≙ orthogonalize_constraints, joint_constraint_builder.wgsl:854+)."""
    e = cons.active.shape[1]
    imsum = cons.im_a + cons.im_b
    lin = cons.lin_jac
    aa = cons.ang_jac_a
    ab = cons.ang_jac_b
    iia = cons.ii_ang_jac_a
    iib = cons.ii_ang_jac_b
    rhs = cons.rhs
    rhs_wo = cons.rhs_wo_bias
    cfm_gain = cons.cfm_gain
    inv_lhs = cons.inv_lhs

    groups = [(0, GROUP1_END), (GROUP1_END, e)]
    for g0, g1 in groups:
        for jj in range(g0, g1):
            act_j = cons.active[:, jj]
            dot_jj = (jnp.sum(lin[:, jj] * (imsum * lin[:, jj]), -1)
                      + jnp.sum(iia[:, jj] * aa[:, jj], -1)
                      + jnp.sum(iib[:, jj] * ab[:, jj], -1))
            new_gain = dot_jj * cons.cfm_coeff[:, jj] + cfm_gain[:, jj]
            inv_dot_jj = _pseudo_inv(dot_jj)
            inv_lhs = inv_lhs.at[:, jj].set(
                jnp.where(act_j, _pseudo_inv(dot_jj + new_gain), 0.0))
            cfm_gain = cfm_gain.at[:, jj].set(jnp.where(act_j, new_gain, 0.0))

            unbounded = (cons.bounds_min[:, jj] <= -MAX) & \
                        (cons.bounds_max[:, jj] >= MAX)
            elim = act_j & unbounded
            for ii_s in range(jj + 1, g1):
                act_i = cons.active[:, ii_s]
                dot_ij = (jnp.sum(lin[:, ii_s] * (imsum * lin[:, jj]), -1)
                          + jnp.sum(iia[:, ii_s] * aa[:, jj], -1)
                          + jnp.sum(iib[:, ii_s] * ab[:, jj], -1))
                coeff = jnp.where(elim & act_i, dot_ij * inv_dot_jj, 0.0)
                lin = lin.at[:, ii_s].add(-lin[:, jj] * coeff[:, None])
                aa = aa.at[:, ii_s].add(-aa[:, jj] * coeff[:, None])
                ab = ab.at[:, ii_s].add(-ab[:, jj] * coeff[:, None])
                iia = iia.at[:, ii_s].add(-iia[:, jj] * coeff[:, None])
                iib = iib.at[:, ii_s].add(-iib[:, jj] * coeff[:, None])
                rhs = rhs.at[:, ii_s].add(-rhs[:, jj] * coeff)
                rhs_wo = rhs_wo.at[:, ii_s].add(-rhs_wo[:, jj] * coeff)

    return dataclasses.replace(cons, lin_jac=lin, ang_jac_a=aa, ang_jac_b=ab,
                               ii_ang_jac_a=iia, ii_ang_jac_b=iib, rhs=rhs,
                               rhs_wo_bias=rhs_wo, cfm_gain=cfm_gain,
                               inv_lhs=inv_lhs)


def remove_joint_bias(cons: JointConstraints) -> JointConstraints:
    return dataclasses.replace(cons, rhs=cons.rhs_wo_bias)


def joint_gs_pass(cons: JointConstraints, vels: Velocity, colors: jax.Array,
                  *, max_colors: int = 32) -> tuple[Velocity, JointConstraints]:
    """Per-color joint solve (≙ joint_constraint_builder.wgsl solve_constraint)."""
    e = cons.active.shape[1]

    ang3d = cons.ang_jac_a.ndim == 3  # [J, E, 3] in 3D, [J, E] scalar in 2D

    def _gd(ang_jac, w):
        return jnp.sum(ang_jac * w, -1) if ang3d else ang_jac * w

    def _scale(ang_jac, d):
        return ang_jac * d[:, None] if ang3d else ang_jac * d

    def one_color(color, carry):
        lin_v, ang_v, imp = carry
        act_c = cons.valid & (colors == color)
        v1l = lin_v[cons.body_a]
        v1a = ang_v[cons.body_a]
        v2l = lin_v[cons.body_b]
        v2a = ang_v[cons.body_b]
        i1l, i1a, i2l, i2a = v1l, v1a, v2l, v2a
        for s in range(e):
            act = act_c & cons.active[:, s]
            dlin = jnp.sum(cons.lin_jac[:, s] * (v2l - v1l), -1)
            dang = _gd(cons.ang_jac_b[:, s], v2a) - _gd(cons.ang_jac_a[:, s], v1a)
            total_rhs = dlin + dang + cons.rhs[:, s]
            cand = jnp.clip(
                imp[:, s] + cons.inv_lhs[:, s]
                * (total_rhs - cons.cfm_gain[:, s] * imp[:, s]),
                cons.bounds_min[:, s], cons.bounds_max[:, s])
            new_imp = jnp.where(act, cand, imp[:, s])
            d = new_imp - imp[:, s]
            imp = imp.at[:, s].set(new_imp)
            lin_imp = cons.lin_jac[:, s] * d[:, None]
            v1l = v1l + lin_imp * cons.im_a
            v1a = v1a + _scale(cons.ii_ang_jac_a[:, s], d)
            v2l = v2l - lin_imp * cons.im_b
            v2a = v2a - _scale(cons.ii_ang_jac_b[:, s], d)
        lin_v = lin_v.at[cons.body_a].add(v1l - i1l).at[cons.body_b].add(v2l - i2l)
        ang_v = ang_v.at[cons.body_a].add(v1a - i1a).at[cons.body_b].add(v2a - i2a)
        return lin_v, ang_v, imp

    num_colors = jnp.minimum(jnp.max(jnp.where(cons.valid, colors, 0)),
                             max_colors)
    lin_v, ang_v, imp = jax.lax.fori_loop(
        1, num_colors + 1, one_color,
        (vels.linear, vels.angular, cons.impulse))
    return Velocity(lin_v, ang_v), dataclasses.replace(cons, impulse=imp)


# ---------------------------------------------------------------------------
# 2D joint constraints (≙ the dim2 build of joint_constraint_builder.wgsl):
# scalar angular algebra, slots [ang motor | lin motors ×2] (group 1) and
# [ang lock | lin locks ×2 | ang limit | lin limits ×2] (group 2) — 9 total.
# ---------------------------------------------------------------------------

NUM_SLOTS_2D = 9
GROUP1_END_2D = 3


def _build_joint_constraints_2d(jset: JointSet, poses: Sim,
                                mprops: WorldMassProperties,
                                params: SimParams) -> JointConstraints:
    j = jset.num_joints
    e = NUM_SLOTS_2D
    ba, bb = jset.body_a, jset.body_b
    pose1 = Sim(poses.rotation[ba], poses.translation[ba], poses.scale[ba])
    pose2 = Sim(poses.rotation[bb], poses.translation[bb], poses.scale[bb])
    frame1 = sim_ops.mul(pose1, jset.local_frame_a)
    frame2 = sim_ops.mul(pose2, jset.local_frame_b)
    com1, com2 = mprops.com[ba], mprops.com[bb]
    im1, im2 = mprops.inv_mass[ba], mprops.inv_mass[bb]
    ii1, ii2 = mprops.inv_inertia[ba], mprops.inv_inertia[bb]  # scalars [J]

    r1q, r2q = frame1.rotation, frame2.rotation  # rot2 (cos, sin)
    basis = rot2.to_matrix(r1q)  # [J, 2, 2], columns = joint axes in world
    lin_err = frame2.translation - frame1.translation

    locked = jset.locked_axes
    t1 = frame2.translation
    for i in range(2):
        axis = basis[..., :, i]
        has = (locked & (1 << i)) != 0
        t1 = t1 - jnp.where(has[:, None],
                            axis * jnp.sum(axis * lin_err, -1, keepdims=True),
                            0.0)
    r1 = t1 - com1
    r2 = frame2.translation - com2

    def perp_dot(r, m):  # perp(r)·(each column) — scalar angular jacobians
        perp = jnp.stack([-r[..., 1], r[..., 0]], -1)
        return jnp.stack([jnp.sum(perp * m[..., :, i], -1) for i in range(2)],
                         -1)  # [J, 2]

    cmat1_basis = perp_dot(r1, basis)
    cmat2_basis = perp_dot(r2, basis)

    ang_err = rot2.mul(rot2.inv(r1q), r2q)  # (cos, sin)
    ang_err_angle = rot2.angle(ang_err)
    ang_err_sin = ang_err[..., 1]

    erp_inv_dt = params.joint_erp_inv_dt
    cfm_coeff_j = params.joint_cfm_coeff
    inv_dt = params.inv_dt
    zeros = jnp.zeros((j,), jnp.float32)
    zeros2 = jnp.zeros((j, 2), jnp.float32)

    active = jnp.zeros((j, e), bool)
    lin_jac = jnp.zeros((j, e, 2), jnp.float32)
    ang_a = jnp.zeros((j, e), jnp.float32)
    ang_b = jnp.zeros((j, e), jnp.float32)
    rhs = jnp.zeros((j, e), jnp.float32)
    rhs_wo = jnp.zeros((j, e), jnp.float32)
    cfm_c = jnp.zeros((j, e), jnp.float32)
    cfm_g = jnp.zeros((j, e), jnp.float32)
    bmin = jnp.full((j, e), -MAX, jnp.float32)
    bmax = jnp.full((j, e), MAX, jnp.float32)

    motor_mask = jset.motor_axes & ~locked
    limit_mask = jset.limit_axes & ~locked

    def put(slot, act, lj, aa, ab, r_, rw, cc, cg, lo, hi):
        nonlocal active, lin_jac, ang_a, ang_b, rhs, rhs_wo, cfm_c, cfm_g
        nonlocal bmin, bmax
        active = active.at[:, slot].set(act)
        lin_jac = lin_jac.at[:, slot].set(jnp.where(act[:, None], lj, 0.0))
        ang_a = ang_a.at[:, slot].set(jnp.where(act, aa, 0.0))
        ang_b = ang_b.at[:, slot].set(jnp.where(act, ab, 0.0))
        rhs = rhs.at[:, slot].set(jnp.where(act, r_, 0.0))
        rhs_wo = rhs_wo.at[:, slot].set(jnp.where(act, rw, 0.0))
        cfm_c = cfm_c.at[:, slot].set(jnp.where(act, cc, 0.0))
        cfm_g = cfm_g.at[:, slot].set(jnp.where(act, cg, 0.0))
        bmin = bmin.at[:, slot].set(jnp.where(act, lo, -MAX))
        bmax = bmax.at[:, slot].set(jnp.where(act, hi, MAX))

    # group 1: angular motor (axis bit 2) → slot 0
    bit = 1 << 2
    act = (motor_mask & bit) != 0
    mp = _motor_params(jset, 2, params.dt)
    r_wo = (_smallest_angle_diff(ang_err_angle, mp["target_pos"])
            * mp["erp_inv_dt"]) - mp["target_vel"]
    put(0, act, zeros2, jnp.ones((j,)), jnp.ones((j,)), r_wo, r_wo,
        mp["cfm_coeff"], mp["cfm_gain"], -mp["max_impulse"], mp["max_impulse"])

    # linear motors (axes 0, 1) → slots 1, 2
    for i in range(2):
        bit = 1 << i
        act = (motor_mask & bit) != 0
        mp = _motor_params(jset, i, params.dt)
        lj = basis[..., :, i]
        dist = jnp.sum(lin_err * lj, -1)
        has_lim = (limit_mask & bit) != 0
        lo_l = jnp.where(has_lim, jset.limit_min[:, i], -MAX)
        hi_l = jnp.where(has_lim, jset.limit_max[:, i], MAX)
        target_vel = jnp.where(
            has_lim,
            jnp.clip(mp["target_vel"], (lo_l - dist) * inv_dt,
                     (hi_l - dist) * inv_dt),
            mp["target_vel"])
        r_wo = (dist - mp["target_pos"]) * mp["erp_inv_dt"] - target_vel
        put(1 + i, act, lj, cmat1_basis[:, i], cmat2_basis[:, i], r_wo, r_wo,
            mp["cfm_coeff"], mp["cfm_gain"], -mp["max_impulse"],
            mp["max_impulse"])

    # group 2: angular lock → slot 3
    act = (locked & (1 << 2)) != 0
    r_bias = ang_err_sin * erp_inv_dt
    put(3, act, zeros2, jnp.ones((j,)), jnp.ones((j,)), r_bias, zeros,
        jnp.full((j,), cfm_coeff_j), zeros, -MAX, MAX)

    # linear locks → slots 4, 5
    for i in range(2):
        act = (locked & (1 << i)) != 0
        lj = basis[..., :, i]
        r_bias = jnp.sum(lj * lin_err, -1) * erp_inv_dt
        put(4 + i, act, lj, cmat1_basis[:, i], cmat2_basis[:, i], r_bias,
            zeros, jnp.full((j,), cfm_coeff_j), zeros, -MAX, MAX)

    # angular limit → slot 6
    act = (limit_mask & (1 << 2)) != 0
    s_min = jnp.sin(jset.limit_min[:, 2] * 0.5)
    s_max = jnp.sin(jset.limit_max[:, 2] * 0.5)
    s_ang = jnp.sin(ang_err_angle * 0.5)
    min_en = s_ang <= s_min
    max_en = s_max <= s_ang
    r_bias = (jnp.maximum(s_ang - s_max, 0.0)
              - jnp.maximum(s_min - s_ang, 0.0)) * erp_inv_dt
    put(6, act, zeros2, jnp.ones((j,)), jnp.ones((j,)), r_bias, zeros,
        jnp.full((j,), cfm_coeff_j), zeros,
        jnp.where(min_en, -MAX, 0.0), jnp.where(max_en, MAX, 0.0))

    # linear limits → slots 7, 8
    for i in range(2):
        act = ((limit_mask & (1 << i)) != 0)
        lj = basis[..., :, i]
        dist = jnp.sum(lin_err * lj, -1)
        lo_l = jset.limit_min[:, i]
        hi_l = jset.limit_max[:, i]
        min_en = dist <= lo_l
        max_en = hi_l <= dist
        r_bias = (jnp.maximum(dist - hi_l, 0.0)
                  - jnp.maximum(lo_l - dist, 0.0)) * erp_inv_dt
        put(7 + i, act, lj, cmat1_basis[:, i], cmat2_basis[:, i], r_bias,
            zeros, jnp.full((j,), cfm_coeff_j), zeros,
            jnp.where(min_en, -MAX, 0.0), jnp.where(max_en, MAX, 0.0))

    cons = JointConstraints(
        body_a=ba, body_b=bb, im_a=im1, im_b=im2,
        active=active & jset.valid[:, None],
        lin_jac=lin_jac, ang_jac_a=ang_a, ang_jac_b=ang_b,
        ii_ang_jac_a=ii1[:, None] * ang_a,
        ii_ang_jac_b=ii2[:, None] * ang_b,
        inv_lhs=jnp.zeros((j, e), jnp.float32),
        rhs=rhs, rhs_wo_bias=rhs_wo, cfm_gain=cfm_g, cfm_coeff=cfm_c,
        bounds_min=bmin, bounds_max=bmax,
        impulse=jnp.zeros((j, e), jnp.float32),
        valid=jset.valid,
    )
    return _orthogonalize_2d(cons)


def _orthogonalize_2d(cons: JointConstraints) -> JointConstraints:
    """Masked Gram-Schmidt for the 2D slot groups (scalar angular terms)."""
    e = cons.active.shape[1]
    imsum = cons.im_a + cons.im_b
    lin = cons.lin_jac
    aa = cons.ang_jac_a
    ab = cons.ang_jac_b
    iia = cons.ii_ang_jac_a
    iib = cons.ii_ang_jac_b
    rhs = cons.rhs
    rhs_wo = cons.rhs_wo_bias
    cfm_gain = cons.cfm_gain
    inv_lhs = cons.inv_lhs

    for g0, g1 in ((0, GROUP1_END_2D), (GROUP1_END_2D, e)):
        for jj in range(g0, g1):
            act_j = cons.active[:, jj]
            dot_jj = (jnp.sum(lin[:, jj] * (imsum * lin[:, jj]), -1)
                      + iia[:, jj] * aa[:, jj] + iib[:, jj] * ab[:, jj])
            new_gain = dot_jj * cons.cfm_coeff[:, jj] + cfm_gain[:, jj]
            inv_dot_jj = _pseudo_inv(dot_jj)
            inv_lhs = inv_lhs.at[:, jj].set(
                jnp.where(act_j, _pseudo_inv(dot_jj + new_gain), 0.0))
            cfm_gain = cfm_gain.at[:, jj].set(jnp.where(act_j, new_gain, 0.0))
            unbounded = (cons.bounds_min[:, jj] <= -MAX) & \
                        (cons.bounds_max[:, jj] >= MAX)
            elim = act_j & unbounded
            for ii_s in range(jj + 1, g1):
                act_i = cons.active[:, ii_s]
                dot_ij = (jnp.sum(lin[:, ii_s] * (imsum * lin[:, jj]), -1)
                          + iia[:, ii_s] * aa[:, jj] + iib[:, ii_s] * ab[:, jj])
                coeff = jnp.where(elim & act_i, dot_ij * inv_dot_jj, 0.0)
                lin = lin.at[:, ii_s].add(-lin[:, jj] * coeff[:, None])
                aa = aa.at[:, ii_s].add(-aa[:, jj] * coeff)
                ab = ab.at[:, ii_s].add(-ab[:, jj] * coeff)
                iia = iia.at[:, ii_s].add(-iia[:, jj] * coeff)
                iib = iib.at[:, ii_s].add(-iib[:, jj] * coeff)
                rhs = rhs.at[:, ii_s].add(-rhs[:, jj] * coeff)
                rhs_wo = rhs_wo.at[:, ii_s].add(-rhs_wo[:, jj] * coeff)

    return dataclasses.replace(cons, lin_jac=lin, ang_jac_a=aa, ang_jac_b=ab,
                               ii_ang_jac_a=iia, ii_ang_jac_b=iib, rhs=rhs,
                               rhs_wo_bias=rhs_wo, cfm_gain=cfm_gain,
                               inv_lhs=inv_lhs)
