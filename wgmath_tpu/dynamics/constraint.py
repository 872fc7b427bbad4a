"""Contact constraints: data layout + builder + substep relinearization
(≙ wgrapier dynamics/constraint.rs:42-174, constraint.wgsl, and the
contact→constraint kernels solver.wgsl:83-170, 701-832).

TPU-native layout: one SoA pytree over a *fixed-capacity* constraint buffer
(capacity = contact capacity; a ``valid`` mask replaces ``contacts_len`` +
indirect dispatch). Every builder/solve function is vectorized over the
constraint axis; per-manifold contact points (4 in 3D, 2 in 2D) are a static
trailing axis.

Angular quantities are dim-generic: scalars in 2D, 3-vectors in 3D, handled by
the g* helpers (≙ solver.wgsl's gcross/gdot ifdef blocks).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util

from wgmath_tpu.dynamics.body import Velocity, WorldMassProperties
from wgmath_tpu.dynamics.sim_params import SimParams
from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.geometry.sim import Sim


def max_points(dim: int) -> int:
    """MAX_CONSTRAINTS_PER_MANIFOLD (constraint.wgsl:8-14)."""
    return 4 if dim == 3 else 2


def sub_len(dim: int) -> int:
    """Friction directions per contact point (constraint.wgsl SUB_LEN)."""
    return 2 if dim == 3 else 1


# -- dim-generic angular algebra (≙ solver.wgsl:839-915) -----------------------


def gcross(a: jax.Array, b: jax.Array) -> jax.Array:
    """vector × vector → angular (scalar in 2D, vector in 3D)."""
    if a.shape[-1] == 2:
        return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]
    return jnp.cross(a, b)


def gcross_av(ang: jax.Array, v: jax.Array) -> jax.Array:
    """angular × vector → vector."""
    if v.shape[-1] == 2:
        return ang[..., None] * jnp.stack([-v[..., 1], v[..., 0]], axis=-1)
    return jnp.cross(ang, v)


def gdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """angular · angular → scalar."""
    if a.ndim == b.ndim and a.shape == b.shape and a.shape[-1:] == (3,):
        return jnp.sum(a * b, axis=-1)
    return a * b


def ii_mul(inv_inertia: jax.Array, ang: jax.Array) -> jax.Array:
    """world inverse inertia applied to an angular quantity."""
    if ang.ndim + 1 == inv_inertia.ndim + 0 and inv_inertia.shape[-1] == 3:
        return jnp.einsum("...ij,...j->...i", inv_inertia, ang)
    if inv_inertia.ndim >= 2 and inv_inertia.shape[-1] == 3 and inv_inertia.shape[-2] == 3:
        return jnp.einsum("...ij,...j->...i", inv_inertia, ang)
    return inv_inertia * ang


def orthonormal_vector(v: jax.Array) -> jax.Array:
    """A unit vector orthogonal to unit v (branch-free Duff et al. form,
    ≙ solver.wgsl:866-871 3D / :840 2D)."""
    if v.shape[-1] == 2:
        return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)
    sign = jnp.where(v[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + v[..., 2])
    b = v[..., 0] * v[..., 1] * a
    return jnp.stack([b, sign + v[..., 1] ** 2 * a, -v[..., 1]], axis=-1)


def tangent_directions(force_dir: jax.Array, linvel1: jax.Array,
                       linvel2: jax.Array) -> jax.Array:
    """[..., S, dim] friction basis; 3D picks the relative-velocity direction
    when large enough (≙ solver.wgsl compute_tangent_contact_directions)."""
    dim = force_dir.shape[-1]
    if dim == 2:
        return orthonormal_vector(force_dir)[..., None, :]
    rel = linvel1 - linvel2
    t = rel - force_dir * jnp.sum(force_dir * rel, axis=-1, keepdims=True)
    n = jnp.linalg.norm(t, axis=-1, keepdims=True)
    fallback = orthonormal_vector(force_dir)
    t1 = jnp.where(n < 1.0e-4, fallback, t / jnp.maximum(n, 1e-30))
    t2 = jnp.cross(force_dir, t1)
    return jnp.stack([t1, t2], axis=-2)


def _safe_inv(x: jax.Array) -> jax.Array:
    return jnp.where(x == 0.0, 0.0, 1.0 / jnp.where(x == 0.0, 1.0, x))


def maybe_inv(x: jax.Array, eps: float = 1.0e-20) -> jax.Array:
    ok = jnp.abs(x) > eps
    return jnp.where(ok, 1.0 / jnp.where(ok, x, 1.0), 0.0)


def cap_magnitude(v: jax.Array, limit: jax.Array) -> jax.Array:
    n = jnp.linalg.norm(v, axis=-1)
    scale = jnp.where(n > limit, limit / jnp.maximum(n, 1e-30), 1.0)
    return v * scale[..., None]


# -- contact + constraint pytrees ----------------------------------------------


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class Contacts:
    """Fixed-capacity indexed contact manifolds (≙ GpuIndexedContact,
    wgparry queries/contact.rs:38-91). ``normal_a``/``points_a`` are in body
    A's local frame; ``dist`` < 0 means penetration."""

    body_a: jax.Array  # i32 [C]
    body_b: jax.Array  # i32 [C]
    normal_a: jax.Array  # [C, dim]
    points_a: jax.Array  # [C, P, dim]
    dist: jax.Array  # [C, P]
    num_points: jax.Array  # i32 [C]
    valid: jax.Array  # bool [C]

    def tree_flatten(self):
        return (self.body_a, self.body_b, self.normal_a, self.points_a,
                self.dist, self.num_points, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def capacity(self):
        return self.body_a.shape[0]

    @property
    def dim(self):
        return self.normal_a.shape[-1]

    @staticmethod
    def empty(capacity: int, dim: int) -> "Contacts":
        p = max_points(dim)
        return Contacts(
            jnp.zeros(capacity, jnp.int32), jnp.zeros(capacity, jnp.int32),
            jnp.zeros((capacity, dim), jnp.float32),
            jnp.zeros((capacity, p, dim), jnp.float32),
            jnp.zeros((capacity, p), jnp.float32),
            jnp.zeros(capacity, jnp.int32), jnp.zeros(capacity, bool),
        )


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class ContactConstraints:
    """SoA two-body contact constraints (≙ GpuTwoBodyConstraint +
    GpuTwoBodyConstraintBuilder, constraint.rs:42-174). Trailing axes:
    P contact points, S friction directions."""

    body_a: jax.Array  # i32 [C]
    body_b: jax.Array  # i32 [C]
    valid: jax.Array  # bool [C]
    num_points: jax.Array  # i32 [C]
    dir_a: jax.Array  # [C, dim]
    tangent_a: jax.Array  # [C, S, dim] friction basis
    im_a: jax.Array  # [C, dim]
    im_b: jax.Array  # [C, dim]
    cfm_factor: jax.Array  # [C]
    limit: jax.Array  # [C] friction coefficient
    # normal parts, per point
    n_torque_a: jax.Array  # [C, P] (2D) or [C, P, 3]
    n_ii_torque_a: jax.Array
    n_torque_b: jax.Array
    n_ii_torque_b: jax.Array
    n_rhs: jax.Array  # [C, P]
    n_rhs_wo_bias: jax.Array  # [C, P]
    n_impulse: jax.Array  # [C, P]
    n_impulse_jacobi: jax.Array  # [C, P]
    n_r: jax.Array  # [C, P] projected-mass inverse
    # tangent parts, per point × S
    t_torque_a: jax.Array  # [C, P, S] or [C, P, S, 3]
    t_ii_torque_a: jax.Array
    t_torque_b: jax.Array
    t_ii_torque_b: jax.Array
    t_rhs: jax.Array  # [C, P, S]
    t_rhs_wo_bias: jax.Array  # [C, P, S]
    t_impulse: jax.Array  # [C, P, S]
    t_impulse_jacobi: jax.Array  # [C, P, S]
    t_r: jax.Array  # [C, P, 3] (3D: r0, r1, cross) / [C, P, 1] (2D: 1/r)
    # builder infos for substep relinearization (TwoBodyConstraintInfos)
    local_pt_a: jax.Array  # [C, P, dim]
    local_pt_b: jax.Array  # [C, P, dim]
    info_dist: jax.Array  # [C, P]
    info_normal_vel: jax.Array  # [C, P]

    def tree_flatten(self):
        fields = dataclasses.fields(self)
        return tuple(getattr(self, f.name) for f in fields), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def dim(self):
        return self.dir_a.shape[-1]


def _take_sim(poses: Sim, idx: jax.Array) -> Sim:
    return Sim(poses.rotation[idx], poses.translation[idx], poses.scale[idx])


def build_constraints(poses: Sim, vels: Velocity,
                      mprops: WorldMassProperties, contacts: Contacts,
                      params: SimParams) -> ContactConstraints:
    """Vectorized contact→constraint conversion (≙ solver.wgsl:701-832).

    Invalid manifold slots produce zero-impact constraints (masked ``valid``).
    """
    dim = contacts.dim
    p_max = contacts.points_a.shape[1]  # manifold width (≤ max_points(dim))
    s_len = sub_len(dim)
    id1, id2 = contacts.body_a, contacts.body_b
    # ONE merged wide gather of every per-body input for both sides: the
    # 16 narrow gathers this replaces (pose/vel/mass/inertia/com × 2) each
    # pay TPU's per-ROW gather cost — this is solve-setup's hottest spot
    n_b = poses.rotation.shape[0]
    cols = [poses.rotation, poses.translation, poses.scale,
            vels.linear, vels.angular, mprops.inv_mass,
            mprops.inv_inertia.reshape(n_b, -1), mprops.com]
    cols = [x[:, None] if x.ndim == 1 else x for x in cols]
    offs = np.cumsum([0] + [x.shape[1] for x in cols])
    packed = jnp.concatenate(cols, axis=1)
    pp = packed[jnp.concatenate([id1, id2])]
    cc_ = id1.shape[0]

    def unpack(side, i, shaped=None):
        v = pp[:cc_, offs[i]:offs[i + 1]] if side == 0 else \
            pp[cc_:, offs[i]:offs[i + 1]]
        if shaped == "scalar":
            return v[:, 0]
        if shaped is not None:
            return v.reshape((cc_,) + shaped)
        return v

    ii_shape = mprops.inv_inertia.shape[1:]
    ang_scalar = vels.angular.ndim == 1
    pose1 = Sim(unpack(0, 0), unpack(0, 1), unpack(0, 2, "scalar"))
    pose2 = Sim(unpack(1, 0), unpack(1, 1), unpack(1, 2, "scalar"))
    vel1 = Velocity(unpack(0, 3),
                    unpack(0, 4, "scalar") if ang_scalar else unpack(0, 4))
    vel2 = Velocity(unpack(1, 3),
                    unpack(1, 4, "scalar") if ang_scalar else unpack(1, 4))
    im1, im2 = unpack(0, 5), unpack(1, 5)
    ii1 = unpack(0, 6, ii_shape if ii_shape else "scalar")
    ii2 = unpack(1, 6, ii_shape if ii_shape else "scalar")
    com1, com2 = unpack(0, 7), unpack(1, 7)

    force_dir1 = -sim_ops.mul_unit_vec(pose1, contacts.normal_a)
    tangents1 = tangent_directions(force_dir1, vel1.linear, vel2.linear)

    inv_dt = params.inv_dt
    erp_inv_dt = params.contact_erp_inv_dt
    allowed_err = params.allowed_linear_error
    max_corr = params.max_corrective_velocity
    imsum = im1 + im2

    # per-point quantities, static loop over P
    n_tq_a, n_iitq_a, n_tq_b, n_iitq_b = [], [], [], []
    n_rhs, n_r = [], []
    t_tq_a, t_iitq_a, t_tq_b, t_iitq_b, t_r = [], [], [], [], []
    lpa, lpb, i_dist, i_nvel = [], [], [], []
    for k in range(p_max):
        pt_local = contacts.points_a[:, k] + contacts.normal_a * contacts.dist[:, k:k + 1] / 2.0
        pt = sim_ops.mul_pt(pose1, pt_local)
        dp1 = pt - com1
        dp2 = pt - com2
        cvel1 = vel1.linear + gcross_av(vel1.angular, dp1)
        cvel2 = vel2.linear + gcross_av(vel2.angular, dp2)

        td1 = gcross(dp1, force_dir1)
        td2 = gcross(dp2, -force_dir1)
        iitd1 = ii_mul(ii1, td1)
        iitd2 = ii_mul(ii2, td2)
        proj_mass = _safe_inv(
            jnp.sum(force_dir1 * (imsum * force_dir1), axis=-1)
            + gdot(iitd1, td1) + gdot(iitd2, td2))

        dist = contacts.dist[:, k]
        rhs_wo_bias = (params.restitution
                       * jnp.sum((cvel1 - cvel2) * force_dir1, axis=-1)
                       + jnp.maximum(dist, 0.0) * inv_dt)

        n_tq_a.append(td1); n_iitq_a.append(iitd1)
        n_tq_b.append(td2); n_iitq_b.append(iitd2)
        n_rhs.append(rhs_wo_bias)
        n_r.append(proj_mass)

        # tangent parts
        tq_a_j, iitq_a_j, tq_b_j, iitq_b_j, r_j = [], [], [], [], []
        for j in range(s_len):
            tj = tangents1[:, j]
            ttd1 = gcross(dp1, tj)
            ttd2 = gcross(dp2, -tj)
            tiitd1 = ii_mul(ii1, ttd1)
            tiitd2 = ii_mul(ii2, ttd2)
            r = (jnp.sum(tj * (imsum * tj), axis=-1)
                 + gdot(tiitd1, ttd1) + gdot(tiitd2, ttd2))
            tq_a_j.append(ttd1); iitq_a_j.append(tiitd1)
            tq_b_j.append(ttd2); iitq_b_j.append(tiitd2)
            r_j.append(_safe_inv(r) if dim == 2 else r)
        if dim == 3:
            r_cross = 2.0 * (gdot(tq_a_j[0], iitq_a_j[1])
                             + gdot(tq_b_j[0], iitq_b_j[1]))
            t_r.append(jnp.stack(r_j + [r_cross], axis=-1))
        else:
            t_r.append(jnp.stack(r_j, axis=-1))
        t_tq_a.append(jnp.stack(tq_a_j, axis=1))
        t_iitq_a.append(jnp.stack(iitq_a_j, axis=1))
        t_tq_b.append(jnp.stack(tq_b_j, axis=1))
        t_iitq_b.append(jnp.stack(iitq_b_j, axis=1))

        lpa.append(sim_ops.inv_mul_pt(pose1, pt))
        lpb.append(sim_ops.inv_mul_pt(pose2, pt))
        i_dist.append(dist)
        i_nvel.append(rhs_wo_bias)

    def stk(xs):
        return jnp.stack(xs, axis=1)

    c = contacts.capacity
    zeros_ps = jnp.zeros((c, p_max, s_len), jnp.float32)
    return ContactConstraints(
        body_a=id1, body_b=id2, valid=contacts.valid,
        num_points=contacts.num_points,
        dir_a=force_dir1, tangent_a=tangents1,
        im_a=im1, im_b=im2,
        cfm_factor=jnp.full((c,), params.contact_cfm_factor, jnp.float32),
        limit=jnp.full((c,), params.friction, jnp.float32),
        n_torque_a=stk(n_tq_a), n_ii_torque_a=stk(n_iitq_a),
        n_torque_b=stk(n_tq_b), n_ii_torque_b=stk(n_iitq_b),
        n_rhs=stk(n_rhs), n_rhs_wo_bias=stk(n_rhs),
        n_impulse=jnp.zeros((c, p_max), jnp.float32),
        n_impulse_jacobi=jnp.zeros((c, p_max), jnp.float32),
        n_r=stk(n_r),
        t_torque_a=stk(t_tq_a), t_ii_torque_a=stk(t_iitq_a),
        t_torque_b=stk(t_tq_b), t_ii_torque_b=stk(t_iitq_b),
        t_rhs=zeros_ps, t_rhs_wo_bias=zeros_ps,
        t_impulse=zeros_ps, t_impulse_jacobi=zeros_ps,
        t_r=stk(t_r),
        local_pt_a=stk(lpa), local_pt_b=stk(lpb),
        info_dist=stk(i_dist), info_normal_vel=stk(i_nvel),
    )


def update_constraints(cons: ContactConstraints, poses: Sim,
                       params: SimParams) -> ContactConstraints:
    """Substep relinearization (≙ solver.wgsl update_constraints:103-170):
    re-evaluate penetration from tracked local anchors under current poses,
    refresh rhs bias terms, scale impulses by the warmstart coefficient."""
    pose1 = _take_sim(poses, cons.body_a)
    pose2 = _take_sim(poses, cons.body_b)
    inv_dt = params.inv_dt
    erp_inv_dt = params.contact_erp_inv_dt
    allowed_err = params.allowed_linear_error
    max_corr = params.max_corrective_velocity
    ws = params.warmstart_coefficient

    p1 = sim_ops.mul_pt(Sim(pose1.rotation[:, None], pose1.translation[:, None],
                            pose1.scale[:, None]), cons.local_pt_a)
    p2 = sim_ops.mul_pt(Sim(pose2.rotation[:, None], pose2.translation[:, None],
                            pose2.scale[:, None]), cons.local_pt_b)
    dist = cons.info_dist + jnp.sum((p1 - p2) * cons.dir_a[:, None, :], axis=-1)

    rhs_wo_bias = cons.info_normal_vel + jnp.maximum(dist, 0.0) * inv_dt
    rhs_bias = jnp.clip((dist + allowed_err) * erp_inv_dt, -max_corr, 0.0)
    n_rhs = rhs_wo_bias + rhs_bias

    # tangent bias: anchor drift projected on the friction basis
    drift = p1 - p2  # [C, P, dim]
    t_bias = jnp.einsum("cpd,csd->cps", drift, cons.tangent_a) * inv_dt
    t_rhs = cons.t_rhs_wo_bias + t_bias

    return dataclasses.replace(
        cons,
        n_rhs=n_rhs, n_rhs_wo_bias=rhs_wo_bias,
        n_impulse=cons.n_impulse * ws,
        n_impulse_jacobi=cons.n_impulse_jacobi * ws,
        t_rhs=t_rhs,
        t_impulse=cons.t_impulse * ws,
        t_impulse_jacobi=cons.t_impulse_jacobi * ws,
        cfm_factor=jnp.full_like(cons.cfm_factor, params.contact_cfm_factor),
    )


def update_rhs_sorted(ss, poses: Sim, params: SimParams):
    """``update_constraints``'s rhs relinearization over color-sorted field
    views (a namespace with body_a/b, dir_a, tangent_a, local_pt_a/b,
    info_dist, info_normal_vel, t_rhs_wo_bias). Lets the TGS substep loop
    keep every constraint array in sorted space — the full-field re-sort per
    substep disappears (solver.wgsl update_constraints:103-170 parity)."""
    # ONE merged wide gather for both sides' poses: TPU gather cost is per
    # ROW, so 1×2C rows of [rot|trans|scale] beats 6×C narrow gathers
    # (rotation/translation/scale × two sides) ~3x — this relinearization
    # runs every substep and was the single largest substep cost
    rw = poses.rotation.shape[-1]
    dim = poses.translation.shape[-1]
    packed = jnp.concatenate(
        [poses.rotation, poses.translation, poses.scale[:, None]], axis=-1)
    pp = packed[jnp.concatenate([ss.body_a, ss.body_b])]
    c = ss.body_a.shape[0]
    pose1 = Sim(pp[:c, :rw], pp[:c, rw:rw + dim], pp[:c, rw + dim])
    pose2 = Sim(pp[c:, :rw], pp[c:, rw:rw + dim], pp[c:, rw + dim])
    inv_dt = params.inv_dt
    p1 = sim_ops.mul_pt(Sim(pose1.rotation[:, None], pose1.translation[:, None],
                            pose1.scale[:, None]), ss.local_pt_a)
    p2 = sim_ops.mul_pt(Sim(pose2.rotation[:, None], pose2.translation[:, None],
                            pose2.scale[:, None]), ss.local_pt_b)
    dist = ss.info_dist + jnp.sum((p1 - p2) * ss.dir_a[:, None, :], axis=-1)
    rhs_wo_bias = ss.info_normal_vel + jnp.maximum(dist, 0.0) * inv_dt
    rhs_bias = jnp.clip((dist + params.allowed_linear_error)
                        * params.contact_erp_inv_dt,
                        -params.max_corrective_velocity, 0.0)
    n_rhs = rhs_wo_bias + rhs_bias
    drift = p1 - p2
    t_bias = jnp.einsum("cpd,csd->cps", drift, ss.tangent_a) * inv_dt
    t_rhs = ss.t_rhs_wo_bias + t_bias
    return n_rhs, rhs_wo_bias, t_rhs


def remove_cfm_and_bias(cons: ContactConstraints) -> ContactConstraints:
    """≙ solver.wgsl remove_cfm_and_bias:688-699."""
    return dataclasses.replace(
        cons,
        n_rhs=cons.n_rhs_wo_bias,
        t_rhs=cons.t_rhs_wo_bias,
        cfm_factor=jnp.ones_like(cons.cfm_factor),
    )


def compact_contacts(contacts: Contacts, capacity: int, extra=None,
                     sort_by_extra: bool = False,
                     static_windows: tuple | None = None):
    """Compact valid manifolds into a ``capacity``-sized buffer.

    AABB-overlap pairs vastly outnumber true contacts (a sphere's box
    overlaps ~2-3× more neighbors than it touches), and every solver pass
    costs ∝ the constraint buffer size — compacting after the narrow phase
    shrinks all downstream work to the live contact count. Returns
    ``(contacts, true_count)``; overflow signals through the count for host
    re-bucketing, exactly like the pair list.

    ``extra``: optional per-slot i32 array compacted alongside (e.g. cached
    pair-graph colors); returns ``(contacts, count, extra_compacted)``.

    ``sort_by_extra``: order the compacted buffer by ascending ``extra``
    (stable within equal values). With ``extra`` = pair-graph colors this
    makes the compacted contacts COLOR-MAJOR, so the solver can consume
    them without its own per-frame color sort-gather (the biggest
    solve-setup cost at 10k bodies).

    ``static_windows``: optional static rung per color ``(rung0, rung1,
    ...)`` — color k's entries land at compile-time offset ``sum(rungs[:k])``
    padded to ``rungs[k]`` rows (the fused-sweep layout, gs_fused.py).
    ``capacity`` is ignored (buffer = sum of rungs); entries past a
    color's rung are dropped — the per-class TRUE counts are returned as a
    4th value so the host can regrow the rung (same contract as the
    window ladder). Requires ``sort_by_extra``.
    """
    c = contacts.capacity
    flags = contacts.valid
    count = jnp.sum(flags.astype(jnp.int32))
    if sort_by_extra:
        assert extra is not None
        # one u32 sort does compaction + color-major ordering: key =
        # (color << 24) | slot for valid entries, +inf otherwise. Stable
        # within a color (slot order), invalid slots land past `count`.
        assert c < (1 << 24)
        idx = jnp.arange(c, dtype=jnp.int32)
        key = jnp.where(flags, (jnp.clip(extra, 0, 127) << 24) | idx,
                        jnp.int32(0x7FFFFFFF))
        skey, take = jax.lax.sort_key_val(key, idx)
        if static_windows is not None:
            n_classes = len(static_windows)
            offsets = np.concatenate(
                [[0], np.cumsum(static_windows)]).astype(np.int32)
            capacity = int(offsets[-1])
            # true per-class counts (pre-clamp) for the rung-regrow signal
            cls = jnp.where(flags, jnp.clip(extra, 0, n_classes - 1),
                            n_classes)
            class_counts = jax.ops.segment_sum(
                jnp.ones((c,), jnp.int32), cls, num_segments=n_classes + 1
            )[:n_classes]
            cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(class_counts)]).astype(
                                       jnp.int32)
            # out slot s of color k takes sorted position cum[k] + rank
            col_of_slot = np.zeros((capacity,), np.int32)
            j_of_slot = np.zeros((capacity,), np.int32)
            for k in range(n_classes):
                o, r = int(offsets[k]), int(static_windows[k])
                col_of_slot[o:o + r] = k
                j_of_slot[o:o + r] = np.arange(r)
            col_of_slot = jnp.asarray(col_of_slot)
            j_of_slot = jnp.asarray(j_of_slot)
            valid_out = j_of_slot < (cum[col_of_slot + 1]
                                     - cum[col_of_slot])
            take = take[jnp.minimum(cum[col_of_slot] + j_of_slot, c - 1)]
        else:
            take = take[:capacity]
            valid_out = jnp.arange(capacity) < jnp.minimum(count, capacity)

        # ONE wide row gather for every f32 field (TPU gather cost is per
        # row); int fields ride their own small gathers
        f32_cols = [contacts.normal_a,
                    contacts.points_a.reshape(c, -1),
                    contacts.dist]
        widths = [x.shape[1] for x in f32_cols]
        big = jnp.concatenate(f32_cols, axis=1)[take]
        o_norm = big[:, :widths[0]]
        o_pts = big[:, widths[0]:widths[0] + widths[1]].reshape(
            capacity, *contacts.points_a.shape[1:])
        o_dist = big[:, widths[0] + widths[1]:]
        o_dist = jnp.where(valid_out[:, None], o_dist, 1e9)
        out = Contacts(
            body_a=jnp.where(valid_out, contacts.body_a[take], 0),
            body_b=jnp.where(valid_out, contacts.body_b[take], 0),
            normal_a=o_norm,
            points_a=o_pts,
            dist=o_dist,
            num_points=jnp.where(valid_out, contacts.num_points[take], 0),
            valid=valid_out,
        )
        if static_windows is not None:
            colors_out = jnp.where(valid_out, col_of_slot, 0)
            return out, count, colors_out, class_counts
        colors_out = jnp.where(valid_out,
                               (skey[:capacity] >> 24) & 0x7F, 0)
        return out, count, colors_out

    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    slot = jnp.where(flags & (pos < capacity), pos, capacity)

    def scatter(x, fill=0):
        shape = (capacity,) + x.shape[1:]
        base = jnp.full(shape, fill, x.dtype)
        return base.at[slot].set(x, mode="drop")

    out = Contacts(
        body_a=scatter(contacts.body_a),
        body_b=scatter(contacts.body_b),
        normal_a=scatter(contacts.normal_a),
        points_a=scatter(contacts.points_a),
        dist=scatter(contacts.dist, fill=1e9),
        num_points=scatter(contacts.num_points),
        valid=(jnp.arange(capacity) < jnp.minimum(count, capacity)),
    )
    if extra is not None:
        return out, count, scatter(extra)
    return out, count
