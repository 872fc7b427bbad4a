"""Fused contact->constraint builder (3D): one Pallas kernel emits the
packed solver-field matrix directly.

``constraint.build_constraints`` is ~150 small XLA ops over [C, <=3]
arrays; at 33k contacts the cost is per-fusion dispatch overhead (~6 ms of
the 10k-body step), not arithmetic. This module runs the same math
component-major ([rows, contacts] — contacts ride the 128-lane axis) as
ONE kernel gridded over lane chunks, and writes the TRANSPOSED packed
field matrix in ``solver._F32_SORT_FIELDS`` order — so the fused-sweep
path consumes it with a static slice instead of re-concatenating ~24
field arrays (``pad_solver_fields_packed``).

The math transcribes ``build_constraints`` (≙ solver.wgsl:701-832); the
XLA fallback runs the identical function off-TPU and is unit-tested
against the row-major builder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wgmath_tpu.core.dispatch import on_tpu, pallas_interpret

CHUNK = 2048  # lane-chunk per grid step


def field_meta(p_max: int, s_len: int):
    """(name -> (row_start, tail_shape)) in _F32_SORT_FIELDS order + total
    rows — must match solver.pad_solver_fields_packed's packing exactly."""
    from wgmath_tpu.dynamics.solver import _F32_SORT_FIELDS

    tails = {
        "dir_a": (3,), "tangent_a": (s_len, 3), "im_a": (3,), "im_b": (3,),
        "limit": (), "n_torque_a": (p_max, 3), "n_torque_b": (p_max, 3),
        "n_ii_torque_a": (p_max, 3), "n_ii_torque_b": (p_max, 3),
        "n_r": (p_max,), "t_torque_a": (p_max, s_len, 3),
        "t_torque_b": (p_max, s_len, 3), "t_ii_torque_a": (p_max, s_len, 3),
        "t_ii_torque_b": (p_max, s_len, 3), "t_r": (p_max, 3),
        "cfm_factor": (), "n_rhs": (p_max,), "t_rhs": (p_max, s_len),
        "n_rhs_wo_bias": (p_max,), "t_rhs_wo_bias": (p_max, s_len),
        "local_pt_a": (p_max, 3), "local_pt_b": (p_max, 3),
        "info_dist": (p_max,), "info_normal_vel": (p_max,),
    }
    meta, at = {}, 0
    for f in _F32_SORT_FIELDS:
        tail = tails[f]
        k = int(np.prod(tail)) if tail else 1
        meta[f] = (at, tail)
        at += k
    return meta, at


# --------------------------- component-major math -------------------------


def _dot(a, b):
    return jnp.sum(a * b, axis=0, keepdims=True)  # [1, L]


def _cross(a, b):
    return jnp.concatenate([
        a[1:2] * b[2:3] - a[2:3] * b[1:2],
        a[2:3] * b[0:1] - a[0:1] * b[2:3],
        a[0:1] * b[1:2] - a[1:2] * b[0:1]], axis=0)


def _quat_rot(q, v):
    """Rotate [3, L] v by [4, L] xyzw quaternion (≙ quat.mul_vec)."""
    u, w = q[0:3], q[3:4]
    uv = _cross(u, v)
    uuv = _cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def _quat_rot_inv(q, v):
    return _quat_rot(jnp.concatenate([-q[0:3], q[3:4]], axis=0), v)


def _ii_mul(ii, v):
    """[9, L] row-major 3x3 inverse inertia x [3, L] vector."""
    return jnp.concatenate([
        ii[3 * i:3 * i + 1] * v[0:1] + ii[3 * i + 1:3 * i + 2] * v[1:2]
        + ii[3 * i + 2:3 * i + 3] * v[2:3] for i in range(3)], axis=0)


def _orthonormal(v):
    sign = jnp.where(v[2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + v[2:3])
    b = v[0:1] * v[1:2] * a
    return jnp.concatenate([b, sign + v[1:2] ** 2 * a, -v[1:2]], axis=0)


def _safe_inv(x):
    # exact mirror of constraint._safe_inv (zero -> zero)
    return jnp.where(x == 0.0, 0.0, 1.0 / jnp.where(x == 0.0, 1.0, x))


def _cm_build(aT, bT, offs, nT, ptsT, distT, *, p_max, s_len, restitution,
              inv_dt, friction, cfm_factor, meta, k_all):
    """Component-major constraint build on VALUES ([*, L] slabs).

    ``aT``/``bT`` [W, L]: per-side packed body data in the unpack order of
    build_constraints (rotation 4, translation 3, scale 1, linear 3,
    angular 3, inv_mass 3, inv_inertia 9, com 3). Returns bigT [k_all, L].
    """
    assert s_len == 2

    def side(t, i):
        return t[offs[i]:offs[i + 1]]

    q1, q2 = side(aT, 0), side(bT, 0)
    tr1, tr2 = side(aT, 1), side(bT, 1)
    sc1, sc2 = side(aT, 2), side(bT, 2)
    lin1, lin2 = side(aT, 3), side(bT, 3)
    ang1, ang2 = side(aT, 4), side(bT, 4)
    im1, im2 = side(aT, 5), side(bT, 5)
    ii1, ii2 = side(aT, 6), side(bT, 6)
    com1, com2 = side(aT, 7), side(bT, 7)

    dir1 = -_quat_rot(q1, nT)  # force_dir1 (mul_unit_vec: scale-free)
    # tangent basis (≙ compute_tangent_contact_directions)
    rel = lin1 - lin2
    t = rel - dir1 * _dot(dir1, rel)
    tn = jnp.sqrt(_dot(t, t))
    fb = _orthonormal(dir1)
    t1 = jnp.where(tn < 1.0e-4, fb, t / jnp.maximum(tn, 1e-30))
    t2 = _cross(dir1, t1)

    imsum = im1 + im2
    L = nT.shape[1]
    out = {}
    out["dir_a"] = dir1
    out["tangent_a"] = jnp.concatenate([t1, t2], axis=0)
    out["im_a"], out["im_b"] = im1, im2
    out["limit"] = jnp.full((1, L), friction, jnp.float32)
    out["cfm_factor"] = jnp.full((1, L), cfm_factor, jnp.float32)
    zeros_ps = jnp.zeros((p_max * s_len, L), jnp.float32)
    out["t_rhs"] = zeros_ps
    out["t_rhs_wo_bias"] = zeros_ps

    acc = {f: [] for f in ("n_torque_a", "n_torque_b", "n_ii_torque_a",
                           "n_ii_torque_b", "n_r", "n_rhs", "t_torque_a",
                           "t_torque_b", "t_ii_torque_a", "t_ii_torque_b",
                           "t_r", "local_pt_a", "local_pt_b", "info_dist",
                           "info_normal_vel")}
    for k in range(p_max):
        pt_k = ptsT[3 * k:3 * k + 3]
        dist = distT[k:k + 1]
        pt_local = pt_k + nT * (dist / 2.0)
        pt = sc1 * _quat_rot(q1, pt_local) + tr1  # mul_pt
        dp1 = pt - com1
        dp2 = pt - com2
        cvel1 = lin1 + _cross(ang1, dp1)
        cvel2 = lin2 + _cross(ang2, dp2)

        td1 = _cross(dp1, dir1)
        td2 = _cross(dp2, -dir1)
        iitd1 = _ii_mul(ii1, td1)
        iitd2 = _ii_mul(ii2, td2)
        proj_mass = _safe_inv(_dot(dir1, imsum * dir1)
                              + _dot(iitd1, td1) + _dot(iitd2, td2))
        rhs_wo_bias = (restitution * _dot(cvel1 - cvel2, dir1)
                       + jnp.maximum(dist, 0.0) * inv_dt)
        acc["n_torque_a"].append(td1)
        acc["n_ii_torque_a"].append(iitd1)
        acc["n_torque_b"].append(td2)
        acc["n_ii_torque_b"].append(iitd2)
        acc["n_rhs"].append(rhs_wo_bias)
        acc["n_r"].append(proj_mass)

        t_r_rows = []
        t_tq_a, t_tq_b, t_ii_a, t_ii_b = [], [], [], []
        r_parts = []
        for j, tj in enumerate((t1, t2)):
            ttd1 = _cross(dp1, tj)
            ttd2 = _cross(dp2, -tj)
            tii1 = _ii_mul(ii1, ttd1)
            tii2 = _ii_mul(ii2, ttd2)
            r = (_dot(tj, imsum * tj) + _dot(tii1, ttd1) + _dot(tii2, ttd2))
            t_tq_a.append(ttd1)
            t_tq_b.append(ttd2)
            t_ii_a.append(tii1)
            t_ii_b.append(tii2)
            r_parts.append(r)
        r_cross = 2.0 * (_dot(t_tq_a[0], t_ii_a[1])
                         + _dot(t_tq_b[0], t_ii_b[1]))
        acc["t_r"].append(jnp.concatenate(r_parts + [r_cross], axis=0))
        acc["t_torque_a"].append(jnp.concatenate(t_tq_a, axis=0))
        acc["t_torque_b"].append(jnp.concatenate(t_tq_b, axis=0))
        acc["t_ii_torque_a"].append(jnp.concatenate(t_ii_a, axis=0))
        acc["t_ii_torque_b"].append(jnp.concatenate(t_ii_b, axis=0))
        acc["local_pt_a"].append(_quat_rot_inv(q1, pt - tr1) / sc1)
        acc["local_pt_b"].append(_quat_rot_inv(q2, pt - tr2) / sc2)
        acc["info_dist"].append(dist)
        acc["info_normal_vel"].append(rhs_wo_bias)

    for f in ("n_torque_a", "n_torque_b", "n_ii_torque_a", "n_ii_torque_b",
              "n_r", "t_torque_a", "t_torque_b", "t_ii_torque_a",
              "t_ii_torque_b", "t_r", "local_pt_a", "local_pt_b",
              "info_dist", "info_normal_vel"):
        out[f] = jnp.concatenate(acc[f], axis=0)
    out["n_rhs"] = jnp.concatenate(acc["n_rhs"], axis=0)
    out["n_rhs_wo_bias"] = out["n_rhs"]

    # pack rows by their `at` OFFSET, not dict order: the Pallas wrapper
    # passes meta as a name-sorted tuple (hashable static arg), and
    # _F32_SORT_FIELDS is not alphabetical — iterating meta.items() there
    # concatenated every field at the wrong row (the round-2 "fused Pallas
    # builder miscomputes on device" was THIS host-side ordering bug, not
    # a Mosaic miscompile: the identity-copy kernel through the same
    # BlockSpecs is bitwise-exact — scripts/isolate_fused_kernels.py).
    rows = []
    for f, (at, tail) in sorted(meta.items(), key=lambda kv: kv[1][0]):
        k = int(np.prod(tail)) if tail else 1
        v = out[f]
        assert v.shape[0] == k, (f, v.shape, k)
        rows.append(v)
    bigT = jnp.concatenate(rows, axis=0)
    assert bigT.shape[0] == k_all
    return bigT


# ------------------------------- wrappers ---------------------------------


_SIDE_OFFS = (0, 4, 7, 8, 11, 14, 17, 26, 29)  # see _cm_build docstring
_W_SIDE = 29


def _build_pallas_call(aT, bT, nT, ptsT, distT, *, p_max, s_len, consts,
                       meta_t, k_all):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = aT.shape[1]
    meta = dict(meta_t)
    restitution, inv_dt, friction, cfm_factor = consts

    def kernel(a_ref, b_ref, n_ref, p_ref, d_ref, out_ref):
        out_ref[...] = _cm_build(
            a_ref[...], b_ref[...], _SIDE_OFFS, n_ref[...], p_ref[...],
            d_ref[...], p_max=p_max, s_len=s_len, restitution=restitution,
            inv_dt=inv_dt, friction=friction, cfm_factor=cfm_factor,
            meta=meta, k_all=k_all)

    grid = (-(-c // CHUNK),)
    lane_spec = lambda rows: pl.BlockSpec(
        (rows, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[lane_spec(_W_SIDE), lane_spec(_W_SIDE), lane_spec(3),
                  lane_spec(3 * p_max), lane_spec(p_max)],
        out_specs=lane_spec(k_all),
        out_shape=jax.ShapeDtypeStruct((k_all, c), jnp.float32),
        interpret=pallas_interpret(),
    )(aT, bT, nT, ptsT, distT)


def build_constraints_fused(poses, vels, mprops, contacts, params,
                            use_pallas: bool | None = None):
    """Drop-in for ``build_constraints`` (3D) that also returns the packed
    transposed field matrix: ``(cons, bigT, meta)``.

    ``bigT`` [K, C] is in ``pad_solver_fields_packed`` order, so the fused
    solver path uses it directly (winT = bigT[:k_pack] — zero repacking);
    ``cons`` fields are row-major views sliced from bigT's transpose for
    every other consumer.
    """
    from wgmath_tpu.dynamics.constraint import ContactConstraints

    dim = contacts.dim
    assert dim == 3, "fused builder is 3D-only"
    p_max = contacts.points_a.shape[1]
    s_len = 2
    meta, k_all = field_meta(p_max, s_len)

    n_b = poses.rotation.shape[0]
    id1, id2 = contacts.body_a, contacts.body_b
    cols = [poses.rotation, poses.translation, poses.scale,
            vels.linear, vels.angular, mprops.inv_mass,
            mprops.inv_inertia.reshape(n_b, -1), mprops.com]
    cols = [x[:, None] if x.ndim == 1 else x for x in cols]
    packed = jnp.concatenate(cols, axis=1)
    assert packed.shape[1] == _W_SIDE
    pp = packed[jnp.concatenate([id1, id2])]  # the ONE gather
    c = id1.shape[0]
    ppT = pp.T
    aT, bT = ppT[:, :c], ppT[:, c:]
    nT = contacts.normal_a.T
    ptsT = contacts.points_a.reshape(c, -1).T
    distT = contacts.dist.T

    consts = (float(params.restitution), float(params.inv_dt),
              float(params.friction), float(params.contact_cfm_factor))
    meta_t = tuple(sorted((k, (a, tuple(t))) for k, (a, t) in meta.items()))
    if use_pallas is None:
        use_pallas = on_tpu()
    if use_pallas:
        bigT = _build_pallas_call(aT, bT, nT, ptsT, distT, p_max=p_max,
                                  s_len=s_len, consts=consts, meta_t=meta_t,
                                  k_all=k_all)
    else:
        bigT = _cm_build(aT, bT, _SIDE_OFFS, nT, ptsT, distT, p_max=p_max,
                         s_len=s_len, restitution=consts[0],
                         inv_dt=consts[1], friction=consts[2],
                         cfm_factor=consts[3], meta=meta, k_all=k_all)

    big = bigT.T  # [C, K] row-major for the field views
    fields = {}
    for f, (at, tail) in meta.items():
        k = int(np.prod(tail)) if tail else 1
        fields[f] = jax.lax.slice_in_dim(big, at, at + k,
                                         axis=1).reshape((c,) + tail)
    zeros_p = jnp.zeros((c, p_max), jnp.float32)
    zeros_ps = jnp.zeros((c, p_max, s_len), jnp.float32)
    cons = ContactConstraints(
        body_a=id1, body_b=id2, valid=contacts.valid,
        num_points=contacts.num_points,
        n_impulse=zeros_p, n_impulse_jacobi=zeros_p,
        t_impulse=zeros_ps, t_impulse_jacobi=zeros_ps,
        **fields)
    return cons, bigT, meta
