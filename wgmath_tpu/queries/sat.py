"""SAT cuboid-cuboid contact manifolds (≙ wgparry queries/sat.rs +
queries/polygonal_feature.rs face clipping, used by the cuboid_cuboid narrow
phase, queries/contact.rs:93-141).

Fully batched, branch-free 3D box-box SAT: 15 candidate axes (6 face + 9 edge
cross products), face-preference bias against jitter, incident-face clipping
with a fixed 8-vertex polygon buffer, reduction to a 4-point manifold by
plane-extreme selection. Everything evaluates on all pairs with masks — the
TPU replacement for the reference's per-thread divergent branching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wgmath_tpu.geometry import quat
from wgmath_tpu.geometry.sim import Sim

_FACE_BIAS = 0.98  # relative preference for face axes over edge axes
_EPS = 1e-6


def cuboid_cuboid_manifold(pose_a: Sim, pose_b: Sim, he_a: jax.Array,
                           he_b: jax.Array, prediction: float):
    """Batched box-box manifold.

    Returns ``(normal_a, points_a, dists, num_points)``:
    - ``normal_a`` [N,3]: contact normal in A's local frame, pointing A→B;
    - ``points_a`` [N,4,3]: contact points on/near A's surface, A-local;
    - ``dists`` [N,4]: signed distances (<0 penetrating);
    - ``num_points`` [N] int32.
    """
    # Work in A's local frame. B's rotation/translation relative to A:
    q_ab = quat.mul(quat.inv(pose_a.rotation), pose_b.rotation)
    r = quat.to_matrix(q_ab)  # [N,3,3] columns = B axes in A frame
    t = quat.inv_mul_vec(pose_a.rotation,
                         pose_b.translation - pose_a.translation)
    t = t / pose_a.scale[..., None]
    he_b_eff = he_b * (pose_b.scale / pose_a.scale)[..., None]
    abs_r = jnp.abs(r) + _EPS

    # --- separations on all 15 axes ------------------------------------------
    # A face axes (i): sep = |t_i| − (he_a_i + Σ_j he_b_j |R_ij|)
    sep_a = jnp.abs(t) - (he_a + jnp.einsum("nij,nj->ni", abs_r, he_b_eff))
    # B face axes (j): sep = |t·R_:,j| − (Σ_i he_a_i |R_ij| + he_b_j)
    t_b = jnp.einsum("nij,ni->nj", r, t)
    sep_b = jnp.abs(t_b) - (jnp.einsum("nij,ni->nj", abs_r, he_a) + he_b_eff)

    # edge axes a_i × b_j
    edge_sep = []
    edge_axis = []
    for i in range(3):
        i1, i2 = (i + 1) % 3, (i + 2) % 3
        for j in range(3):
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            # axis = e_i × R_:,j  (A-frame); standard closed form
            axis = jnp.stack([
                jnp.zeros_like(t[:, 0]) if i == 0 else (-r[:, 2, j] if i == 1 else r[:, 1, j]),
                r[:, 2, j] if i == 0 else (jnp.zeros_like(t[:, 0]) if i == 1 else -r[:, 0, j]),
                -r[:, 1, j] if i == 0 else (r[:, 0, j] if i == 1 else jnp.zeros_like(t[:, 0])),
            ], axis=-1)
            ln = jnp.linalg.norm(axis, axis=-1)
            ok = ln > 1e-4  # near-parallel edges → skip axis
            axis_u = axis / jnp.maximum(ln, 1e-30)[:, None]
            ra = (he_a[:, i1] * jnp.abs(axis_u[:, i1]).clip(0)
                  + he_a[:, i2] * jnp.abs(axis_u[:, i2]))
            # projection radii: for A only components i1, i2 matter (axis ⟂ e_i)
            ra = (he_a[:, i1] * jnp.abs(axis_u[:, i1])
                  + he_a[:, i2] * jnp.abs(axis_u[:, i2]))
            proj_b = jnp.abs(jnp.einsum("nk,nkj->nj", axis_u, r))
            rb = he_b_eff[:, j1] * proj_b[:, j1] + he_b_eff[:, j2] * proj_b[:, j2]
            sep = jnp.abs(jnp.sum(t * axis_u, axis=-1)) - (ra + rb)
            edge_sep.append(jnp.where(ok, sep, -jnp.inf))
            edge_axis.append(axis_u)
    edge_sep = jnp.stack(edge_sep, axis=-1)  # [N,9]
    edge_axis = jnp.stack(edge_axis, axis=-2)  # [N,9,3]

    face_sep = jnp.concatenate([sep_a, sep_b], axis=-1)  # [N,6]
    best_face = jnp.argmax(face_sep, axis=-1)
    best_face_sep = jnp.take_along_axis(face_sep, best_face[:, None], -1)[:, 0]
    best_edge = jnp.argmax(edge_sep, axis=-1)
    best_edge_sep = jnp.take_along_axis(edge_sep, best_edge[:, None], -1)[:, 0]

    # prefer faces: edge wins only if meaningfully better (sign-safe form —
    # a multiplicative bias alone flips meaning for negative separations)
    use_edge = best_edge_sep > best_face_sep * _FACE_BIAS + 1.0e-3
    separation = jnp.maximum(best_face_sep, jnp.where(use_edge, best_edge_sep,
                                                      -jnp.inf))

    # --- contact normal (A-frame, pointing A→B) ------------------------------
    eye = jnp.eye(3, dtype=t.dtype)
    face_axis_a = eye[best_face % 3]  # valid when best_face < 3
    face_axis_b = jnp.take_along_axis(
        r, (best_face - 3).clip(0)[:, None, None].repeat(3, 1), axis=2)[:, :, 0]
    n_face = jnp.where((best_face < 3)[:, None], face_axis_a, face_axis_b)
    n_edge = jnp.take_along_axis(
        edge_axis, best_edge[:, None, None].repeat(3, 2), axis=1)[:, 0]
    normal = jnp.where(use_edge[:, None], n_edge, n_face)
    # orient A→B
    flip = jnp.sum(normal * t, axis=-1) < 0.0
    normal = jnp.where(flip[:, None], -normal, normal)

    # --- manifold generation --------------------------------------------------
    pts_face, dist_face, np_face = _face_clip_manifold(
        r, t, he_a, he_b_eff, normal, best_face, prediction)
    pts_edge, dist_edge = _edge_edge_point(r, t, he_a, he_b_eff, normal,
                                           best_edge)

    points = jnp.where(use_edge[:, None, None],
                       jnp.concatenate([pts_edge[:, None],
                                        jnp.zeros_like(pts_face[:, :3])], axis=1),
                       pts_face)
    dists = jnp.where(use_edge[:, None],
                      jnp.concatenate([dist_edge[:, None],
                                       jnp.full_like(dist_face[:, :3], 1e9)], axis=1),
                      dist_face)
    num_points = jnp.where(use_edge, 1, np_face)
    hit = separation < prediction
    num_points = jnp.where(hit, num_points, 0)
    return normal, points, dists, num_points


def _box_face_vertices(he, axis_idx, sign):
    """4 vertices of the box face with outward normal sign*e_axis [N,4,3]."""
    n = he.shape[0]
    a1 = (axis_idx + 1) % 3
    a2 = (axis_idx + 2) % 3
    corners = jnp.asarray([[1, 1], [1, -1], [-1, -1], [-1, 1]], he.dtype)

    def vert(c):
        v = jnp.zeros((n, 3), he.dtype)
        v = jnp.put_along_axis(v, axis_idx[:, None],
                               sign[:, None] * jnp.take_along_axis(he, axis_idx[:, None], -1),
                               axis=-1, inplace=False)
        v = jnp.put_along_axis(v, a1[:, None],
                               c[0] * jnp.take_along_axis(he, a1[:, None], -1),
                               axis=-1, inplace=False)
        v = jnp.put_along_axis(v, a2[:, None],
                               c[1] * jnp.take_along_axis(he, a2[:, None], -1),
                               axis=-1, inplace=False)
        return v

    return jnp.stack([vert(c) for c in corners], axis=1)


def _face_clip_manifold(r, t, he_a, he_b, normal, best_face, prediction):
    """Reference-face vs incident-face clipping → up to 4 points (A-frame)."""
    n = t.shape[0]
    a_is_ref = best_face < 3

    # reference face: on A (axis best_face) or on B (axis best_face-3)
    ref_axis_idx = jnp.where(a_is_ref, best_face, best_face - 3)
    # normal already points A→B. Reference-face outward normal:
    #   if ref is A: +normal ; if ref is B: −normal (B's outward toward A)
    ref_n = jnp.where(a_is_ref[:, None], normal, -normal)

    # incident box data in A-frame
    # B vertices in A frame: t + R @ v_b ; A vertices: v_a
    # incident face = face of the *other* box most anti-parallel to ref_n
    # case 1: ref on A → incident on B
    ref_n_in_b = jnp.einsum("nij,ni->nj", r, ref_n)  # ref normal in B frame
    inc_axis_b = jnp.argmax(jnp.abs(ref_n_in_b), axis=-1)
    inc_sign_b = -jnp.sign(jnp.take_along_axis(ref_n_in_b, inc_axis_b[:, None], -1))[:, 0]
    verts_b = _box_face_vertices(he_b, inc_axis_b, inc_sign_b)  # B-local
    verts_b_in_a = t[:, None, :] + jnp.einsum("nij,nkj->nki", r, verts_b)

    # case 2: ref on B → incident on A
    inc_axis_a = jnp.argmax(jnp.abs(ref_n), axis=-1)
    inc_sign_a = -jnp.sign(jnp.take_along_axis(ref_n, inc_axis_a[:, None], -1))[:, 0]
    verts_a = _box_face_vertices(he_a, inc_axis_a, inc_sign_a)  # A-local already

    inc_verts = jnp.where(a_is_ref[:, None, None], verts_b_in_a, verts_a)  # [N,4,3]

    # reference face frame: center, two side axes + extents (A-frame)
    he_ref = jnp.where(a_is_ref[:, None], he_a, he_b)
    ref_sign = jnp.where(
        a_is_ref,
        jnp.sign(jnp.take_along_axis(ref_n, ref_axis_idx[:, None], -1))[:, 0],
        jnp.sign(jnp.take_along_axis(
            jnp.einsum("nij,ni->nj", r, ref_n), ref_axis_idx[:, None], -1))[:, 0],
    )
    # build ref face center + tangent axes in A frame
    eye = jnp.eye(3, dtype=t.dtype)
    ax_local = eye[ref_axis_idx]  # [N,3] local axis of ref box
    a1_idx = (ref_axis_idx + 1) % 3
    a2_idx = (ref_axis_idx + 2) % 3
    t1_local = eye[a1_idx]
    t2_local = eye[a2_idx]
    he_ref_n = jnp.take_along_axis(he_ref, ref_axis_idx[:, None], -1)[:, 0]
    he_t1 = jnp.take_along_axis(he_ref, a1_idx[:, None], -1)[:, 0]
    he_t2 = jnp.take_along_axis(he_ref, a2_idx[:, None], -1)[:, 0]

    def to_a_frame(v_local, on_a):
        v_b = jnp.einsum("nij,nj->ni", r, v_local)
        return jnp.where(on_a[:, None], v_local, v_b)

    ref_center = (to_a_frame(ax_local, a_is_ref) * (ref_sign * he_ref_n)[:, None]
                  + jnp.where(a_is_ref[:, None], 0.0, t))
    t1 = to_a_frame(t1_local, a_is_ref)
    t2 = to_a_frame(t2_local, a_is_ref)

    # clip incident quad against 4 side planes: |(p-center)·t1| ≤ he_t1 etc.
    # fixed 8-slot polygon buffer
    max_v = 8
    poly = jnp.concatenate([inc_verts,
                            jnp.zeros((n, max_v - 4, 3), t.dtype)], axis=1)
    count = jnp.full((n,), 4, jnp.int32)

    for plane_t, plane_d, sgn in ((t1, he_t1, 1.0), (t1, he_t1, -1.0),
                                  (t2, he_t2, 1.0), (t2, he_t2, -1.0)):
        poly, count = _clip_polygon(poly, count, ref_center, sgn * plane_t,
                                    plane_d, max_v)

    # distances to reference face plane (positive outside)
    rel = poly - ref_center[:, None, :]
    # contact dist for a point p on the incident face = (p−face)·ref_n
    d = jnp.einsum("nkd,nd->nk", rel, ref_n)
    slot = jnp.arange(max_v)
    valid = slot[None, :] < count[:, None]
    keep = valid & (d < prediction)

    # reduce to 4: extremes along the four face-plane diagonals (unique for
    # any convex polygon with ≥4 spread vertices; ties collapse by dedupe)
    score_base = jnp.where(keep, 0.0, -jnp.inf)
    c1 = jnp.einsum("nkd,nd->nk", rel, t1)
    c2 = jnp.einsum("nkd,nd->nk", rel, t2)
    picks = []
    for score in (score_base + c1 + c2, score_base + c1 - c2,
                  score_base - c1 - c2, score_base - c1 + c2):
        picks.append(jnp.argmax(score, axis=-1))
    picks = jnp.stack(picks, axis=1)  # [N,4]

    # dedupe picks (same slot chosen twice → count once)
    pts = jnp.take_along_axis(poly, picks[:, :, None].repeat(3, -1), axis=1)
    dsel = jnp.take_along_axis(d, picks, axis=1)
    any_keep = jnp.any(keep, axis=-1)
    first_new = jnp.ones((n, 4), bool)
    for i in range(1, 4):
        dup = jnp.zeros((n,), bool)
        for j in range(i):
            dup |= picks[:, i] == picks[:, j]
        first_new = first_new.at[:, i].set(~dup)
    valid_pts = first_new & any_keep[:, None]
    # project contact points onto the reference face plane midway? keep on
    # incident face (they carry the penetration depth)
    dsel = jnp.where(valid_pts, dsel, 1e9)
    num = jnp.sum(valid_pts, axis=-1).astype(jnp.int32)
    # compact: sort by validity so real points are first
    order = jnp.argsort(jnp.where(valid_pts, 0, 1), axis=-1, stable=True)
    pts = jnp.take_along_axis(pts, order[:, :, None].repeat(3, -1), axis=1)
    dsel = jnp.take_along_axis(dsel, order, axis=1)
    # convention (≙ contact.points_a on body A's surface): when the reference
    # face is A's, clipped points sit on B's incident face at depth d — slide
    # them up along the face normal onto A's surface
    shift = jnp.where((dsel < 1e8) & a_is_ref[:, None], dsel, 0.0)
    pts = pts - ref_n[:, None, :] * shift[:, :, None]
    return pts, dsel, num


def _clip_polygon(poly, count, center, axis, limit, max_v):
    """Sutherland–Hodgman step against plane (p−center)·axis ≤ limit,
    fixed-capacity, batched."""
    n, cap, _ = poly.shape
    d = jnp.einsum("nkd,nd->nk", poly - center[:, None, :], axis) - limit[:, None]
    slot = jnp.arange(cap)
    valid = slot[None, :] < count[:, None]

    nxt = jnp.where(slot[None, :] + 1 >= count[:, None], 0, slot[None, :] + 1)
    p_cur = poly
    p_nxt = jnp.take_along_axis(poly, nxt[:, :, None].repeat(3, -1), axis=1)
    d_cur = d
    d_nxt = jnp.take_along_axis(d, nxt, axis=1)

    inside_cur = d_cur <= 0.0
    inside_nxt = d_nxt <= 0.0
    # each edge emits: cur (if inside) and intersection (if crossing)
    tt = d_cur / jnp.where(jnp.abs(d_cur - d_nxt) < 1e-12, 1e-12, d_cur - d_nxt)
    p_int = p_cur + (p_nxt - p_cur) * tt[:, :, None]

    emit_cur = valid & inside_cur
    emit_int = valid & (inside_cur != inside_nxt)

    # compact both emissions into a fresh buffer via cumsum positions
    flags = jnp.concatenate([emit_cur, emit_int], axis=1)  # [N, 2*cap]
    pts = jnp.concatenate([p_cur, p_int], axis=1)
    # interleave order: cur_0, int_0, cur_1, int_1 … keeps polygon winding
    interleave = jnp.stack([jnp.arange(cap), cap + jnp.arange(cap)],
                           axis=1).reshape(-1)
    flags = flags[:, interleave]
    pts = pts[:, interleave]
    pos = jnp.cumsum(flags.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(flags & (pos < max_v), pos, max_v)
    out = jnp.zeros_like(poly)
    out = jax.vmap(lambda o, p, v: o.at[p].set(v, mode="drop"))(out, pos, pts)
    new_count = jnp.minimum(jnp.sum(flags, axis=1), max_v).astype(jnp.int32)
    return out, new_count


def _edge_edge_point(r, t, he_a, he_b, normal, best_edge):
    """Closest-point contact for the winning edge-edge axis (A-frame)."""
    i = best_edge // 3  # A edge direction index
    j = best_edge % 3  # B edge direction index
    n = t.shape[0]
    eye = jnp.eye(3, dtype=t.dtype)
    dir_a = eye[i]
    dir_b = jnp.take_along_axis(r, j[:, None, None].repeat(3, 1), axis=2)[:, :, 0]

    # supporting edge midpoints: clamp the box corner most along ±normal
    # A's edge: corner coordinates on the two axes ⟂ i, sign = toward B
    def edge_center(he, axes_eye, free_idx, n_dir, base):
        c = jnp.zeros((n, 3), t.dtype)
        for k in range(3):
            is_free = free_idx == k
            s = jnp.sign(jnp.sum(n_dir * axes_eye[:, :, k], axis=-1))
            s = jnp.where(s == 0, 1.0, s)
            hek = he[:, k]
            c = c + jnp.where(is_free[:, None], 0.0,
                              (s * hek)[:, None] * axes_eye[:, :, k])
        return base + c

    axes_a = jnp.broadcast_to(eye, (n, 3, 3))
    center_a = edge_center(he_a, axes_a, i, normal, jnp.zeros_like(t))
    center_b = edge_center(he_b, r, j, -normal, t)

    # closest points between two infinite lines, clamped to edge extents
    d1 = dir_a
    d2 = dir_b
    r12 = center_b - center_a
    a11 = jnp.sum(d1 * d1, axis=-1)
    a22 = jnp.sum(d2 * d2, axis=-1)
    a12 = jnp.sum(d1 * d2, axis=-1)
    b1 = jnp.sum(d1 * r12, axis=-1)
    b2 = jnp.sum(d2 * r12, axis=-1)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s = (b1 * a22 - b2 * a12) / det
    u = (b1 * a12 - b2 * a11) / det
    he_ai = jnp.take_along_axis(he_a, i[:, None], -1)[:, 0]
    he_bj = jnp.take_along_axis(he_b, j[:, None], -1)[:, 0]
    s = jnp.clip(s, -he_ai, he_ai)
    u = jnp.clip(u, -he_bj, he_bj)
    p_a = center_a + d1 * s[:, None]
    p_b = center_b + d2 * u[:, None]
    dist = jnp.sum((p_b - p_a) * normal, axis=-1)
    mid = 0.5 * (p_a + p_b)
    # report the point on A's side (constraint builder re-midpoints via dist/2)
    return p_a, dist


def cuboid_cuboid_manifold_2d(pose_a: Sim, pose_b: Sim, he_a: jax.Array,
                              he_b: jax.Array, prediction: float):
    """2D box-box SAT manifold (≙ the dim2 build of wgparry's cuboid_cuboid):
    4 face axes, reference-edge vs incident-edge clipping → up to 2 points.

    Returns (normal_a [N,2], points_a [N,2,2], dists [N,2], num_points [N]).
    """
    from wgmath_tpu.geometry import rot2

    r_a = rot2.to_matrix(pose_a.rotation)  # world←A
    r_b = rot2.to_matrix(pose_b.rotation)
    # B in A frame
    r = jnp.einsum("nji,njk->nik", r_a, r_b)  # R_aᵀ R_b
    t = rot2.inv_mul_vec(pose_a.rotation,
                         pose_b.translation - pose_a.translation)
    t = t / pose_a.scale[..., None]
    he_b_eff = he_b * (pose_b.scale / pose_a.scale)[..., None]
    abs_r = jnp.abs(r) + _EPS

    sep_a = jnp.abs(t) - (he_a + jnp.einsum("nij,nj->ni", abs_r, he_b_eff))
    t_b = jnp.einsum("nij,ni->nj", r, t)
    sep_b = jnp.abs(t_b) - (jnp.einsum("nij,ni->nj", abs_r, he_a) + he_b_eff)

    face_sep = jnp.concatenate([sep_a, sep_b], axis=-1)  # [N,4]
    best = jnp.argmax(face_sep, axis=-1)
    separation = jnp.take_along_axis(face_sep, best[:, None], -1)[:, 0]

    eye = jnp.eye(2, dtype=t.dtype)
    n_a = eye[best % 2]
    n_b = jnp.take_along_axis(r, (best - 2).clip(0)[:, None, None].repeat(2, 1),
                              axis=2)[:, :, 0]
    a_is_ref = best < 2
    normal = jnp.where(a_is_ref[:, None], n_a, n_b)
    flip = jnp.sum(normal * t, axis=-1) < 0.0
    normal = jnp.where(flip[:, None], -normal, normal)

    # incident edge on the other box: its axis most anti-parallel to normal
    ref_n = jnp.where(a_is_ref[:, None], normal, -normal)

    # incident box (B if ref on A else A) vertices of the incident edge
    def edge_verts(he, rot_cols, center, n_ref_in_box):
        ax = jnp.argmax(jnp.abs(n_ref_in_box), axis=-1)
        sgn = -jnp.sign(jnp.take_along_axis(n_ref_in_box, ax[:, None], -1))[:, 0]
        other = 1 - ax
        he_ax = jnp.take_along_axis(he, ax[:, None], -1)[:, 0]
        he_ot = jnp.take_along_axis(he, other[:, None], -1)[:, 0]
        col_ax = jnp.take_along_axis(rot_cols, ax[:, None, None].repeat(2, 1), 2)[:, :, 0]
        col_ot = jnp.take_along_axis(rot_cols, other[:, None, None].repeat(2, 1), 2)[:, :, 0]
        mid = center + col_ax * (sgn * he_ax)[:, None]
        return (mid + col_ot * he_ot[:, None], mid - col_ot * he_ot[:, None])

    eye_cols = jnp.broadcast_to(eye, r.shape)
    n_ref_in_b = jnp.einsum("nij,ni->nj", r, ref_n)
    vb0, vb1 = edge_verts(he_b_eff, r, t, n_ref_in_b)
    va0, va1 = edge_verts(he_a, eye_cols, jnp.zeros_like(t), ref_n)
    p0 = jnp.where(a_is_ref[:, None], vb0, va0)
    p1 = jnp.where(a_is_ref[:, None], vb1, va1)

    # clip against the reference edge's side planes
    ref_he = jnp.where(a_is_ref[:, None], he_a, he_b_eff)
    ref_ax = jnp.argmax(jnp.abs(jnp.where(a_is_ref[:, None], ref_n,
                                          jnp.einsum("nij,ni->nj", r, ref_n))),
                        axis=-1)
    ref_t_idx = 1 - ref_ax
    t_dir_local = jnp.take_along_axis(
        jnp.where(a_is_ref[:, None, None], eye_cols, r),
        ref_t_idx[:, None, None].repeat(2, 1), 2)[:, :, 0]
    ref_center = jnp.where(a_is_ref[:, None], 0.0, t)
    he_t = jnp.take_along_axis(ref_he, ref_t_idx[:, None], -1)[:, 0]

    def clip(p0, p1, axis_dir, center, lim):
        d0 = jnp.sum((p0 - center) * axis_dir, -1) - lim
        d1 = jnp.sum((p1 - center) * axis_dir, -1) - lim
        tt = d0 / jnp.where(jnp.abs(d0 - d1) < 1e-12, 1e-12, d0 - d1)
        pi = p0 + (p1 - p0) * tt[:, None]
        p0n = jnp.where((d0 > 0)[:, None], jnp.where((d1 <= 0)[:, None], pi, p0), p0)
        p1n = jnp.where((d1 > 0)[:, None], jnp.where((d0 <= 0)[:, None], pi, p1), p1)
        return p0n, p1n

    for sgn_t in (1.0, -1.0):
        p0, p1 = clip(p0, p1, sgn_t * t_dir_local, ref_center, he_t)

    ref_face_n = jnp.where(a_is_ref[:, None], normal, -normal)
    he_n = jnp.take_along_axis(ref_he, ref_ax[:, None], -1)[:, 0]
    face_pt = ref_center + ref_face_n * he_n[:, None]
    d0 = jnp.sum((p0 - face_pt) * ref_face_n, -1)
    d1 = jnp.sum((p1 - face_pt) * ref_face_n, -1)
    keep0 = d0 < prediction
    keep1 = d1 < prediction
    # slide incident points onto A's surface when the reference face is A's
    shift0 = jnp.where(keep0 & a_is_ref, d0, 0.0)
    shift1 = jnp.where(keep1 & a_is_ref, d1, 0.0)
    p0 = p0 - ref_face_n * shift0[:, None]
    p1 = p1 - ref_face_n * shift1[:, None]

    pts = jnp.stack([p0, p1], axis=1)
    dists = jnp.stack([jnp.where(keep0, d0, 1e9),
                       jnp.where(keep1, d1, 1e9)], axis=1)
    # compact: keep0 first
    swap = ~keep0 & keep1
    pts = jnp.where(swap[:, None, None], pts[:, ::-1], pts)
    dists = jnp.where(swap[:, None], dists[:, ::-1], dists)
    num = keep0.astype(jnp.int32) + keep1.astype(jnp.int32)
    num = jnp.where(separation < prediction, num, 0)
    return normal, pts, dists, num
