"""Multi-point contact manifolds for support-mapped (PFM) pairs.

≙ the reference's polygonal-feature pipeline: after GJK/EPA produces the
contact normal, both shapes' support FACES along ±n are extracted and
clipped against each other in the contact plane, and the candidate set is
reduced to ≤ 4 points (contact_pfm_pfm.wgsl contact_manifold_pfm_pfm,
polygonal_feature.wgsl contacts/contacts_face_face/contacts_edge_edge/
manifold_reduction; per-shape support_face: capsule.wgsl:172,
cylinder.wgsl:169, cone.wgsl:179, triangle.wgsl:287, cuboid.wgsl:124,
convex_polyhedron.wgsl:75).

TPU-first restructuring: the reference branches per thread between
edge-edge / face-face sub-kernels with early exits; here every pair
evaluates all FIXED-SIZE candidate groups under masks — 4 f1-vertex-in-f2
tests, 4 f2-vertex-in-f1 tests, 16 projected edge crossings, and a 2-point
parallel edge-edge range clip — then one vectorized 4-point reduction. The
reference's early-exit paths become gate masks so the selected candidate
set matches its sequential semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from wgmath_tpu.geometry import quat
from wgmath_tpu.geometry.sim import Sim
from wgmath_tpu.queries.gjk import support_core
from wgmath_tpu.shapes import shape as shp

_EPS = 1.1920929e-7
_COS_PI_8 = 0.92387953251


def _orthonormal_basis(v):
    """Two unit vectors orthogonal to unit v [N,3] (reference
    orthonormal_basis3, the Duff et al. branchless construction)."""
    sign = jnp.where(v[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + v[:, 2])
    b = v[:, 0] * v[:, 1] * a
    t1 = jnp.stack([1.0 + sign * v[:, 0] * v[:, 0] * a, sign * b,
                    -sign * v[:, 0]], -1)
    t2 = jnp.stack([b, sign + v[:, 1] * v[:, 1] * a, -v[:, 1]], -1)
    return t1, t2


def support_face(tag, par, d, vertices=None, indices=None):
    """Support polygonal feature of each shape's CORE along unit dir ``d``
    (local frame): up to 4 vertices + count. Rounded shapes (ball, capsule)
    contribute their core feature — the dilation radius is applied by the
    caller, mirroring the reference's pfm_subshape border_radius handling.

    Returns ``(verts [N,4,3], nv [N])``; unused vertex slots repeat the
    last valid vertex so downstream edge math stays finite.
    """
    n = d.shape[0]
    sup, _ = support_core(tag, par, d, vertices)
    verts = jnp.broadcast_to(sup[:, None, :], (n, 4, 3))
    nv = jnp.ones((n,), jnp.int32)

    def blend(mask, v_new, nv_new):
        return (jnp.where(mask[:, None, None], v_new, verts),
                jnp.where(mask, nv_new, nv))

    zero = jnp.zeros((n, 3), jnp.float32)

    # --- capsule core: the full segment, always (capsule.wgsl:174 with the
    # radius stripped by pfm_subshape)
    if_cap = tag == shp.CAPSULE
    hh = par[:, 0]
    cap = jnp.stack([zero.at[:, 1].add(-hh), zero.at[:, 1].add(hh)], 1)
    verts, nv = blend(if_cap, jnp.concatenate([cap, cap], 1), 2)

    # --- standalone segment colliders: params = [a | b]
    if_seg = tag == shp.SEGMENT
    segf = jnp.stack([par[:, :3], par[:, 3:6]], 1)
    verts, nv = blend(if_seg, jnp.concatenate([segf, segf], 1), 2)

    # --- cuboid: the face whose outward axis best aligns with d
    if_cub = tag == shp.CUBOID
    from wgmath_tpu.queries.sat import _box_face_vertices

    axis = jnp.argmax(jnp.abs(d), axis=-1).astype(jnp.int32)
    sgn = jnp.where(jnp.take_along_axis(d, axis[:, None], -1)[:, 0] >= 0.0,
                    1.0, -1.0)
    verts, nv = blend(if_cub, _box_face_vertices(par[:, :3], axis, sgn), 4)

    # --- cylinder / cone: planar dir in the xz plane
    dxz = jnp.stack([d[:, 0], d[:, 2]], -1)
    lxz = jnp.linalg.norm(dxz, axis=-1, keepdims=True)
    dxz = jnp.where(lxz > _EPS, dxz / jnp.maximum(lxz, 1e-30),
                    jnp.asarray([1.0, 0.0], jnp.float32))
    dx, dz = dxz[:, 0], dxz[:, 1]

    def rim_square(r, y):
        """4-point square approximation of a cap/disc at height y."""
        p0 = jnp.stack([dx * r, y, dz * r], -1)
        p1 = jnp.stack([-dz * r, y, dx * r], -1)
        p2 = jnp.stack([-dx * r, y, -dz * r], -1)
        p3 = jnp.stack([dz * r, y, -dx * r], -1)
        return jnp.stack([p0, p1, p2, p3], 1)

    if_cyl = tag == shp.CYLINDER
    r_cyl = par[:, 1]
    side = jnp.stack([jnp.stack([dx * r_cyl, -hh, dz * r_cyl], -1),
                      jnp.stack([dx * r_cyl, hh, dz * r_cyl], -1)], 1)
    side = jnp.concatenate([side, side], 1)
    y_cap = jnp.where(d[:, 1] >= 0.0, hh, -hh)
    cap_sq = rim_square(r_cyl, y_cap)
    cyl_side = jnp.abs(d[:, 1]) < 0.5
    verts, nv = blend(if_cyl, jnp.where(cyl_side[:, None, None], side,
                                        cap_sq),
                      jnp.where(cyl_side, 2, 4))

    if_cone = tag == shp.CONE
    r_cone = par[:, 1]
    apex = zero.at[:, 1].add(hh)
    slant = jnp.stack([jnp.stack([dx * r_cone, -hh, dz * r_cone], -1),
                       apex], 1)
    slant = jnp.concatenate([slant, slant], 1)
    base_sq = rim_square(r_cone, -hh)
    cone_up = d[:, 1] > 0.0
    verts, nv = blend(if_cone, jnp.where(cone_up[:, None, None], slant,
                                         base_sq),
                      jnp.where(cone_up, 2, 4))

    # --- triangle collider (vertex-range params [first, 3])
    if vertices is not None and vertices.shape[0] > 0:
        if_tri = tag == shp.TRIANGLE
        first = par[:, 0].astype(jnp.int32)
        vmax = vertices.shape[0] - 1
        tri = jnp.stack(
            [vertices[jnp.minimum(first + k, vmax)] for k in (0, 1, 2, 2)],
            1)
        verts, nv = blend(if_tri, tri, 3)

        # --- convex polyhedron: best stored hull face by unit-normal · d
        # (convex_polyhedron.wgsl:75); faces live in the shared index
        # buffer at params [first_idx, num_idx)
        if indices is not None and indices.shape[0] > 0:
            if_cvx = tag == shp.CONVEX
            fv = vertices[indices]  # [F, 3, 3]
            fn = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
            fl = jnp.linalg.norm(fn, axis=-1, keepdims=True)
            fn = jnp.where(fl > 0.0, fn / jnp.maximum(fl, 1e-30), 0.0)
            first_f = par[:, 2].astype(jnp.int32)
            num_f = par[:, 3].astype(jnp.int32)
            f_idx = jnp.arange(indices.shape[0], dtype=jnp.int32)
            dots = jnp.einsum("nd,fd->nf", d, fn)
            in_rng = ((f_idx[None, :] >= first_f[:, None])
                      & (f_idx[None, :] < (first_f + num_f)[:, None]))
            best = jnp.argmax(jnp.where(in_rng, dots, -jnp.inf), axis=-1)
            bf = fv[best]  # [N, 3, 3]
            cvx = jnp.concatenate([bf, bf[:, 2:3]], 1)
            verts, nv = blend(if_cvx, cvx, 3)
    return verts, nv


def _point_in_poly(p, poly, nvp):
    """Sign-consistency test of 2D point p [N,2] against convex polygon
    poly [N,4,2] with nvp valid vertices (either winding; zero-length
    edges ignored — the reference's sign-adoption loop)."""
    pos = jnp.zeros(p.shape[0], bool)
    neg = jnp.zeros(p.shape[0], bool)
    for k in range(4):
        jn = jnp.where(k + 1 >= nvp, 0, k + 1)
        a = poly[:, k]
        b = jnp.take_along_axis(poly, jn[:, None, None].repeat(2, -1),
                                1)[:, 0]
        perp = ((b[:, 0] - a[:, 0]) * (p[:, 1] - a[:, 1])
                - (b[:, 1] - a[:, 1]) * (p[:, 0] - a[:, 0]))
        live = k < nvp
        pos |= live & (perp > 0.0)
        neg |= live & (perp < 0.0)
    return ~(pos & neg)


def _closest_line2d(a1, b1, a2, b2):
    """Barycentric (s, t) of the crossing of two 2D lines; (inf, inf) when
    parallel (reference closest_points_line2d)."""
    d1 = b1 - a1
    d2 = b2 - a2
    r = a1 - a2
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    denom = a * e - b * b
    ok = (a > _EPS) & (e > _EPS) & (denom > _EPS)
    s = jnp.where(ok, (b * f - c * e) / jnp.where(ok, denom, 1.0), jnp.inf)
    t = jnp.where(ok, (b * s + f) / jnp.where(e > _EPS, e, 1.0), jnp.inf)
    return s, t


def _reduce4(pts, dist, valid, normal):
    """Reduce masked candidates [N,C] to ≤ 4 manifold points (reference
    manifold_reduction: deepest → furthest → tangent extremes). Pads unused
    slots with dist 1e9."""
    n, C = dist.shape
    idx = jnp.arange(C, dtype=jnp.int32)[None, :]
    count = jnp.sum(valid.astype(jnp.int32), -1)
    INF = jnp.float32(1e10)

    i0 = jnp.argmin(jnp.where(valid, dist, INF), -1).astype(jnp.int32)
    p0 = jnp.take_along_axis(pts, i0[:, None, None].repeat(3, -1), 1)[:, 0]
    sq = jnp.sum((pts - p0[:, None, :]) ** 2, -1)
    m1 = valid & (idx != i0[:, None])
    i1 = jnp.argmax(jnp.where(m1, sq, -INF), -1).astype(jnp.int32)
    p1 = jnp.take_along_axis(pts, i1[:, None, None].repeat(3, -1), 1)[:, 0]
    tangent = jnp.cross(p1 - p0, normal)
    td = jnp.einsum("ncd,nd->nc", pts - p0[:, None, :], tangent)
    m2 = m1 & (idx != i1[:, None])
    i2 = jnp.argmin(jnp.where(m2, td, INF), -1).astype(jnp.int32)
    i3 = jnp.argmax(jnp.where(m2, td, -INF), -1).astype(jnp.int32)

    sel = jnp.stack([i0, i1, i2, i3], -1)  # [N, 4]
    ok = jnp.stack([count >= 1, count >= 2, count >= 3,
                    (count >= 4) & (i2 != i3)], -1)
    out_p = jnp.take_along_axis(pts, sel[..., None].repeat(3, -1), 1)
    out_d = jnp.take_along_axis(dist, sel, 1)
    out_d = jnp.where(ok, out_d, 1e9)
    out_p = jnp.where(ok[..., None], out_p, 0.0)
    return out_p, out_d, jnp.sum(ok.astype(jnp.int32), -1)


def feature_contacts(f1, nv1, f2, nv2, n_a, prediction):
    """Candidate contact points between two polygonal features, both in A's
    local frame, separated along unit axis ``n_a`` (A→B). Returns
    ``(pts [N,26,3] on A, dist [N,26], valid [N,26])``.
    """
    n = n_a.shape[0]
    t1, t2 = _orthonormal_basis(n_a)
    proj = lambda v: jnp.stack([jnp.einsum("nkd,nd->nk", v, t1),
                                jnp.einsum("nkd,nd->nk", v, t2)], -1)
    P1 = proj(f1)  # [N, 4, 2]
    P2 = proj(f2)

    pts, dists, valids = [], [], []

    # --- group A: f1's vertices inside f2's projected face ----------------
    n2 = jnp.cross(f2[:, 2] - f2[:, 1], f2[:, 0] - f2[:, 1])
    den2 = jnp.einsum("nd,nd->n", n2, n_a)
    gA = (nv2 > 2) & (jnp.abs(den2) > _EPS)
    outA = jnp.zeros((n,), bool)
    for i in range(4):
        inside = _point_in_poly(P1[:, i], P2, nv2)
        live = gA & (i < nv1)
        outA |= live & ~inside
        d_i = (jnp.einsum("nd,nd->n", f2[:, 0] - f1[:, i], n2)
               / jnp.where(den2 != 0.0, den2, 1.0))
        valids.append(live & inside & (d_i <= prediction))
        pts.append(f1[:, i])
        dists.append(d_i)
    # reference early-exit: if every f1 vertex projected inside f2, later
    # groups never run
    gateB = ~(gA & ~outA)

    # --- group B: f2's vertices inside f1's projected face ----------------
    n1 = jnp.cross(f1[:, 2] - f1[:, 1], f1[:, 0] - f1[:, 1])
    den1 = -jnp.einsum("nd,nd->n", n1, n_a)
    gB = gateB & (nv1 > 2) & (jnp.abs(den1) > _EPS)
    outB = jnp.zeros((n,), bool)
    for j in range(4):
        inside = _point_in_poly(P2[:, j], P1, nv1)
        live = gB & (j < nv2)
        outB |= live & ~inside
        d_j = (jnp.einsum("nd,nd->n", f1[:, 0] - f2[:, j], n1)
               / jnp.where(den1 != 0.0, den1, 1.0))
        valids.append(live & inside & (d_j <= prediction))
        pts.append(f2[:, j] - d_j[:, None] * n_a)
        dists.append(d_j)
    gateC = gateB & ~(gB & ~outB)

    # --- group C: projected edge crossings ---------------------------------
    def edge(poly, k, nvp):
        jn = jnp.where(k + 1 >= nvp, 0, k + 1)
        return poly[:, k], jnp.take_along_axis(
            poly, jn[:, None, None].repeat(poly.shape[-1], -1), 1)[:, 0]

    # a 2-vertex feature has ONE real edge (its wraparound is the reverse
    # duplicate); 1-vertex features have none
    ne1 = jnp.where(nv1 > 2, nv1, nv1 - 1)
    ne2 = jnp.where(nv2 > 2, nv2, nv2 - 1)
    for i in range(4):
        e1a2, e1b2 = edge(P1, i, nv1)
        e1a3, e1b3 = edge(f1, i, nv1)
        for j in range(4):
            e2a2, e2b2 = edge(P2, j, nv2)
            e2a3, e2b3 = edge(f2, j, nv2)
            s, t = _closest_line2d(e1a2, e1b2, e2a2, e2b2)
            cross = (s > 0.0) & (s < 1.0) & (t > 0.0) & (t < 1.0)
            p1c = e1a3 + (e1b3 - e1a3) * jnp.where(cross, s, 0.0)[:, None]
            p2c = e2a3 + (e2b3 - e2a3) * jnp.where(cross, t, 0.0)[:, None]
            d_c = jnp.einsum("nd,nd->n", p2c - p1c, n_a)
            valids.append(gateC & (i < ne1) & (j < ne2) & cross
                          & (d_c <= prediction))
            pts.append(p1c)
            dists.append(d_c)

    # --- group D: parallel edge-edge range clip (contacts_edge_edge's
    # conformal branch) — the only multi-point source for segment features
    is_ee = (nv1 == 2) & (nv2 == 2)
    u3 = f1[:, 1] - f1[:, 0]
    L1 = jnp.linalg.norm(u3, axis=-1)
    u = u3 / jnp.maximum(L1, 1e-30)[:, None]
    t1p = P1[:, 1] - P1[:, 0]
    t2p = P2[:, 1] - P2[:, 0]
    l1p = jnp.linalg.norm(t1p, axis=-1)
    l2p = jnp.linalg.norm(t2p, axis=-1)
    cosang = jnp.abs(jnp.sum(t1p * t2p, -1)
                     / jnp.maximum(l1p * l2p, 1e-30))
    parallel = (l1p <= _EPS) | (l2p <= _EPS) | (cosang >= _COS_PI_8)
    ta = jnp.einsum("nd,nd->n", f2[:, 0] - f1[:, 0], u)
    tb = jnp.einsum("nd,nd->n", f2[:, 1] - f1[:, 0], u)
    lo = jnp.maximum(0.0, jnp.minimum(ta, tb))
    hi = jnp.minimum(L1, jnp.maximum(ta, tb))
    nonempty = lo <= hi
    denom_t = jnp.where(jnp.abs(tb - ta) > 1e-12, tb - ta, 1.0)
    for bound in (lo, hi):
        p1c = f1[:, 0] + u * bound[:, None]
        s2 = (bound - ta) / denom_t
        p2c = f2[:, 0] + (f2[:, 1] - f2[:, 0]) * s2[:, None]
        d_c = jnp.einsum("nd,nd->n", p2c - p1c, n_a)
        valids.append(is_ee & parallel & nonempty & (d_c <= prediction))
        pts.append(p1c)
        dists.append(d_c)

    return (jnp.stack(pts, 1), jnp.stack(dists, 1), jnp.stack(valids, 1))


def pfm_manifold(tag_a, par_a, pose_a: Sim, tag_b, par_b, pose_b: Sim,
                 n_gjk, pt_gjk, dist_gjk, prediction,
                 vertices=None, indices=None):
    """Up-to-4-point manifold for support-mapped pairs, built on top of a
    ``pfm_contact`` result (contact normal ``n_gjk`` + witness ``pt_gjk`` +
    ``dist_gjk``, all A-local with the dilation radii applied).

    Returns ``(points [N,4,3] on A's surface (A-local), dist [N,4],
    num_points [N])``; the GJK/EPA witness itself is appended whenever the
    clip yields < 4 points (contact_pfm_pfm.wgsl:100-104), so
    ``num_points >= 1`` always.
    """
    q_ab = quat.mul(quat.inv(pose_a.rotation), pose_b.rotation)
    r_ab = quat.to_matrix(q_ab)
    t_ab = quat.inv_mul_vec(pose_a.rotation,
                            pose_b.translation - pose_a.translation)
    t_ab = t_ab / pose_a.scale[..., None]

    d0 = jnp.zeros_like(n_gjk).at[:, 1].set(1.0)
    _, rad_a = support_core(tag_a, par_a, d0)
    _, rad_b = support_core(tag_b, par_b, d0)

    f1, nv1 = support_face(tag_a, par_a, n_gjk, vertices, indices)
    n_b = jnp.einsum("nij,ni->nj", r_ab, -n_gjk)
    f2_loc, nv2 = support_face(tag_b, par_b, n_b, vertices, indices)
    f2 = t_ab[:, None, :] + jnp.einsum("nij,nkj->nki", r_ab, f2_loc)

    # cores clip against a prediction widened by both dilation radii
    # (contact_pfm_pfm.wgsl total_prediction)
    total_pred = prediction + rad_a + rad_b
    c_pts, c_dist, c_valid = feature_contacts(f1, nv1, f2, nv2, n_gjk,
                                              total_pred)
    pts4, d4, len4 = _reduce4(c_pts, c_dist, c_valid, n_gjk)
    # dilation adjust: push the points out to A's real surface, shrink dist
    pts4 = pts4 + (n_gjk * rad_a[:, None])[:, None, :]
    d4 = jnp.where(d4 < 1e8, d4 - (rad_a + rad_b)[:, None], d4)

    # append the GJK witness when the clip found < 4 points
    app = len4 < 4
    slot = jnp.minimum(len4, 3)
    one_hot = (jnp.arange(4, dtype=jnp.int32)[None, :] == slot[:, None]) \
        & app[:, None]
    pts4 = jnp.where(one_hot[..., None], pt_gjk[:, None, :], pts4)
    d4 = jnp.where(one_hot, dist_gjk[:, None], d4)
    num = len4 + app.astype(jnp.int32)
    return pts4, d4, num
