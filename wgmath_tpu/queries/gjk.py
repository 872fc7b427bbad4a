"""GJK: convex-pair distance / closest points on the CSO
(≙ wgparry queries/gjk: gjk.wgsl, voronoi_simplex{2,3}.wgsl, cso_point.wgsl,
mod.rs:16-70).

TPU-native design: the whole GJK loop runs *batched over pairs* inside one
``lax.while_loop`` — every pair keeps an active flag and the loop retires
when all pairs converge (bounded iteration count). The Voronoi simplex
(distance subalgorithm) is evaluated branch-free: all sub-feature cases are
computed and selected by mask, the exact trade the VPU prefers over the
reference's per-thread control flow.

Shapes are *support-mapped* (≙ cso_point.wgsl support functions): rounded
shapes (ball, capsule) contribute a core support + dilation radius, so
shallow penetrations of rounded shapes resolve without EPA.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from wgmath_tpu.geometry import quat
from wgmath_tpu.geometry.sim import Sim
from wgmath_tpu.shapes import shape as shp

MAX_ITERS = 32
EPS = 1e-6


# ---------------------------------------------------------------------------
# Support functions (local space) — ≙ per-shape support_point in WGSL
# ---------------------------------------------------------------------------


def support_core(tag, params, d, vertices=None, tri_verts=None,
                 tri_margin=0.0):
    """Farthest point of the shape's *core* along unit dir d [N,3], plus the
    dilation radius (ball/capsule rounding). core ⊕ ball(radius) = shape.

    ``vertices``: shared mesh vertex buffer — enables CONVEX polyhedra
    (params = [first_vtx, num_vtx, …]) via a masked arg-max over the shape's
    vertex range (≙ convex_polyhedron.wgsl support_point).
    """
    p = params
    zero = jnp.zeros_like(d)

    # ball: core = point at origin, radius = r
    sup = zero
    radius = jnp.where(tag == shp.BALL, p[:, 0], 0.0)

    # cuboid: sign(d) * he
    he = p[:, :3]
    cub = jnp.where(d >= 0.0, he, -he)
    sup = jnp.where((tag == shp.CUBOID)[:, None], cub, sup)

    # capsule: segment ± (0, hh, 0), radius
    seg = jnp.zeros_like(d).at[:, 1].set(jnp.where(d[:, 1] >= 0, p[:, 0], -p[:, 0]))
    sup = jnp.where((tag == shp.CAPSULE)[:, None], seg, sup)
    radius = jnp.where(tag == shp.CAPSULE, p[:, 1], radius)

    # cylinder: rim point
    dxz = jnp.stack([d[:, 0], jnp.zeros_like(d[:, 0]), d[:, 2]], axis=-1)
    nxz = jnp.linalg.norm(dxz, axis=-1, keepdims=True)
    rim = jnp.where(nxz > 1e-9, dxz / jnp.maximum(nxz, 1e-30), 0.0) * p[:, 1:2]
    cyl = rim.at[:, 1].set(jnp.where(d[:, 1] >= 0, p[:, 0], -p[:, 0]))
    sup = jnp.where((tag == shp.CYLINDER)[:, None], cyl, sup)

    # cone: apex (0, hh, 0) or base rim
    apex = jnp.zeros_like(d).at[:, 1].set(p[:, 0])
    base = rim.at[:, 1].set(-p[:, 0])
    # pick whichever has larger dot with d
    pick_apex = jnp.sum(apex * d, -1) >= jnp.sum(base * d, -1)
    cone = jnp.where(pick_apex[:, None], apex, base)
    sup = jnp.where((tag == shp.CONE)[:, None], cone, sup)

    # segment: better endpoint of params' [a | b] layout (standalone
    # SEGMENT colliders, ≙ segment.wgsl's support role in the PFM path)
    seg_a = p[:, :3]
    seg_b = p[:, 3:6]
    pick_a = jnp.sum(seg_a * d, -1) >= jnp.sum(seg_b * d, -1)
    seg_sup = jnp.where(pick_a[:, None], seg_a, seg_b)
    sup = jnp.where((tag == shp.SEGMENT)[:, None], seg_sup, sup)

    # triangle: arg-max over an explicit per-pair vertex triple [N, 3, 3]
    if tri_verts is not None:
        dots = jnp.einsum("nd,nkd->nk", d, tri_verts)
        best = jnp.argmax(dots, axis=-1)
        tri = jnp.take_along_axis(tri_verts, best[:, None, None].repeat(3, -1),
                                  1)[:, 0]
        sup = jnp.where((tag == shp.TRIANGLE)[:, None], tri, sup)
        radius = jnp.where(tag == shp.TRIANGLE, tri_margin, radius)

    # convex polyhedron: arg-max vertex over [first_vtx, first_vtx+num_vtx).
    # Standalone TRIANGLE colliders share the vertex-range layout
    # (params = [first_vtx, 3]) and route here when no per-pair triple was
    # supplied (the mesh narrow phase passes ``tri_verts`` instead).
    if vertices is not None and vertices.shape[0] > 0:
        vtx_range = (tag == shp.CONVEX)
        if tri_verts is None:
            vtx_range |= tag == shp.TRIANGLE
            radius = jnp.where(tag == shp.TRIANGLE, tri_margin, radius)
        first = p[:, 0].astype(jnp.int32)
        num = p[:, 1].astype(jnp.int32)
        v_idx = jnp.arange(vertices.shape[0], dtype=jnp.int32)
        dots = jnp.einsum("nd,vd->nv", d, vertices)
        in_range = ((v_idx[None, :] >= first[:, None])
                    & (v_idx[None, :] < (first + num)[:, None]))
        dots = jnp.where(in_range, dots, -jnp.inf)
        best = jnp.argmax(dots, axis=-1)
        cvx = vertices[best]
        sup = jnp.where(vtx_range[:, None], cvx, sup)
    return sup, radius


class CsoSupport(NamedTuple):
    """One CSO support sample: w = p_a − p_b (A-frame) + the witnesses."""

    w: jax.Array
    p_a: jax.Array
    p_b: jax.Array


def cso_support(tag_a, par_a, tag_b, par_b, r_ab, t_ab, d,
                vertices=None, tri_verts_a=None,
                tri_margin=0.0) -> CsoSupport:
    """Support of the configuration-space obstacle A ⊖ B along d (A-frame).
    ``r_ab``/``t_ab``: B's rotation matrix / translation in A's frame.
    ``tri_verts_a``: per-pair triangle vertices when A is a TRIANGLE."""
    sup_a, _ = support_core(tag_a, par_a, d, vertices, tri_verts_a, tri_margin)
    d_b = jnp.einsum("nij,ni->nj", r_ab, d)  # rotate d into B's frame
    sup_b_local, _ = support_core(tag_b, par_b, -d_b, vertices)
    sup_b = t_ab + jnp.einsum("nij,nj->ni", r_ab, sup_b_local)
    return CsoSupport(sup_a - sup_b, sup_a, sup_b)


# ---------------------------------------------------------------------------
# Voronoi simplex: closest point to origin + barycentrics, branch-free
# ---------------------------------------------------------------------------


def _closest_segment(a, b):
    """Closest point of segment [a,b] to origin → (lambda_b, keep_b_only?)."""
    ab = b - a
    t = -jnp.sum(a * ab, -1) / jnp.maximum(jnp.sum(ab * ab, -1), 1e-30)
    t = jnp.clip(t, 0.0, 1.0)
    return t


def _tri_bary(a, b, c):
    """Barycentric coords of the origin's closest point on triangle abc
    (Ericson region method), as (u, v, w) with u+v+w=1."""
    ab = b - a
    ac = c - a
    ap = -a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = -b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = -c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-30)
    v = vb / denom
    w = vc / denom
    u = 1.0 - v - w

    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0.0, 1.0)
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30),
                    0.0, 1.0)

    bary = jnp.stack([u, v, w], -1)
    bary = jnp.where(((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0))[:, None],
                     jnp.stack([jnp.zeros_like(t_bc), 1 - t_bc, t_bc], -1), bary)
    bary = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[:, None],
                     jnp.stack([1 - t_ac, jnp.zeros_like(t_ac), t_ac], -1), bary)
    bary = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[:, None],
                     jnp.stack([1 - t_ab, t_ab, jnp.zeros_like(t_ab)], -1), bary)
    bary = jnp.where(((d6 >= 0) & (d5 <= d6))[:, None],
                     jnp.stack([jnp.zeros_like(u), jnp.zeros_like(u),
                                jnp.ones_like(u)], -1), bary)
    bary = jnp.where(((d3 >= 0) & (d4 <= d3))[:, None],
                     jnp.stack([jnp.zeros_like(u), jnp.ones_like(u),
                                jnp.zeros_like(u)], -1), bary)
    bary = jnp.where(((d1 <= 0) & (d2 <= 0))[:, None],
                     jnp.stack([jnp.ones_like(u), jnp.zeros_like(u),
                                jnp.zeros_like(u)], -1), bary)
    return bary


def _simplex_closest(pts, size):
    """Closest point of the current simplex to the origin.

    pts: [N, 4, 3]; size: [N] in {1,2,3,4}. Returns (v [N,3], bary [N,4],
    contains_origin [N]). The simplex is reduced by zeroing barycentrics —
    slots with bary≈0 are dropped by the caller.
    """
    a, b, c, d = pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3]

    bary1 = jnp.concatenate([jnp.ones_like(a[:, :1]),
                             jnp.zeros_like(a[:, :1]).repeat(3, 1)], axis=1)

    t = _closest_segment(a, b)
    bary2 = jnp.stack([1 - t, t, jnp.zeros_like(t), jnp.zeros_like(t)], -1)

    b3 = _tri_bary(a, b, c)
    bary3 = jnp.concatenate([b3, jnp.zeros_like(t)[:, None]], axis=1)

    # tetrahedron: test origin against the 4 faces; if outside a face, take
    # that face's triangle solution; else origin is inside.
    def face_bary(p0, p1, p2, idx):
        fb = _tri_bary(p0, p1, p2)
        out = jnp.zeros_like(bary3)
        out = out.at[:, idx[0]].set(fb[:, 0])
        out = out.at[:, idx[1]].set(fb[:, 1])
        out = out.at[:, idx[2]].set(fb[:, 2])
        v = fb[:, 0:1] * p0 + fb[:, 1:2] * p1 + fb[:, 2:3] * p2
        return out, jnp.sum(v * v, -1)

    f_abc, d_abc = face_bary(a, b, c, (0, 1, 2))
    f_abd, d_abd = face_bary(a, b, d, (0, 1, 3))
    f_acd, d_acd = face_bary(a, c, d, (0, 2, 3))
    f_bcd, d_bcd = face_bary(b, c, d, (1, 2, 3))

    # signed-volume side tests: origin inside iff STRICTLY on the same side of
    # every face as the opposite vertex. Normalized + strict: degenerate
    # faces (duplicate simplex points → n ≈ 0) must NOT certify containment,
    # or near-touching configurations get falsely flagged intersecting.
    def same_side(p0, p1, p2, opp):
        n = jnp.cross(p1 - p0, p2 - p0)
        nn = jnp.linalg.norm(n, axis=-1) + 1e-30
        d_origin = jnp.sum(n * (-p0), -1) / nn
        d_opp = jnp.sum(n * (opp - p0), -1) / nn
        return d_origin * jnp.sign(d_opp) > 1e-7

    inside = (same_side(a, b, c, d) & same_side(a, b, d, c)
              & same_side(a, c, d, b) & same_side(b, c, d, a))
    dists = jnp.stack([d_abc, d_abd, d_acd, d_bcd], -1)
    face_idx = jnp.argmin(dists, -1)
    bary4 = jnp.stack([f_abc, f_abd, f_acd, f_bcd], 1)
    bary4 = jnp.take_along_axis(
        bary4, face_idx[:, None, None].repeat(4, 2), axis=1)[:, 0]
    bary4 = jnp.where(inside[:, None], jnp.full_like(bary4, 0.25), bary4)

    bary = jnp.where((size == 1)[:, None], bary1,
           jnp.where((size == 2)[:, None], bary2,
           jnp.where((size == 3)[:, None], bary3, bary4)))
    v = jnp.einsum("nk,nkd->nd", bary, pts)
    contains = (size == 4) & inside
    return v, bary, contains


def _compact_simplex(pts, pa, pb, bary):
    """Drop simplex slots with ~zero barycentric weight; returns packed
    (pts, pa, pb, size)."""
    keep = bary > 1e-7
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=-1, stable=True)
    g3 = order[:, :, None].repeat(3, 2)
    pts = jnp.take_along_axis(pts, g3, 1)
    pa = jnp.take_along_axis(pa, g3, 1)
    pb = jnp.take_along_axis(pb, g3, 1)
    size = jnp.sum(keep, -1).astype(jnp.int32)
    return pts, pa, pb, jnp.maximum(size, 1)


@dataclasses.dataclass
class GjkResult:
    """≙ the reference's GJK output consumed by contact kernels."""

    distance: jax.Array  # [N] core-shape distance (0 if intersecting cores)
    point_a: jax.Array  # [N,3] closest point on core A (A-frame)
    point_b: jax.Array  # [N,3] closest point on core B (A-frame)
    normal: jax.Array  # [N,3] unit A→B direction (A-frame)
    intersecting: jax.Array  # [N] bool — cores overlap (needs EPA for depth)


def gjk_distance(tag_a, par_a, pose_a: Sim, tag_b, par_b, pose_b: Sim,
                 *, max_iters: int = MAX_ITERS, vertices=None,
                 tri_verts_a=None) -> GjkResult:
    """Batched GJK distance between shape cores, in A's local frame."""
    q_ab = quat.mul(quat.inv(pose_a.rotation), pose_b.rotation)
    r_ab = quat.to_matrix(q_ab)
    t_ab = quat.inv_mul_vec(pose_a.rotation,
                            pose_b.translation - pose_a.translation)
    t_ab = t_ab / pose_a.scale[..., None]
    n = t_ab.shape[0]

    # initial direction: center offset (fallback +x)
    d0 = jnp.where(jnp.linalg.norm(t_ab, axis=-1, keepdims=True) > 1e-9,
                   -t_ab, jnp.zeros_like(t_ab).at[:, 0].set(1.0))
    d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
    s0 = cso_support(tag_a, par_a, tag_b, par_b, r_ab, t_ab, d0,
                     vertices, tri_verts_a)

    pts = jnp.zeros((n, 4, 3), jnp.float32).at[:, 0].set(s0.w)
    pa = jnp.zeros((n, 4, 3), jnp.float32).at[:, 0].set(s0.p_a)
    pb = jnp.zeros((n, 4, 3), jnp.float32).at[:, 0].set(s0.p_b)
    size = jnp.ones((n,), jnp.int32)
    active = jnp.ones((n,), bool)
    inter = jnp.zeros((n,), bool)

    def cond(state):
        i, active, *_ = state
        return (i < max_iters) & jnp.any(active)

    def body(state):
        i, active, inter, pts, pa, pb, size = state
        v, bary, contains = _simplex_closest(pts, size)
        vnorm = jnp.linalg.norm(v, axis=-1)
        hit = contains | (vnorm < EPS)
        inter = inter | (active & hit)
        active = active & ~hit

        pts_c, pa_c, pb_c, size_c = _compact_simplex(pts, pa, pb, bary)
        d = -v / jnp.maximum(vnorm, 1e-30)[:, None]
        s = cso_support(tag_a, par_a, tag_b, par_b, r_ab, t_ab, d,
                        vertices, tri_verts_a)
        # van den Bergen termination: upper−lower distance gap below tol.
        # |v| is the upper bound; −(w·d) the lower bound along d.
        gap = vnorm + jnp.sum(s.w * d, -1)
        done = gap <= 1e-6 * vnorm + 1e-9
        new_active = active & ~done

        ins = jnp.minimum(size_c, 3)
        pts_n = jax.vmap(lambda x, k, val: x.at[k].set(val))(pts_c, ins, s.w)
        pa_n = jax.vmap(lambda x, k, val: x.at[k].set(val))(pa_c, ins, s.p_a)
        pb_n = jax.vmap(lambda x, k, val: x.at[k].set(val))(pb_c, ins, s.p_b)
        size_n = jnp.minimum(size_c + 1, 4)

        sel = new_active
        pts = jnp.where(sel[:, None, None], pts_n, pts)
        pa = jnp.where(sel[:, None, None], pa_n, pa)
        pb = jnp.where(sel[:, None, None], pb_n, pb)
        size = jnp.where(sel, size_n, size)
        active = new_active
        return i + 1, active, inter, pts, pa, pb, size

    _, active, inter, pts, pa, pb, size = jax.lax.while_loop(
        cond, body, (jnp.int32(0), active, inter, pts, pa, pb, size))

    v, bary, contains = _simplex_closest(pts, size)
    inter = inter | contains
    point_a = jnp.einsum("nk,nkd->nd", bary, pa)
    point_b = jnp.einsum("nk,nkd->nd", bary, pb)
    dist = jnp.linalg.norm(v, axis=-1)
    normal = jnp.where((dist > 1e-9)[:, None], -v / jnp.maximum(dist, 1e-30)[:, None],
                       jnp.zeros_like(v).at[:, 1].set(1.0))
    dist = jnp.where(inter, 0.0, dist)
    return GjkResult(dist, point_a, point_b, normal, inter)


def pfm_contact(tag_a, par_a, pose_a: Sim, tag_b, par_b, pose_b: Sim,
                mask=None, *, epa_cap: int = 256, vertices=None,
                tri_verts_a=None, tri_margin: float = 0.0,
                use_epa=True):
    """Single-point contact for support-mapped pairs via GJK + dilation, with
    EPA for core-intersecting pairs (≙ WgContactPfmPfm, contact.rs:161-178).

    Rounded shapes resolve shallow penetration through their dilation radii
    (GJK core distance − radii); pairs whose *cores* intersect are compacted
    into an ``epa_cap``-sized batch and get exact depth/normal from EPA —
    running the expensive polytope expansion only where needed instead of on
    every pair slot.

    Returns (normal_a local-A [N,3], point on A [N,3] local-A, dist [N]).
    """
    from wgmath_tpu.queries.epa import epa2_penetration, epa_penetration

    n = pose_a.translation.shape[0]
    res = gjk_distance(tag_a, par_a, pose_a, tag_b, par_b, pose_b,
                       vertices=vertices, tri_verts_a=tri_verts_a)
    d0 = jnp.zeros_like(res.normal).at[:, 1].set(1.0)
    _, rad_a = support_core(tag_a, par_a, d0, tri_verts=tri_verts_a,
                            tri_margin=tri_margin)
    _, rad_b = support_core(tag_b, par_b, d0)
    dist = res.distance - rad_a - rad_b
    normal = res.normal
    pt_a = res.point_a + normal * rad_a[:, None]

    inter = res.intersecting
    if mask is not None:
        inter = inter & mask
    if use_epa is False:
        # deep-core fallback without EPA (triangle pairs rely on the margin
        # shell): push along the center axis
        t_c = quat.inv_mul_vec(pose_a.rotation,
                               pose_b.translation - pose_a.translation)
        t_n = jnp.linalg.norm(t_c, axis=-1, keepdims=True)
        axis = jnp.where(t_n > 1e-9, t_c / jnp.maximum(t_n, 1e-30),
                         jnp.zeros_like(t_c).at[:, 1].set(1.0))
        normal = jnp.where(inter[:, None], axis, normal)
        return normal, pt_a, dist
    # --- compact intersecting pairs and run EPA -------------------------------
    flags = inter
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    slot = jnp.where(flags & (pos < epa_cap), pos, epa_cap)
    sel = jnp.zeros((epa_cap,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    count = jnp.minimum(jnp.sum(flags.astype(jnp.int32)), epa_cap)
    active = jnp.arange(epa_cap) < count

    q_ab = quat.mul(quat.inv(pose_a.rotation[sel]), pose_b.rotation[sel])
    r_ab = quat.to_matrix(q_ab)
    t_ab = quat.inv_mul_vec(
        pose_a.rotation[sel], pose_b.translation[sel] - pose_a.translation[sel])
    t_ab = t_ab / pose_a.scale[sel][..., None]
    epa_fn = epa2_penetration if use_epa == "2d" else epa_penetration
    e_n, e_depth, e_pa = epa_fn(
        tag_a[sel], par_a[sel], tag_b[sel], par_b[sel], r_ab, t_ab,
        vertices=vertices)

    # scatter EPA results back (core depth + both dilation radii)
    sel_drop = jnp.where(active, sel, n)
    normal = normal.at[sel_drop].set(e_n, mode="drop")
    e_dist = -(e_depth + rad_a[sel] + rad_b[sel])
    dist = dist.at[sel_drop].set(e_dist, mode="drop")
    e_pt = e_pa + e_n * rad_a[sel][:, None]
    pt_a = pt_a.at[sel_drop].set(e_pt, mode="drop")
    return normal, pt_a, dist
