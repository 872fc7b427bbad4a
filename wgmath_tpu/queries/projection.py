"""Point projection onto shapes (≙ wgparry queries/projection.rs:31-57
GpuProjectionResult + per-shape projectLocalPoint / projectLocalPointOnBoundary
in ball.wgsl/cuboid.wgsl/capsule.wgsl/segment.wgsl/triangle.wgsl).

Two flavors per the reference contract:
- ``project_point``: closest point of the *solid* shape (inside → the point
  itself, is_inside=True);
- ``project_point_on_boundary``: closest boundary point even from inside.
All functions are batched, local-space; ``project`` dispatches world-space
points over the tagged union.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import tree_util

from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module
from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.geometry.sim import Sim
from wgmath_tpu.shapes import shape as shp


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class Projection:
    """≙ GpuProjectionResult {point, is_inside}."""

    point: jax.Array
    is_inside: jax.Array

    def tree_flatten(self):
        return (self.point, self.is_inside), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _norm(v):
    return jnp.linalg.norm(v, axis=-1)


def _unit(v, fallback_axis=0):
    n = _norm(v)[..., None]
    fb = jnp.zeros_like(v).at[..., fallback_axis].set(1.0)
    return jnp.where(n > 1e-9, v / jnp.maximum(n, 1e-30), fb)


def project_ball(pt, radius, *, boundary: bool):
    d = _norm(pt)
    inside = d <= radius
    on_sphere = _unit(pt) * radius
    point = on_sphere if boundary else jnp.where(inside[..., None], pt, on_sphere)
    return Projection(point, inside)


def project_cuboid(pt, half_extents, *, boundary: bool):
    clamped = jnp.clip(pt, -half_extents, half_extents)
    inside = jnp.all(jnp.abs(pt) <= half_extents, axis=-1)
    if not boundary:
        return Projection(jnp.where(inside[..., None], pt, clamped), inside)
    # inside → project to nearest face
    gap = half_extents - jnp.abs(pt)
    axis = jnp.argmin(gap, axis=-1)
    sign = jnp.where(jnp.take_along_axis(pt, axis[..., None], -1) >= 0.0, 1.0, -1.0)
    he_ax = jnp.take_along_axis(jnp.broadcast_to(half_extents, pt.shape),
                                axis[..., None], -1)
    face_pt = jnp.put_along_axis(pt, axis[..., None], sign * he_ax, axis=-1,
                                 inplace=False)
    return Projection(jnp.where(inside[..., None], face_pt, clamped), inside)


def project_segment(pt, a, b):
    ab = b - a
    t = jnp.clip(jnp.sum((pt - a) * ab, axis=-1)
                 / jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-30), 0.0, 1.0)
    proj = a + t[..., None] * ab
    return Projection(proj, jnp.zeros(pt.shape[:-1], bool))


def project_capsule(pt, half_height, radius, *, boundary: bool):
    y = jnp.clip(pt[..., 1], -half_height, half_height)
    seg_pt = jnp.zeros_like(pt).at[..., 1].set(y)
    d = pt - seg_pt
    dist = _norm(d)
    inside = dist <= radius
    on_surface = seg_pt + _unit(d) * radius
    point = (on_surface if boundary
             else jnp.where(inside[..., None], pt, on_surface))
    return Projection(point, inside)


def project_triangle(pt, va, vb, vc):
    """Closest point on a 3D triangle (Ericson's region method, branch-free)."""
    ab = vb - va
    ac = vc - va
    ap = pt - va
    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    bp = pt - vb
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)
    cp = pt - vc
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)

    va_r = d3 * d6 - d5 * d4
    vb_r = d5 * d2 - d1 * d6
    vc_r = d1 * d4 - d3 * d2

    # interior barycentric
    denom = jnp.maximum(va_r + vb_r + vc_r, 1e-30)
    v = vb_r / denom
    w = vc_r / denom
    p_face = va + ab * v[..., None] + ac * w[..., None]

    # edge/vertex regions
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    p_ab = va + ab * t_ab[..., None]
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0.0, 1.0)
    p_ac = va + ac * t_ac[..., None]
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30), 0.0, 1.0)
    p_bc = vb + (vc - vb) * t_bc[..., None]

    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (vc_r <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = (vb_r <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (va_r <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    point = p_face
    point = jnp.where(in_edge_bc[..., None], p_bc, point)
    point = jnp.where(in_edge_ac[..., None], p_ac, point)
    point = jnp.where(in_edge_ab[..., None], p_ab, point)
    point = jnp.where(in_vert_c[..., None], vc, point)
    point = jnp.where(in_vert_b[..., None], vb, point)
    point = jnp.where(in_vert_a[..., None], va, point)
    return Projection(point, jnp.zeros(pt.shape[:-1], bool))


def _planar_parts(pt):
    """(planar_dist, unit_dir2d) of pt.xz — shared by cone/cylinder
    (≙ cone.wgsl:41-46 / cylinder.wgsl:38-43)."""
    xz = jnp.stack([pt[..., 0], pt[..., 2]], axis=-1)
    planar = _norm(xz)
    fb = jnp.zeros_like(xz).at[..., 0].set(1.0)
    dir2 = jnp.where(planar[..., None] > 0.0,
                     xz / jnp.maximum(planar[..., None], 1e-30), fb)
    return planar, dir2


def project_cone(pt, half_height, radius, *, boundary: bool):
    """Point projection on a 3D cone, apex +Y (≙ cone.wgsl
    projectLocalPoint:39-82 / projectLocalPointOnBoundary:94-144)."""
    hh = jnp.broadcast_to(half_height, pt.shape[:-1])
    r = jnp.broadcast_to(radius, pt.shape[:-1])
    planar, dir2 = _planar_parts(pt)
    on_basis = jnp.stack([pt[..., 0], -hh, pt[..., 2]], axis=-1)
    basis_cond = (pt[..., 1] < -hh) & (planar <= r)
    circle = jnp.stack([dir2[..., 0] * r, -hh, dir2[..., 1] * r], axis=-1)
    apex = jnp.stack([jnp.zeros_like(hh), hh, jnp.zeros_like(hh)], axis=-1)
    proj_seg = project_segment(pt, apex, circle).point
    seg_dir = circle - apex
    apex_to_base = jnp.stack(
        [jnp.zeros_like(hh), -2.0 * hh, jnp.zeros_like(hh)], axis=-1)
    inside = ((pt[..., 1] >= -hh) & (pt[..., 1] <= hh)
              & (jnp.sum(jnp.cross(seg_dir, pt - apex)
                         * jnp.cross(seg_dir, apex_to_base), axis=-1) >= 0.0))
    is_in = inside & ~basis_cond
    if not boundary:
        point = jnp.where(basis_cond[..., None], on_basis,
                          jnp.where(inside[..., None], pt, proj_seg))
        return Projection(point, is_in)
    d_seg = jnp.sum((proj_seg - pt) ** 2, axis=-1)
    d_basis = jnp.sum((on_basis - pt) ** 2, axis=-1)
    inside_pt = jnp.where((d_seg > d_basis)[..., None], on_basis, proj_seg)
    point = jnp.where(basis_cond[..., None], on_basis,
                      jnp.where(inside[..., None], inside_pt, proj_seg))
    return Projection(point, is_in)


def project_cylinder(pt, half_height, radius, *, boundary: bool):
    """Point projection on a 3D cylinder, axis Y (≙ cylinder.wgsl
    projectLocalPoint:36-73 / projectLocalPointOnBoundary:85-145)."""
    hh = jnp.broadcast_to(half_height, pt.shape[:-1])
    r = jnp.broadcast_to(radius, pt.shape[:-1])
    planar, dir2 = _planar_parts(pt)
    y = pt[..., 1]
    inside = (y >= -hh) & (y <= hh) & (planar <= r)
    in_disk = planar <= r
    cap_y = jnp.where(y > 0.0, hh, -hh)
    on_cap = jnp.stack([pt[..., 0], cap_y, pt[..., 2]], axis=-1)
    on_cap_circle = jnp.stack(
        [dir2[..., 0] * r, cap_y, dir2[..., 1] * r], axis=-1)
    on_side = jnp.stack(
        [dir2[..., 0] * r, jnp.clip(y, -hh, hh), dir2[..., 1] * r], axis=-1)
    # outside: above/below → cap plane (in disk) or cap circle; else side
    out_pt = jnp.where((jnp.abs(y) > hh)[..., None],
                       jnp.where(in_disk[..., None], on_cap, on_cap_circle),
                       on_side)
    if not boundary:
        return Projection(jnp.where(inside[..., None], pt, out_pt), inside)
    # inside → nearest of top / bottom / side
    d_top = hh - y
    d_bottom = y + hh
    d_side = r - planar
    top_pt = jnp.stack([pt[..., 0], hh, pt[..., 2]], axis=-1)
    bottom_pt = jnp.stack([pt[..., 0], -hh, pt[..., 2]], axis=-1)
    side_pt = jnp.stack([dir2[..., 0] * r, y, dir2[..., 1] * r], axis=-1)
    use_top = (d_top < d_bottom) & (d_top < d_side)
    use_bottom = ~use_top & (d_bottom < d_top) & (d_bottom < d_side)
    in_pt = jnp.where(use_top[..., None], top_pt,
                      jnp.where(use_bottom[..., None], bottom_pt, side_pt))
    return Projection(jnp.where(inside[..., None], in_pt, out_pt), inside)


def _project_convex(shapes: shp.ShapeSet, p_loc, mask, *, boundary: bool,
                    epa_cap: int):
    """Closest point on convex polyhedron i (vertex-range shape) from a
    LOCAL point — exceeds the reference surface (shape.wgsl:215-234 falls
    through to ``return pt`` for convex). Rides the tested GJK/EPA pair
    machinery: the point is a zero-radius ball at ``p_loc`` vs the convex
    at identity, so GJK's witness is the surface point when outside and
    EPA supplies the boundary exit when inside."""
    from wgmath_tpu.queries.gjk import pfm_contact

    n = p_loc.shape[0]
    ident_rot = jnp.zeros((n, 4), jnp.float32).at[:, 3].set(1.0)
    ones = jnp.ones((n,), jnp.float32)
    pose_pt = Sim(ident_rot, p_loc, ones)
    pose_cvx = Sim(ident_rot, jnp.zeros_like(p_loc), ones)
    tag_pt = jnp.zeros((n,), jnp.int32)  # BALL, radius 0
    par_pt = jnp.zeros_like(shapes.params)
    normal, _, dist = pfm_contact(
        tag_pt, par_pt, pose_pt, shapes.tag, shapes.params, pose_cvx,
        mask=mask, epa_cap=epa_cap, vertices=shapes.vertices)
    # normal is the A→B push direction at the witness (A = the point):
    # surface point = pt + n·dist both when separated (dist > 0, walk to
    # the hull) and penetrated (dist < 0, walk back out along −n).
    surf = p_loc + normal * dist[..., None]
    inside = dist < 0.0
    point = surf if boundary else jnp.where(inside[..., None], p_loc, surf)
    return Projection(point, inside)


def _project_mesh(shapes: shp.ShapeSet, p_loc, mask, *, k_clusters: int = 4):
    """Closest boundary point on mesh shape i (trimesh: triangles;
    polyline: segments) from a LOCAL point, via the cluster top-k descent
    (queries.mesh_accel ≙ the reference's per-shape BVH, shape.rs:307-480;
    the reference exposes no mesh projection — capability win). Open
    meshes have no interior: ``is_inside`` is always False."""
    from wgmath_tpu.queries.mesh_accel import point_topk_prims, use_clusters

    first_idx = shapes.params[:, 2].astype(jnp.int32)
    num_idx = jnp.where(mask, shapes.params[:, 3], 0.0).astype(jnp.int32)
    prim_k = shapes.indices.shape[1]

    if prim_k == 3:
        def score_fn(pt, va, vb, vc):
            return _norm(project_triangle(pt, va, vb, vc).point - pt)

        def proj_fn(pt, verts):
            return project_triangle(pt, verts[0], verts[1], verts[2]).point
    else:
        def score_fn(pt, va, vb):
            return _norm(project_segment(pt, va, vb).point - pt)

        def proj_fn(pt, verts):
            return project_segment(pt, verts[0], verts[1]).point

    if use_clusters(shapes):
        ids, _ = point_topk_prims(shapes, first_idx, num_idx, p_loc, 1,
                                  score_fn, k_clusters=k_clusters)
        best = ids[:, 0]
    else:  # dense masked argmin over the whole (small) index buffer
        i_total = max(shapes.indices.shape[0], 1)
        cand = jnp.broadcast_to(
            jnp.arange(i_total, dtype=jnp.int32)[None, :],
            (p_loc.shape[0], i_total))
        from wgmath_tpu.queries.mesh_accel import gather_prims
        verts = gather_prims(shapes, cand)
        s = score_fn(p_loc[:, None, :], *verts)
        ok = (cand >= first_idx[:, None]) & (cand < (first_idx + num_idx)[:, None])
        s = jnp.where(ok, s, jnp.inf)
        best = jnp.argmin(s, axis=-1).astype(jnp.int32)

    idx = jnp.clip(best, 0, max(shapes.indices.shape[0] - 1, 0))
    tri = shapes.indices[idx]
    verts = tuple(shapes.vertices[tri[..., i]] for i in range(prim_k))
    point = proj_fn(p_loc, verts)
    return Projection(point, jnp.zeros(p_loc.shape[:-1], bool))


def project(shapes: shp.ShapeSet, poses: Sim, points: jax.Array,
            *, boundary: bool = False, epa_cap: int = 256) -> Projection:
    """World-space projection of point i onto collider i (masked dispatch,
    ≙ shape.wgsl projectPoint:240-261 / projectPointOnBoundary:285-310;
    the convex/mesh branches exceed the reference, whose dispatch silently
    returns the input point for those tags).

    Dispatch is statically gated on ``shapes.kinds``: absent shape types
    cost nothing, and an unhandled tag raises at TRACE time instead of
    silently returning the input point."""
    p_loc = sim_ops.inv_mul_pt(poses, points)
    par = shapes.params
    tag = shapes.tag
    dim = points.shape[-1]
    kinds = shapes.kinds

    handled = {shp.BALL, shp.CUBOID, shp.CAPSULE, shp.SEGMENT, shp.TRIANGLE,
               shp.CONVEX, shp.TRIMESH, shp.POLYLINE}
    if dim == 3:
        handled |= {shp.CONE, shp.CYLINDER}
    unhandled = set(kinds) - handled
    if unhandled:
        raise ValueError(
            f"project(): no projection kernel for shape tags {unhandled} "
            f"in {dim}D (scene kinds: {sorted(kinds)})")

    res_pt = p_loc
    res_in = jnp.zeros(points.shape[:-1], bool)

    def put(cond, proj):
        nonlocal res_pt, res_in
        res_pt = jnp.where(cond[..., None], proj.point, res_pt)
        res_in = jnp.where(cond, proj.is_inside, res_in)

    if shp.BALL in kinds:
        put(tag == shp.BALL, project_ball(p_loc, par[:, 0],
                                          boundary=boundary))
    if shp.CUBOID in kinds:
        put(tag == shp.CUBOID, project_cuboid(p_loc, par[:, :dim],
                                              boundary=boundary))
    if shp.CAPSULE in kinds and dim == 3:
        put(tag == shp.CAPSULE, project_capsule(p_loc, par[:, 0], par[:, 1],
                                                boundary=boundary))
    if shp.CAPSULE in kinds and dim == 2:
        # 2D capsule: segment along local Y + radius
        hh = par[:, 0]
        a = jnp.stack([jnp.zeros_like(hh), -hh], axis=-1)
        b = jnp.stack([jnp.zeros_like(hh), hh], axis=-1)
        seg = project_segment(p_loc, a, b).point
        d = p_loc - seg
        dist = _norm(d)
        inside = dist <= par[:, 1]
        on_surface = seg + _unit(d) * par[:, 1][..., None]
        pt2 = (on_surface if boundary
               else jnp.where(inside[..., None], p_loc, on_surface))
        put(tag == shp.CAPSULE, Projection(pt2, inside))
    if shp.CONE in kinds and dim == 3:
        put(tag == shp.CONE, project_cone(p_loc, par[:, 0], par[:, 1],
                                          boundary=boundary))
    if shp.CYLINDER in kinds and dim == 3:
        put(tag == shp.CYLINDER, project_cylinder(p_loc, par[:, 0],
                                                  par[:, 1],
                                                  boundary=boundary))
    if shp.SEGMENT in kinds:
        put(tag == shp.SEGMENT,
            project_segment(p_loc, par[:, :dim], par[:, dim:2 * dim]))
    if shp.TRIANGLE in kinds and dim == 3:
        first = par[:, 0].astype(jnp.int32)
        vmax = max(shapes.vertices.shape[0] - 1, 0)
        va = shapes.vertices[jnp.clip(first, 0, vmax)]
        vb = shapes.vertices[jnp.clip(first + 1, 0, vmax)]
        vc = shapes.vertices[jnp.clip(first + 2, 0, vmax)]
        put(tag == shp.TRIANGLE, project_triangle(p_loc, va, vb, vc))
    if shp.CONVEX in kinds and dim == 3:
        put(tag == shp.CONVEX,
            _project_convex(shapes, p_loc, tag == shp.CONVEX,
                            boundary=boundary, epa_cap=epa_cap))
    mesh_tags = kinds & {shp.TRIMESH, shp.POLYLINE}
    if mesh_tags:
        is_mesh = (tag == shp.TRIMESH) | (tag == shp.POLYLINE)
        put(is_mesh, _project_mesh(shapes, p_loc, is_mesh))

    return Projection(sim_ops.mul_pt(poses, res_pt), res_in)


register_module(
    KernelModule(
        "queries.projection",
        deps=("geometry.sim",),
        provides={
            "project_ball": project_ball,
            "project_cuboid": project_cuboid,
            "project_segment": project_segment,
            "project_capsule": project_capsule,
            "project_triangle": project_triangle,
            "project_cone": project_cone,
            "project_cylinder": project_cylinder,
            "project": project,
        },
        entries={
            "project_balls": EntryPoint(
                fn=lambda p: project_ball(p, jnp.float32(1.0), boundary=False),
                example_args=lambda: (jnp.ones((512, 3), jnp.float32),),
            )
        },
        doc="Point projection queries (≙ wgparry queries/projection).",
    )
)
