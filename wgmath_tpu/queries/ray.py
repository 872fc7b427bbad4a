"""Ray casting against shapes (≙ wgparry queries/ray.rs:4-13 + per-shape
ray casts in ball.wgsl/cuboid.wgsl/capsule.wgsl/cylinder.wgsl/cone.wgsl/
triangle.wgsl).

All casts are batched and branch-free; a miss is ``t = +inf``. ``max_toi``
clamps hits like the reference. Shapes are evaluated in local space — callers
transform rays by the inverse pose (``cast`` handles that) — and the
tagged-union dispatch is masked evaluation of every cheap analytic formula
(the narrow set a VPU evaluates faster than it would mispredict).
100k-ray batches are benchmark config #4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module
from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.geometry.sim import Sim
from wgmath_tpu.shapes import shape as shp

INF = jnp.float32(jnp.inf)


def _safe_div(a, b):
    return a / jnp.where(jnp.abs(b) < 1e-30, jnp.where(b < 0, -1e-30, 1e-30), b)


def ray_ball(origin, direction, radius):
    """Quadratic |o + t·d|² = r²; returns smallest t ≥ 0 (inf on miss).
    Origins inside the ball hit at t = 0 (matching parry's solid cast)."""
    a = jnp.sum(direction * direction, axis=-1)
    b = jnp.sum(origin * direction, axis=-1)
    c = jnp.sum(origin * origin, axis=-1) - radius * radius
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = _safe_div(-b - sq, a)
    inside = c <= 0.0
    t = jnp.where(inside, 0.0, t0)
    hit = (disc >= 0.0) & (t >= 0.0)
    return jnp.where(hit, t, INF)


def ray_cuboid(origin, direction, half_extents):
    """Slab test; solid (inside → t=0)."""
    inv_d = _safe_div(jnp.ones_like(direction), direction)
    t1 = (-half_extents - origin) * inv_d
    t2 = (half_extents - origin) * inv_d
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    t = jnp.where(tmin < 0.0, 0.0, tmin)
    return jnp.where(hit, t, INF)


def ray_capsule(origin, direction, half_height, radius):
    """Capsule = segment {y ∈ [−h, h]} ⊕ ball(r): min of the lateral
    cylinder hit (clamped to the segment span) and both cap-sphere hits."""
    o_xz = origin.at[..., 1].set(0.0)
    d_xz = direction.at[..., 1].set(0.0)
    a = jnp.sum(d_xz * d_xz, axis=-1)
    b = jnp.sum(o_xz * d_xz, axis=-1)
    c = jnp.sum(o_xz * o_xz, axis=-1) - radius * radius
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_cyl = _safe_div(-b - sq, a)
    y_hit = origin[..., 1] + t_cyl * direction[..., 1]
    cyl_ok = (disc >= 0.0) & (t_cyl >= 0.0) & (jnp.abs(y_hit) <= half_height) & (a > 1e-30)
    t_cyl = jnp.where(cyl_ok, t_cyl, INF)

    up = jnp.zeros_like(origin).at[..., 1].set(half_height)
    t_top = ray_ball(origin - up, direction, radius)
    t_bot = ray_ball(origin + up, direction, radius)
    # inside the lateral part → 0
    inside = (c <= 0.0) & (jnp.abs(origin[..., 1]) <= half_height)
    t = jnp.minimum(jnp.minimum(t_cyl, t_top), t_bot)
    return jnp.where(inside, 0.0, t)


def ray_cylinder(origin, direction, half_height, radius):
    """Finite cylinder (flat caps), solid."""
    o_xz = origin.at[..., 1].set(0.0)
    d_xz = direction.at[..., 1].set(0.0)
    a = jnp.sum(d_xz * d_xz, axis=-1)
    b = jnp.sum(o_xz * d_xz, axis=-1)
    c = jnp.sum(o_xz * o_xz, axis=-1) - radius * radius
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_side = _safe_div(-b - sq, a)
    y_side = origin[..., 1] + t_side * direction[..., 1]
    side_ok = (disc >= 0.0) & (t_side >= 0.0) & (jnp.abs(y_side) <= half_height) & (a > 1e-30)
    t_side = jnp.where(side_ok, t_side, INF)

    def cap(sign):
        t = _safe_div(sign * half_height - origin[..., 1], direction[..., 1])
        p = origin + t[..., None] * direction
        r2 = p[..., 0] ** 2 + p[..., 2] ** 2
        ok = (t >= 0.0) & (r2 <= radius * radius) & (jnp.abs(direction[..., 1]) > 1e-30)
        return jnp.where(ok, t, INF)

    inside = (c <= 0.0) & (jnp.abs(origin[..., 1]) <= half_height)
    t = jnp.minimum(t_side, jnp.minimum(cap(1.0), cap(-1.0)))
    return jnp.where(inside, 0.0, t)


def ray_cone(origin, direction, half_height, radius):
    """Finite cone, apex at +h, base disk at −h, solid."""
    # cone surface: radius grows linearly from apex: r(y) = (h - y)/(2h) * 2r...
    # parameterize: at y = -h radius = r, at y = +h radius = 0:
    # s(y) = r * (h - y) / (2h); surface: x² + z² = s(y)²
    k = radius / (2.0 * half_height)
    oy = half_height - origin[..., 1]  # distance below apex
    dy = -direction[..., 1]
    a = (direction[..., 0] ** 2 + direction[..., 2] ** 2 - k * k * dy * dy)
    b = (origin[..., 0] * direction[..., 0] + origin[..., 2] * direction[..., 2]
         - k * k * oy * dy)
    c = origin[..., 0] ** 2 + origin[..., 2] ** 2 - k * k * oy * oy
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = _safe_div(-b - sq, a)
    t1 = _safe_div(-b + sq, a)

    def side_ok(t):
        y = origin[..., 1] + t * direction[..., 1]
        return (disc >= 0.0) & (t >= 0.0) & (y >= -half_height) & (y <= half_height)

    t_side = jnp.where(side_ok(t0), t0, jnp.where(side_ok(t1), t1, INF))

    t_base = _safe_div(-half_height - origin[..., 1], direction[..., 1])
    p = origin + t_base[..., None] * direction
    base_ok = ((t_base >= 0.0) & (p[..., 0] ** 2 + p[..., 2] ** 2 <= radius * radius)
               & (jnp.abs(direction[..., 1]) > 1e-30))
    t_base = jnp.where(base_ok, t_base, INF)

    inside = (c <= 0.0) & (origin[..., 1] >= -half_height) & (origin[..., 1] <= half_height)
    t = jnp.minimum(t_side, t_base)
    return jnp.where(inside, 0.0, t)


def ray_triangle(origin, direction, va, vb, vc):
    """Möller–Trumbore, two-sided; returns t (inf on miss)."""
    e1 = vb - va
    e2 = vc - va
    h = jnp.cross(direction, e2)
    det = jnp.sum(e1 * h, axis=-1)
    inv_det = _safe_div(jnp.ones_like(det), det)
    s = origin - va
    u = jnp.sum(s * h, axis=-1) * inv_det
    q = jnp.cross(s, e1)
    v = jnp.sum(direction * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    eps = 1e-7
    hit = (jnp.abs(det) > 1e-12) & (u >= -eps) & (v >= -eps) & (u + v <= 1 + eps) & (t >= 0.0)
    return jnp.where(hit, t, INF)


def ray_segment_2d(origin, direction, va, vb):
    """2D ray vs segment: solve o + t·d = a + u·(b−a); t ≥ 0, u ∈ [0, 1].
    Collinear overlaps count as misses (same degenerate-denominator guard
    the reference's 2x2 solves use)."""
    ab = vb - va
    ao = va - origin

    def cross2(p, q):
        return p[..., 0] * q[..., 1] - p[..., 1] * q[..., 0]

    denom = cross2(direction, ab)
    inv = _safe_div(jnp.ones_like(denom), denom)
    t = cross2(ao, ab) * inv
    u = cross2(ao, direction) * inv
    hit = (jnp.abs(denom) > 1e-12) & (t >= 0.0) & (u >= 0.0) & (u <= 1.0)
    return jnp.where(hit, t, INF)


def _ray_mesh_clustered(origin, direction, shapes: shp.ShapeSet,
                        first_idx, num_idx, prim_fn, k_clusters: int = 4):
    """Exact nearest hit via the two-level cluster grid (queries.mesh_accel;
    ≙ the reference's per-thread BVH ray descent, but as batched rounds of
    "expand the K nearest-entry clusters" instead of a divergent stack walk).

    Each round tests the K remaining clusters with the smallest slab-entry t
    per ray and retires them; a ray is settled once every remaining cluster's
    entry exceeds its best hit (a hit inside a cluster can't precede the
    cluster's entry), so the loop is exact and runs ~1-2 rounds on coherent
    rays. Memory is O(rays × clusters) for the entry table — chunk the ray
    batch at the call site for very large casts."""
    from wgmath_tpu.queries.mesh_accel import (MESH_LEAF, cluster_range,
                                               gather_prims)

    cmin, cmax = shapes.cluster_min, shapes.cluster_max
    n_rays = origin.shape[0]
    fc, nc = cluster_range(first_idx, num_idx)
    cid = jnp.arange(cmin.shape[0], dtype=jnp.int32)
    in_range = ((cid[None, :] >= fc[:, None])
                & (cid[None, :] < (fc + nc)[:, None]))
    inv_d = _safe_div(jnp.ones_like(direction), direction)
    t1 = (cmin[None] - origin[:, None, :]) * inv_d[:, None, :]
    t2 = (cmax[None] - origin[:, None, :]) * inv_d[:, None, :]
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & in_range
    entry = jnp.where(hit, jnp.maximum(tmin, 0.0), INF)  # [P, C]

    lane = jnp.arange(MESH_LEAF, dtype=jnp.int32)
    rows = jnp.arange(n_rays)[:, None]
    last = (first_idx + num_idx)[:, None]

    def cond(carry):
        t_best, entry_rem = carry
        return jnp.any(jnp.min(entry_rem, axis=-1) < t_best)

    def body(carry):
        t_best, entry_rem = carry
        neg, best = jax.lax.top_k(-entry_rem, k_clusters)
        cand = (best[:, :, None] * MESH_LEAF + lane[None, None, :]).reshape(
            n_rays, k_clusters * MESH_LEAF)
        verts = gather_prims(shapes, cand)
        t = prim_fn(origin[:, None, :], direction[:, None, :], *verts)
        ok = ((cand >= first_idx[:, None]) & (cand < last)
              & jnp.repeat(jnp.isfinite(-neg), MESH_LEAF, axis=1))
        t = jnp.where(ok, t, INF)
        t_best = jnp.minimum(t_best, jnp.min(t, axis=-1))
        entry_rem = entry_rem.at[rows, best].set(INF)
        return t_best, entry_rem

    t_best, _ = jax.lax.while_loop(
        cond, body, (jnp.full((n_rays,), INF), entry))
    return t_best


def ray_trimesh(origin, direction, shapes: shp.ShapeSet, first_idx, num_idx):
    """Min-t over a mesh's triangle range. Small meshes: dense [rays × T]
    sweep (cheapest below ~2k triangles). Large meshes: exact cluster
    expansion (``_ray_mesh_clustered`` ≙ the reference's BVH ray traversal,
    polyline.wgsl:58 / narrow_phase.wgsl descent)."""
    from wgmath_tpu.queries.mesh_accel import use_clusters

    tris = shapes.indices
    t_max = max(tris.shape[0], 1)
    if tris.shape[0] == 0:
        return jnp.full(origin.shape[:-1], INF)
    if use_clusters(shapes):
        return _ray_mesh_clustered(origin, direction, shapes,
                                   first_idx, num_idx, ray_triangle)
    va = shapes.vertices[tris[:, 0]]
    vb = shapes.vertices[tris[:, 1]]
    vc = shapes.vertices[tris[:, 2]]
    t = ray_triangle(origin[:, None, :], direction[:, None, :],
                     va[None], vb[None], vc[None])  # [N, T]
    tri_ids = jnp.arange(t_max, dtype=jnp.int32)
    in_range = ((tri_ids[None, :] >= first_idx[:, None])
                & (tri_ids[None, :] < (first_idx + num_idx)[:, None]))
    t = jnp.where(in_range, t, INF)
    return jnp.min(t, axis=-1)


def ray_polyline(origin, direction, shapes: shp.ShapeSet, first_idx, num_idx):
    """Min-t over a 2D polyline's segment range (dense below the cluster
    threshold, cluster-expanded above — same scheme as ``ray_trimesh``)."""
    from wgmath_tpu.queries.mesh_accel import use_clusters

    segs = shapes.indices
    s_max = max(segs.shape[0], 1)
    if segs.shape[0] == 0:
        return jnp.full(origin.shape[:-1], INF)
    if use_clusters(shapes):
        return _ray_mesh_clustered(origin, direction, shapes,
                                   first_idx, num_idx, ray_segment_2d)
    va = shapes.vertices[segs[:, 0]]
    vb = shapes.vertices[segs[:, 1]]
    t = ray_segment_2d(origin[:, None, :], direction[:, None, :],
                       va[None], vb[None])  # [N, S]
    seg_ids = jnp.arange(s_max, dtype=jnp.int32)
    in_range = ((seg_ids[None, :] >= first_idx[:, None])
                & (seg_ids[None, :] < (first_idx + num_idx)[:, None]))
    t = jnp.where(in_range, t, INF)
    return jnp.min(t, axis=-1)


def cast(shapes: shp.ShapeSet, poses: Sim, origins: jax.Array,
         dirs: jax.Array, max_toi: float = jnp.inf) -> jax.Array:
    """Batched world-space ray vs shape i: ray i against collider i.

    ≙ WgRay + per-shape dynamic dispatch (shape.wgsl ray switch). Transforms
    each ray into local space, evaluates all analytic casts masked by tag.
    """
    o_loc = sim_ops.inv_mul_pt(poses, origins)
    d_loc = sim_ops.inv_mul_unit_vec(poses, dirs)  # unit dirs; scale via t
    p = shapes.params
    tag = shapes.tag
    t = jnp.full(origins.shape[:-1], INF)
    t = jnp.where(tag == shp.BALL, ray_ball(o_loc, d_loc, p[:, 0]), t)
    dim = origins.shape[-1]
    t = jnp.where(tag == shp.CUBOID, ray_cuboid(o_loc, d_loc, p[:, :dim]), t)
    if dim == 2 and shp.POLYLINE in shapes.kinds:
        t_poly = ray_polyline(o_loc, d_loc, shapes,
                              p[:, 2].astype(jnp.int32),
                              p[:, 3].astype(jnp.int32))
        t = jnp.where(tag == shp.POLYLINE, t_poly, t)
    if dim == 3:
        t = jnp.where(tag == shp.CAPSULE,
                      ray_capsule(o_loc, d_loc, p[:, 0], p[:, 1]), t)
        t = jnp.where(tag == shp.CYLINDER,
                      ray_cylinder(o_loc, d_loc, p[:, 0], p[:, 1]), t)
        t = jnp.where(tag == shp.CONE,
                      ray_cone(o_loc, d_loc, p[:, 0], p[:, 1]), t)
        mesh_like = shapes.kinds & {shp.TRIMESH, shp.CONVEX}
        if mesh_like:
            # CONVEX rays reuse the triangle scan over the hull faces the
            # constructor stores (shapes/mesh.py convex_polyhedron) — the
            # reference's convex shapes are support-mapped only, so this
            # exceeds its ray surface
            is_mesh = (tag == shp.TRIMESH) | (tag == shp.CONVEX)
            t_mesh = ray_trimesh(o_loc, d_loc, shapes,
                                 p[:, 2].astype(jnp.int32),
                                 jnp.where(is_mesh, p[:, 3],
                                           0.0).astype(jnp.int32))
            t = jnp.where(is_mesh, t_mesh, t)
    # local t is world t because inv_mul_unit_vec preserves direction scale
    # only up to 1/pose.scale; rescale:
    t = t * poses.scale
    return jnp.where(t <= max_toi, t, INF)


register_module(
    KernelModule(
        "queries.ray",
        deps=("geometry.sim",),
        provides={
            "ray_ball": ray_ball,
            "ray_cuboid": ray_cuboid,
            "ray_capsule": ray_capsule,
            "ray_cylinder": ray_cylinder,
            "ray_cone": ray_cone,
            "ray_triangle": ray_triangle,
            "ray_cast": cast,
            "ray_trimesh": ray_trimesh,
            "ray_polyline": ray_polyline,
            "ray_segment_2d": ray_segment_2d,
        },
        entries={
            "cast_balls": EntryPoint(
                fn=lambda o, d: ray_ball(o, d, jnp.float32(1.0)),
                example_args=lambda: (jnp.ones((1024, 3), jnp.float32) * 3,
                                      -jnp.ones((1024, 3), jnp.float32)),
            )
        },
        doc="Batched ray casts (≙ wgparry queries/ray + per-shape WGSL casts).",
    )
)
