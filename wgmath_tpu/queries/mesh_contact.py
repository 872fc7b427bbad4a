"""Mesh narrow phase: convex-vs-trimesh contact manifolds
(≙ wgparry narrow_phase.wgsl trimesh_convex:173 + polyline_convex — the
per-thread BVH traversal emitting per-triangle contacts via atomicAdd).

TPU-native design: mesh pairs are compacted to a fixed batch, then every
triangle of the paired mesh is evaluated densely [pairs × T] on the VPU and
the K deepest triangles emit single-point manifolds — append-free, bounded,
and faster than divergent traversal for the moderate meshes the demos use
(a device LBVH over triangles, broad_phase.lbvh, is the escape hatch for
huge meshes).

Round-1 coverage: ball-vs-mesh (the reference's trimesh demo pairing);
support-mapped convexes vs mesh follow via triangle supports.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wgmath_tpu.broad_phase.brute_force import PairList
from wgmath_tpu.dynamics.constraint import Contacts, max_points
from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.geometry.sim import Sim
from wgmath_tpu.queries.projection import project_triangle
from wgmath_tpu.shapes import shape as shp


def _take_sim(poses: Sim, idx):
    return Sim(poses.rotation[idx], poses.translation[idx], poses.scale[idx])


def mesh_ball_contacts(poses: Sim, shapes: shp.ShapeSet, pairs: PairList,
                       prediction: float, *, pair_cap: int = 512,
                       k_best: int = 4) -> Contacts:
    """Contacts for (mesh, ball) pairs, K deepest triangles per pair.

    Returns a ``Contacts`` buffer of capacity ``pair_cap * k_best`` with the
    *ball* as body A (single-point manifolds on the ball's surface).
    """
    dim = poses.translation.shape[-1]
    p_max = max_points(dim)
    tag_a = shapes.tag[pairs.body_a]
    tag_b = shapes.tag[pairs.body_b]
    is_mesh_a = (tag_a == shp.TRIMESH) & (tag_b == shp.BALL)
    is_mesh_b = (tag_b == shp.TRIMESH) & (tag_a == shp.BALL)
    flags = (is_mesh_a | is_mesh_b) & pairs.valid

    n_pairs = pairs.capacity
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    slot = jnp.where(flags & (pos < pair_cap), pos, pair_cap)
    sel = jnp.zeros((pair_cap,), jnp.int32).at[slot].set(
        jnp.arange(n_pairs, dtype=jnp.int32), mode="drop")
    count = jnp.minimum(jnp.sum(flags.astype(jnp.int32)), pair_cap)
    active = jnp.arange(pair_cap) < count

    pa = pairs.body_a[sel]
    pb = pairs.body_b[sel]
    mesh_is_a = (shapes.tag[pa] == shp.TRIMESH)
    mesh_body = jnp.where(mesh_is_a, pa, pb)
    ball_body = jnp.where(mesh_is_a, pb, pa)
    mesh_pose = _take_sim(poses, mesh_body)
    ball_pose = _take_sim(poses, ball_body)
    radius = shapes.params[ball_body, 0] * ball_pose.scale
    first_idx = shapes.params[mesh_body, 2].astype(jnp.int32)
    num_idx = shapes.params[mesh_body, 3].astype(jnp.int32)

    # ball center in mesh local space
    c_local = sim_ops.inv_mul_pt(mesh_pose, ball_pose.translation)

    t_max = max(shapes.indices.shape[0], 1)
    tri_idx = jnp.arange(t_max, dtype=jnp.int32)
    in_range = ((tri_idx[None, :] >= first_idx[:, None])
                & (tri_idx[None, :] < (first_idx + num_idx)[:, None]))
    tris = shapes.indices  # [T, 3]
    va = shapes.vertices[tris[:, 0]]
    vb = shapes.vertices[tris[:, 1]]
    vc = shapes.vertices[tris[:, 2]]

    # dense projection: center vs every triangle [pair_cap, T]
    proj = project_triangle(c_local[:, None, :], va[None], vb[None], vc[None])
    delta = c_local[:, None, :] - proj.point
    d_center = jnp.linalg.norm(delta, axis=-1)
    d_surface = d_center - radius[:, None]
    score = jnp.where(in_range & active[:, None], d_surface, 1e9)

    neg_d, best = jax.lax.top_k(-score, k_best)  # K smallest distances
    best_d = -neg_d  # [pair_cap, K]
    hit = best_d < prediction

    # contact data per (pair, k): point on ball surface, normal ball→mesh…
    bidx = best  # [pair_cap, K] triangle ids
    bpt = jnp.take_along_axis(proj.point, bidx[..., None].repeat(dim, -1), 1)
    n_mesh_local = c_local[:, None, :] - bpt
    nn = jnp.linalg.norm(n_mesh_local, axis=-1, keepdims=True)
    n_mesh_local = jnp.where(nn > 1e-9, n_mesh_local / jnp.maximum(nn, 1e-30),
                             jnp.zeros_like(n_mesh_local).at[..., 1].set(1.0))
    # world normal pointing mesh→ball; contact convention: A = ball, B = mesh
    n_world = sim_ops.mul_unit_vec(
        Sim(mesh_pose.rotation[:, None], mesh_pose.translation[:, None],
            mesh_pose.scale[:, None]), n_mesh_local)
    n_ab = -n_world  # ball→mesh
    ball_pose_b = Sim(ball_pose.rotation[:, None],
                      ball_pose.translation[:, None], ball_pose.scale[:, None])
    n_a_local = sim_ops.inv_mul_unit_vec(ball_pose_b, n_ab)
    pt_world = ball_pose.translation[:, None, :] + n_ab * radius[:, None, None]
    pt_a_local = sim_ops.inv_mul_pt(ball_pose_b, pt_world)

    cap = pair_cap * k_best
    valid = (hit & active[:, None]).reshape(cap)
    body_a = jnp.broadcast_to(ball_body[:, None], (pair_cap, k_best)).reshape(cap)
    body_b = jnp.broadcast_to(mesh_body[:, None], (pair_cap, k_best)).reshape(cap)
    normal_a = n_a_local.reshape(cap, dim)
    points = jnp.zeros((cap, p_max, dim), jnp.float32).at[:, 0].set(
        pt_a_local.reshape(cap, dim))
    dists = jnp.full((cap, p_max), 1e9, jnp.float32).at[:, 0].set(
        best_d.reshape(cap))
    num_points = jnp.where(valid, 1, 0).astype(jnp.int32)
    return Contacts(body_a, body_b, normal_a, points, dists, num_points, valid)


def concat_contacts(a: Contacts, b: Contacts) -> Contacts:
    return Contacts(
        jnp.concatenate([a.body_a, b.body_a]),
        jnp.concatenate([a.body_b, b.body_b]),
        jnp.concatenate([a.normal_a, b.normal_a]),
        jnp.concatenate([a.points_a, b.points_a]),
        jnp.concatenate([a.dist, b.dist]),
        jnp.concatenate([a.num_points, b.num_points]),
        jnp.concatenate([a.valid, b.valid]),
    )


def mesh_convex_contacts(poses: Sim, shapes: shp.ShapeSet, pairs: PairList,
                         prediction: float, *, pair_cap: int = 256,
                         k_best: int = 4,
                         tri_margin: float = 0.02) -> Contacts:
    """Contacts for (mesh, support-mapped convex) pairs via per-triangle GJK
    (≙ trimesh_convex: per-triangle contact emission). Candidate triangles
    are the K nearest by centroid; each runs triangle-vs-convex GJK with the
    triangle dilated by ``tri_margin`` (the standard collision-margin trick —
    penetration beyond the margin falls back to a center-axis push).

    The convex body is body A in the emitted manifolds.
    """
    from wgmath_tpu.queries.gjk import pfm_contact

    dim = poses.translation.shape[-1]
    p_max = max_points(dim)
    tag_a = shapes.tag[pairs.body_a]
    tag_b = shapes.tag[pairs.body_b]

    def is_cvx(t):
        return ((t == shp.CUBOID) | (t == shp.CAPSULE) | (t == shp.CONE)
                | (t == shp.CYLINDER) | (t == shp.CONVEX))

    m_a = (tag_a == shp.TRIMESH) & is_cvx(tag_b)
    m_b = (tag_b == shp.TRIMESH) & is_cvx(tag_a)
    flags = (m_a | m_b) & pairs.valid

    n_pairs = pairs.capacity
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    slot = jnp.where(flags & (pos < pair_cap), pos, pair_cap)
    sel = jnp.zeros((pair_cap,), jnp.int32).at[slot].set(
        jnp.arange(n_pairs, dtype=jnp.int32), mode="drop")
    count = jnp.minimum(jnp.sum(flags.astype(jnp.int32)), pair_cap)
    active = jnp.arange(pair_cap) < count

    pa = pairs.body_a[sel]
    pb = pairs.body_b[sel]
    mesh_is_a = shapes.tag[pa] == shp.TRIMESH
    mesh_body = jnp.where(mesh_is_a, pa, pb)
    cvx_body = jnp.where(mesh_is_a, pb, pa)
    mesh_pose = _take_sim(poses, mesh_body)
    cvx_pose = _take_sim(poses, cvx_body)
    first_idx = shapes.params[mesh_body, 2].astype(jnp.int32)
    num_idx = shapes.params[mesh_body, 3].astype(jnp.int32)

    # candidate triangles: K nearest centroids to the convex center (in mesh
    # local space)
    c_local = sim_ops.inv_mul_pt(mesh_pose, cvx_pose.translation)
    tris = shapes.indices
    t_max = max(tris.shape[0], 1)
    centroids = (shapes.vertices[tris[:, 0]] + shapes.vertices[tris[:, 1]]
                 + shapes.vertices[tris[:, 2]]) / 3.0
    tri_idx = jnp.arange(t_max, dtype=jnp.int32)
    in_range = ((tri_idx[None, :] >= first_idx[:, None])
                & (tri_idx[None, :] < (first_idx + num_idx)[:, None]))
    d2 = jnp.sum((c_local[:, None, :] - centroids[None]) ** 2, axis=-1)
    d2 = jnp.where(in_range & active[:, None], d2, 1e18)
    neg, best = jax.lax.top_k(-d2, k_best)  # K nearest
    cand_ok = (-neg) < 1e17

    # flatten (pair, k) pseudo-pairs: A = triangle (mesh frame), B = convex
    mk = pair_cap * k_best
    bidx = best.reshape(mk)
    tri_v = shapes.vertices[tris[bidx]]  # [MK, 3, dim]
    rep = lambda x: jnp.repeat(x, k_best, axis=0)
    pose_tri = Sim(rep(mesh_pose.rotation), rep(mesh_pose.translation),
                   rep(mesh_pose.scale))
    pose_cvx = Sim(rep(cvx_pose.rotation), rep(cvx_pose.translation),
                   rep(cvx_pose.scale))
    tag_tri = jnp.full((mk,), shp.TRIANGLE, jnp.int32)
    tag_cvx = shapes.tag[rep(cvx_body)]
    par_cvx = shapes.params[rep(cvx_body)]
    par_tri = jnp.zeros((mk, shp.NUM_PARAMS), jnp.float32)
    act_mk = (active[:, None] & cand_ok).reshape(mk)

    n_tri, pt_tri, dist = pfm_contact(
        tag_tri, par_tri, pose_tri, tag_cvx, par_cvx, pose_cvx,
        mask=act_mk, vertices=shapes.vertices, tri_verts_a=tri_v,
        tri_margin=tri_margin, use_epa=False)
    # dist is relative to the dilated surface: the solver rests bodies a
    # margin above the true triangles, keeping cores from ever intersecting

    # contacts with the CONVEX as body A: flip the normal/point side
    # normal A→B where A=convex: = -(triangle normal in mesh frame → world →
    # convex frame)
    n_world = sim_ops.mul_unit_vec(pose_tri, n_tri)
    n_a = sim_ops.inv_mul_unit_vec(pose_cvx, -n_world)
    # point on the convex's surface ≈ triangle point + normal·dist (shifted
    # onto A's surface, matching the builder's midpoint convention)
    pt_world = sim_ops.mul_pt(pose_tri, pt_tri)
    pt_a_world = pt_world + n_world * dist[:, None]
    pt_a = sim_ops.inv_mul_pt(pose_cvx, pt_a_world)

    valid = act_mk & (dist < prediction + tri_margin * 0.5)
    body_a = rep(cvx_body)
    body_b = rep(mesh_body)
    points = jnp.zeros((mk, p_max, dim), jnp.float32).at[:, 0].set(pt_a)
    dists = jnp.full((mk, p_max), 1e9, jnp.float32).at[:, 0].set(dist)
    num_points = jnp.where(valid, 1, 0).astype(jnp.int32)
    return Contacts(body_a, body_b, n_a, points, dists, num_points, valid)


def polyline_ball_contacts(poses: Sim, shapes: shp.ShapeSet, pairs: PairList,
                           prediction: float, *, pair_cap: int = 256,
                           k_best: int = 2) -> Contacts:
    """2D contacts for (polyline, ball) pairs: K nearest segments per pair
    (≙ narrow_phase.wgsl polyline_convex). Ball is body A."""
    from wgmath_tpu.queries.projection import project_segment

    dim = poses.translation.shape[-1]
    p_max = max_points(dim)
    tag_a = shapes.tag[pairs.body_a]
    tag_b = shapes.tag[pairs.body_b]
    m_a = (tag_a == shp.POLYLINE) & (tag_b == shp.BALL)
    m_b = (tag_b == shp.POLYLINE) & (tag_a == shp.BALL)
    flags = (m_a | m_b) & pairs.valid

    n_pairs = pairs.capacity
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    slot = jnp.where(flags & (pos < pair_cap), pos, pair_cap)
    sel = jnp.zeros((pair_cap,), jnp.int32).at[slot].set(
        jnp.arange(n_pairs, dtype=jnp.int32), mode="drop")
    count = jnp.minimum(jnp.sum(flags.astype(jnp.int32)), pair_cap)
    active = jnp.arange(pair_cap) < count

    pa = pairs.body_a[sel]
    pb = pairs.body_b[sel]
    mesh_is_a = shapes.tag[pa] == shp.POLYLINE
    mesh_body = jnp.where(mesh_is_a, pa, pb)
    ball_body = jnp.where(mesh_is_a, pb, pa)
    mesh_pose = _take_sim(poses, mesh_body)
    ball_pose = _take_sim(poses, ball_body)
    radius = shapes.params[ball_body, 0] * ball_pose.scale
    first_idx = shapes.params[mesh_body, 2].astype(jnp.int32)
    num_idx = shapes.params[mesh_body, 3].astype(jnp.int32)

    c_local = sim_ops.inv_mul_pt(mesh_pose, ball_pose.translation)
    segs = shapes.indices  # [S, 2]
    s_max = max(segs.shape[0], 1)
    va = shapes.vertices[segs[:, 0]]
    vb = shapes.vertices[segs[:, 1]]
    proj = project_segment(c_local[:, None, :], va[None], vb[None])
    delta = c_local[:, None, :] - proj.point
    d_center = jnp.linalg.norm(delta, axis=-1)
    d_surface = d_center - radius[:, None]
    seg_ids = jnp.arange(s_max, dtype=jnp.int32)
    in_range = ((seg_ids[None, :] >= first_idx[:, None])
                & (seg_ids[None, :] < (first_idx + num_idx)[:, None]))
    score = jnp.where(in_range & active[:, None], d_surface, 1e9)
    neg_d, best = jax.lax.top_k(-score, k_best)
    best_d = -neg_d
    hit = best_d < prediction

    bpt = jnp.take_along_axis(proj.point, best[..., None].repeat(dim, -1), 1)
    n_mesh = c_local[:, None, :] - bpt
    nn = jnp.linalg.norm(n_mesh, axis=-1, keepdims=True)
    n_mesh = jnp.where(nn > 1e-9, n_mesh / jnp.maximum(nn, 1e-30),
                       jnp.zeros_like(n_mesh).at[..., 1].set(1.0))
    mesh_pose_b = Sim(mesh_pose.rotation[:, None], mesh_pose.translation[:, None],
                      mesh_pose.scale[:, None])
    n_world = sim_ops.mul_unit_vec(mesh_pose_b, n_mesh)
    n_ab = -n_world
    ball_pose_b = Sim(ball_pose.rotation[:, None], ball_pose.translation[:, None],
                      ball_pose.scale[:, None])
    n_a_local = sim_ops.inv_mul_unit_vec(ball_pose_b, n_ab)
    pt_world = ball_pose.translation[:, None, :] + n_ab * radius[:, None, None]
    pt_a_local = sim_ops.inv_mul_pt(ball_pose_b, pt_world)

    cap = pair_cap * k_best
    valid = (hit & active[:, None]).reshape(cap)
    body_a = jnp.broadcast_to(ball_body[:, None], (pair_cap, k_best)).reshape(cap)
    body_b = jnp.broadcast_to(mesh_body[:, None], (pair_cap, k_best)).reshape(cap)
    points = jnp.zeros((cap, p_max, dim), jnp.float32).at[:, 0].set(
        pt_a_local.reshape(cap, dim))
    dists = jnp.full((cap, p_max), 1e9, jnp.float32).at[:, 0].set(
        best_d.reshape(cap))
    num_points = jnp.where(valid, 1, 0).astype(jnp.int32)
    return Contacts(body_a, body_b, n_a_local.reshape(cap, dim), points, dists,
                    num_points, valid)
