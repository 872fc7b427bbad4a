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


def _topk_by_score(shapes: shp.ShapeSet, first_idx, num_idx, c_local,
                   active, k_best: int, score_fn, offset, max_score,
                   k_clusters: int = 4):
    """EXACT top-``k_best`` primitives by ``score_fn`` around point
    ``c_local`` (mesh-local), per pair row.

    Small meshes: dense [P, T] scoring of the whole (broadcast) index buffer.
    Large clustered meshes: certified iterative cluster expansion
    (``mesh_accel.point_topk_prims`` — the TPU replacement for the
    reference's per-thread BVH descent, narrow_phase.wgsl:173). Both paths
    return the same ``(ids [P, K], scores [P, K])`` (global primitive ids;
    1e9-padded scores), so the contact math downstream is path-agnostic.

    ``score_fn`` must satisfy ``score >= dist(point, prim_aabb) - offset``
    and scores ≥ ``max_score`` are discarded by the caller (both per-row
    broadcastable) — see ``point_topk_prims``.
    """
    from wgmath_tpu.queries.mesh_accel import point_topk_prims, use_clusters

    if use_clusters(shapes):
        return point_topk_prims(
            shapes, first_idx, num_idx * active, c_local, k_best, score_fn,
            offset=offset, k_clusters=k_clusters, max_score=max_score)
    prims = shapes.indices
    t_max = max(prims.shape[0], 1)
    verts = tuple(shapes.vertices[prims[:, i]][None]
                  for i in range(prims.shape[1]))
    s = score_fn(c_local[:, None, :], *verts)
    ids = jnp.arange(t_max, dtype=jnp.int32)
    mask = ((ids[None, :] >= first_idx[:, None])
            & (ids[None, :] < (first_idx + num_idx)[:, None])
            & active[:, None])
    s = jnp.where(mask, s, 1e9)
    neg, best = jax.lax.top_k(-s, k_best)
    return best, -neg


def _gather_prim_verts(shapes: shp.ShapeSet, ids):
    """[P, K] global primitive ids → tuple of k vertex arrays [P, K, dim]."""
    prim = shapes.indices[jnp.clip(ids, 0, max(shapes.indices.shape[0] - 1,
                                               0))]
    return tuple(shapes.vertices[prim[..., i]]
                 for i in range(shapes.indices.shape[1]))


def mesh_ball_contacts(poses: Sim, shapes: shp.ShapeSet, pairs: PairList,
                       prediction: float, *, pair_cap: int = 512,
                       k_best: int = 4, p_max: int = 0) -> Contacts:
    """Contacts for (mesh, ball) pairs, K deepest triangles per pair.

    Returns a ``Contacts`` buffer of capacity ``pair_cap * k_best`` with the
    *ball* as body A (single-point manifolds on the ball's surface).
    """
    dim = poses.translation.shape[-1]
    p_max = p_max or max_points(dim)
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

    # K nearest triangles by surface distance — dense scoring on small
    # meshes, certified cluster expansion on large ones (mesh_accel)
    def score_fn(pt, va, vb, vc):
        proj = project_triangle(pt, va, vb, vc)
        return (jnp.linalg.norm(pt - proj.point, axis=-1) - radius[:, None])

    best, best_d = _topk_by_score(
        shapes, first_idx, num_idx, c_local, active, k_best, score_fn,
        offset=radius, max_score=prediction)
    hit = best_d < prediction

    # contact data per (pair, k): point on ball surface, normal ball→mesh…
    va, vb, vc = _gather_prim_verts(shapes, best)  # K winners only
    proj = project_triangle(c_local[:, None, :], va, vb, vc)
    bpt = proj.point  # [pair_cap, K, dim]
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
                         tri_margin: float = 0.02, p_max: int = 0) -> Contacts:
    """Contacts for (mesh, support-mapped convex) pairs via per-triangle GJK
    (≙ trimesh_convex: per-triangle contact emission). Candidate triangles
    are the K nearest by centroid; each runs triangle-vs-convex GJK with the
    triangle dilated by ``tri_margin`` (the standard collision-margin trick —
    penetration beyond the margin falls back to a center-axis push).

    The convex body is body A in the emitted manifolds.
    """
    from wgmath_tpu.queries.gjk import pfm_contact

    dim = poses.translation.shape[-1]
    p_max = p_max or max_points(dim)
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

    # candidate triangles: K nearest to the convex center by SURFACE
    # distance (mesh-local; exact on both the dense and clustered paths).
    # A triangle can only produce a contact if its surface comes within
    # the convex's bounding radius + margin + prediction of the center —
    # that bound (scaled into mesh-local units) is the expansion cutoff.
    c_local = sim_ops.inv_mul_pt(mesh_pose, cvx_pose.translation)
    tris = shapes.indices
    he_cvx = shp.local_aabb_half_extents(shapes, dim)[cvx_body]
    cvx_rad = jnp.linalg.norm(he_cvx, axis=-1) * cvx_pose.scale
    reach = (cvx_rad + tri_margin + prediction) / jnp.maximum(
        mesh_pose.scale, 1e-9)

    def score_fn(pt, va, vb, vc):
        proj = project_triangle(pt, va, vb, vc)
        return jnp.linalg.norm(pt - proj.point, axis=-1)

    best, best_s = _topk_by_score(
        shapes, first_idx, num_idx, c_local, active, k_best, score_fn,
        offset=0.0, max_score=reach)
    cand_ok = best_s < jnp.minimum(reach[:, None], 1e8)

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
                           k_best: int = 2, p_max: int = 0) -> Contacts:
    """2D contacts for (polyline, ball) pairs: K nearest segments per pair
    (≙ narrow_phase.wgsl polyline_convex). Ball is body A."""
    from wgmath_tpu.queries.projection import project_segment

    dim = poses.translation.shape[-1]
    p_max = p_max or max_points(dim)
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

    def score_fn(pt, va, vb):
        proj = project_segment(pt, va, vb)
        return (jnp.linalg.norm(pt - proj.point, axis=-1) - radius[:, None])

    best, best_d = _topk_by_score(
        shapes, first_idx, num_idx, c_local, active, k_best, score_fn,
        offset=radius, max_score=prediction)
    hit = best_d < prediction

    va, vb = _gather_prim_verts(shapes, best)
    proj = project_segment(c_local[:, None, :], va, vb)
    bpt = proj.point
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


def polyline_cuboid_contacts(poses: Sim, shapes: shp.ShapeSet, pairs: PairList,
                             prediction: float, *, pair_cap: int = 256,
                             k_best: int = 2) -> Contacts:
    """2D contacts for (polyline, cuboid) pairs: per-segment SAT (2 box face
    axes + segment normal), K deepest segments per pair, 2-point face
    clipping (≙ narrow_phase.wgsl polyline_convex for box colliders).

    Box is body A; all math happens in the box's local frame so normals and
    points land directly in the output convention.
    """
    tag_a = shapes.tag[pairs.body_a]
    tag_b = shapes.tag[pairs.body_b]
    m_a = (tag_a == shp.POLYLINE) & (tag_b == shp.CUBOID)
    m_b = (tag_b == shp.POLYLINE) & (tag_a == shp.CUBOID)
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
    box_body = jnp.where(mesh_is_a, pb, pa)
    mesh_pose = _take_sim(poses, mesh_body)
    box_pose = _take_sim(poses, box_body)
    he = shapes.params[box_body, :2]  # box-local half extents
    first_idx = shapes.params[mesh_body, 2].astype(jnp.int32)
    num_idx = shapes.params[mesh_body, 3].astype(jnp.int32)

    c_box_local = sim_ops.inv_mul_pt(mesh_pose, box_pose.translation)
    # candidate segments: the whole buffer (small polylines) or an exact
    # distance-preselect around the box center (clustered). Any segment
    # whose mesh-local distance to the center exceeds the box reach has
    # SAT separation > prediction, so the preselect loses nothing.
    from wgmath_tpu.queries.mesh_accel import use_clusters
    from wgmath_tpu.queries.projection import project_segment

    if use_clusters(shapes):
        reach = ((jnp.linalg.norm(he, axis=-1) + prediction)
                 * box_pose.scale / jnp.maximum(mesh_pose.scale, 1e-9))

        def seg_dist(pt, va, vb):
            return jnp.linalg.norm(
                pt - project_segment(pt, va, vb).point, axis=-1)

        from wgmath_tpu.queries.mesh_accel import point_topk_prims
        pre_ids, pre_s = point_topk_prims(
            shapes, first_idx, num_idx * active, c_box_local,
            max(4 * k_best, 8), seg_dist, offset=0.0, max_score=reach)
        sv0, sv1 = _gather_prim_verts(shapes, pre_ids)
        seg_mask = pre_s < jnp.minimum(reach[:, None], 1e8)
    else:
        segs = shapes.indices
        s_max = max(segs.shape[0], 1)
        sv0 = shapes.vertices[segs[:, 0]][None]
        sv1 = shapes.vertices[segs[:, 1]][None]
        seg_ids = jnp.arange(s_max, dtype=jnp.int32)
        seg_mask = ((seg_ids[None, :] >= first_idx[:, None])
                    & (seg_ids[None, :] < (first_idx + num_idx)[:, None])
                    & active[:, None])
    v0w = sim_ops.mul_pt(
        Sim(mesh_pose.rotation[:, None], mesh_pose.translation[:, None],
            mesh_pose.scale[:, None]), sv0)
    v1w = sim_ops.mul_pt(
        Sim(mesh_pose.rotation[:, None], mesh_pose.translation[:, None],
            mesh_pose.scale[:, None]), sv1)
    box_b = Sim(box_pose.rotation[:, None], box_pose.translation[:, None],
                box_pose.scale[:, None])
    p0 = sim_ops.inv_mul_pt(box_b, v0w)  # [P, S, 2] in box frame
    p1 = sim_ops.inv_mul_pt(box_b, v1w)

    # --- SAT over 3 axes (box x, box y, segment normal)
    lo = jnp.minimum(p0, p1)
    hi = jnp.maximum(p0, p1)
    heb = he[:, None, :]
    sep_pos = lo - heb
    sep_neg = -hi - heb
    face_sep_xy = jnp.maximum(sep_pos, sep_neg)  # [P, S, 2]
    face_sign = jnp.where(sep_pos >= sep_neg, 1.0, -1.0)
    face_sep = jnp.max(face_sep_xy, axis=-1)
    face_axis = jnp.argmax(face_sep_xy, axis=-1)  # 0 or 1

    d = p1 - p0
    seg_len = jnp.linalg.norm(d, axis=-1)
    ok_len = seg_len > 1e-9
    n_s = jnp.stack([-d[..., 1], d[..., 0]], axis=-1) / jnp.maximum(
        seg_len, 1e-30)[..., None]
    c = jnp.sum(n_s * p0, axis=-1)
    r_box = jnp.sum(jnp.abs(n_s) * heb, axis=-1)
    sep_n = jnp.where(ok_len, jnp.abs(c) - r_box, -1e9)
    n_dir = n_s * jnp.sign(c)[..., None]  # A→B (box → segment)

    use_face = face_sep > sep_n - 1e-3  # face manifolds preferred near ties
    sep = jnp.maximum(face_sep, sep_n)

    score = jnp.where(seg_mask, sep, 1e9)
    neg_s, best = jax.lax.top_k(-score, k_best)  # [P, K]
    best_sep = -neg_s

    def takek(x):  # gather per-(pair, selected segment) values
        if x.ndim == 2:
            return jnp.take_along_axis(x, best, axis=1)
        return jnp.take_along_axis(x, best[..., None].repeat(x.shape[-1], -1), 1)

    p0k, p1k, dk = takek(p0), takek(p1), takek(d)
    axk = takek(face_axis)
    sgk = jnp.take_along_axis(face_sign, best[..., None].repeat(2, -1), 1)
    sgk = jnp.where(axk[..., None] == 0, sgk[..., :1], sgk[..., 1:])[..., 0]
    usek = takek(use_face)
    n_dirk = takek(n_dir)
    sepk = best_sep
    hit = (sepk < prediction) & active[:, None]

    hex_ = he[:, None, 0]
    hey = he[:, None, 1]
    he_i = jnp.where(axk == 0, hex_, hey)
    he_j = jnp.where(axk == 0, hey, hex_)

    def comp(v, i):  # component i (0/1) of [...,2] with i-shaped index
        return jnp.where(i == 0, v[..., 0], v[..., 1])

    # --- face case: clip segment param range to tangential slab |x_j|<=he_j
    j = 1 - axk
    p0j = comp(p0k, j)
    dj = comp(dk, j)
    inv_dj = 1.0 / jnp.where(jnp.abs(dj) < 1e-12,
                             jnp.where(dj < 0, -1e-12, 1e-12), dj)
    ta = (-he_j - p0j) * inv_dj
    tb = (he_j - p0j) * inv_dj
    t_lo = jnp.maximum(jnp.minimum(ta, tb), 0.0)
    t_hi = jnp.minimum(jnp.maximum(ta, tb), 1.0)
    slab_hit = t_hi >= t_lo
    q0 = p0k + t_lo[..., None] * dk
    q1 = p0k + t_hi[..., None] * dk
    d0 = sgk * comp(q0, axk) - he_i
    d1 = sgk * comp(q1, axk) - he_i
    n_face = jnp.where((axk == 0)[..., None],
                       jnp.stack([sgk, jnp.zeros_like(sgk)], -1),
                       jnp.stack([jnp.zeros_like(sgk), sgk], -1))

    def on_face(q):  # project clipped point onto the reference face
        qi = sgk * he_i
        return jnp.where((axk == 0)[..., None],
                         jnp.stack([qi, q[..., 1]], -1),
                         jnp.stack([q[..., 0], qi], -1))

    f_pt0, f_pt1 = on_face(q0), on_face(q1)

    # --- corner case: deepest box corner vs closest point on segment
    sgn_c = jnp.where(n_dirk >= 0.0, 1.0, -1.0)
    corner = sgn_c * jnp.stack([hex_, hey], -1)
    t_c = jnp.clip(jnp.sum((corner - p0k) * dk, -1)
                   / jnp.maximum(jnp.sum(dk * dk, -1), 1e-30), 0.0, 1.0)
    q_c = p0k + t_c[..., None] * dk
    delta = q_c - corner
    d_c = jnp.linalg.norm(delta, axis=-1)
    pen = jnp.sum(delta * n_dirk, -1) < 0.0  # corner past the segment line
    n_corner = jnp.where(pen[..., None] | (d_c < 1e-9)[..., None],
                         n_dirk, delta / jnp.maximum(d_c, 1e-30)[..., None])
    dist_corner = jnp.where(pen, jnp.sum(delta * n_dirk, -1), d_c)

    # --- assemble per-(pair, segment) manifolds
    scale = box_pose.scale[:, None]
    use_f = usek & slab_hit
    n_out = jnp.where(use_f[..., None], n_face, n_corner)
    pt0 = jnp.where(use_f[..., None], f_pt0, corner)
    pt1 = jnp.where(use_f[..., None], f_pt1, corner)
    di0 = jnp.where(use_f, d0, dist_corner) * scale
    di1 = jnp.where(use_f, d1, dist_corner) * scale
    v0 = hit & (jnp.where(use_f, d0, dist_corner) < prediction)
    v1 = hit & use_f & (d1 < prediction)
    # valid points must occupy the first num_points slots (solver masks by
    # k < num_points) — shift slot 1 down when slot 0 missed
    shift = (~v0) & v1
    pt0 = jnp.where(shift[..., None], pt1, pt0)
    di0 = jnp.where(shift, di1, di0)
    v0, v1 = v0 | shift, v1 & ~shift

    cap = pair_cap * k_best
    pts = jnp.stack([pt0, pt1], axis=2).reshape(cap, 2, 2)
    dis = jnp.where(jnp.stack([v0, v1], 2), jnp.stack([di0, di1], 2),
                    1e9).reshape(cap, 2)
    nump = (v0.astype(jnp.int32) + v1.astype(jnp.int32)).reshape(cap)
    valid = (v0 | v1).reshape(cap)
    body_a = jnp.broadcast_to(box_body[:, None],
                              (pair_cap, k_best)).reshape(cap)
    body_b = jnp.broadcast_to(mesh_body[:, None],
                              (pair_cap, k_best)).reshape(cap)
    return Contacts(body_a, body_b, n_out.reshape(cap, 2), pts, dis,
                    nump, valid)
