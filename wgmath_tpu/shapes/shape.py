"""Shape tagged-union as structure-of-arrays (≙ wgparry shapes/shape.rs:44-622
GpuShape: all shapes packed in 3×vec4 with the tag bit-cast into a.w).

TPU-native layout: a ``ShapeSet`` holds one i32 tag array plus one f32 param
matrix; per-type dispatch is masked vectorized evaluation (cheap formulas) or
pair-type partitioning (expensive narrow-phase kernels) rather than the
reference's per-thread WGSL switch. Mesh-backed shapes (polyline/trimesh/
convex) reference shared vertex/index buffers via (offset, count) params —
same flattening as shape.rs:307-480.

Param layout per tag (params[:, 0:8]):
- BALL:     [radius]
- CUBOID:   [hx, hy(, hz)]
- CAPSULE:  [half_height, radius]           (segment along local Y)
- CONE:     [half_height, radius]           (3D; apex +Y)
- CYLINDER: [half_height, radius]           (3D)
- SEGMENT:  [ax, ay, az, bx, by, bz]
- TRIANGLE: vertex buffer ref [first_vtx, 3]
- POLYLINE / TRIMESH / CONVEX: [first_vtx, num_vtx, first_idx, num_idx]
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import tree_util

from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.geometry.sim import Sim

BALL = 0
CUBOID = 1
CAPSULE = 2
CONE = 3
CYLINDER = 4
SEGMENT = 5
TRIANGLE = 6
POLYLINE = 7
TRIMESH = 8
CONVEX = 9

NUM_PARAMS = 8


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShapeSet:
    """All collider shapes, SoA (≙ GpuShape tagged union + ShapeBuffers).

    ``kinds`` is the *static* set of shape tags present — pytree aux data, so
    jitted narrow-phase code specializes per scene composition and skips
    contact kernels for absent type pairs (SURVEY §7 hard part 6).
    """

    tag: jax.Array  # i32 [N]
    params: jax.Array  # f32 [N, NUM_PARAMS]
    # shared flattened mesh storage (≙ ShapeBuffers vertex/index buffers)
    vertices: jax.Array  # f32 [V, dim]
    indices: jax.Array  # i32 [I, dim] (triangles in 3D, segments in 2D)
    # two-level mesh acceleration (queries.mesh_accel ≙ the reference's
    # flattened per-shape BVH, shape.rs:307-480): one AABB per MESH_LEAF-run
    # of Morton-ordered primitives; cluster id ≡ primitive id // MESH_LEAF,
    # so mesh constructors pad their index ranges to that multiple
    cluster_min: jax.Array = None  # f32 [C, dim]
    cluster_max: jax.Array = None  # f32 [C, dim]
    kinds: frozenset = frozenset(
        (BALL, CUBOID, CAPSULE, CONE, CYLINDER, SEGMENT, TRIANGLE, POLYLINE,
         TRIMESH, CONVEX))

    def __post_init__(self):
        # default empty cluster arrays for non-mesh constructors. jax tree
        # internals unflatten with None/symbolic leaves (e.g. shard_map
        # structure probing) — leave those untouched
        if (self.cluster_min is None
                and getattr(self.vertices, "ndim", None) == 2):
            dim = self.vertices.shape[1]
            self.cluster_min = jnp.zeros((0, dim), jnp.float32)
            self.cluster_max = jnp.zeros((0, dim), jnp.float32)

    def tree_flatten(self):
        return (self.tag, self.params, self.vertices, self.indices,
                self.cluster_min, self.cluster_max), self.kinds

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, kinds=aux)

    @property
    def num_shapes(self):
        return self.tag.shape[0]

    @staticmethod
    def balls(radii, dim: int = 3) -> "ShapeSet":
        radii = jnp.asarray(radii, jnp.float32)
        n = radii.shape[0]
        params = jnp.zeros((n, NUM_PARAMS), jnp.float32).at[:, 0].set(radii)
        return ShapeSet(jnp.full((n,), BALL, jnp.int32), params,
                        jnp.zeros((0, dim), jnp.float32),
                        jnp.zeros((0, dim), jnp.int32),
                        kinds=frozenset((BALL,)))

    @staticmethod
    def cuboids(half_extents) -> "ShapeSet":
        he = jnp.asarray(half_extents, jnp.float32)
        n, dim = he.shape
        params = jnp.zeros((n, NUM_PARAMS), jnp.float32).at[:, :dim].set(he)
        return ShapeSet(jnp.full((n,), CUBOID, jnp.int32), params,
                        jnp.zeros((0, dim), jnp.float32),
                        jnp.zeros((0, dim), jnp.int32),
                        kinds=frozenset((CUBOID,)))

    @staticmethod
    def capsules(half_heights, radii, dim: int = 3) -> "ShapeSet":
        hh = jnp.asarray(half_heights, jnp.float32)
        r = jnp.asarray(radii, jnp.float32)
        n = hh.shape[0]
        params = (jnp.zeros((n, NUM_PARAMS), jnp.float32)
                  .at[:, 0].set(hh).at[:, 1].set(r))
        return ShapeSet(jnp.full((n,), CAPSULE, jnp.int32), params,
                        jnp.zeros((0, dim), jnp.float32),
                        jnp.zeros((0, dim), jnp.int32),
                        kinds=frozenset((CAPSULE,)))

    @staticmethod
    def cylinders(half_heights, radii) -> "ShapeSet":
        """3D cylinders, axis +Y (≙ shapes/cylinder.wgsl)."""
        hh = jnp.asarray(half_heights, jnp.float32)
        r = jnp.asarray(radii, jnp.float32)
        n = hh.shape[0]
        params = (jnp.zeros((n, NUM_PARAMS), jnp.float32)
                  .at[:, 0].set(hh).at[:, 1].set(r))
        return ShapeSet(jnp.full((n,), CYLINDER, jnp.int32), params,
                        jnp.zeros((0, 3), jnp.float32),
                        jnp.zeros((0, 3), jnp.int32),
                        kinds=frozenset((CYLINDER,)))

    @staticmethod
    def cones(half_heights, radii) -> "ShapeSet":
        """3D cones, apex +Y, base disk at −half_height (≙ cone.wgsl)."""
        hh = jnp.asarray(half_heights, jnp.float32)
        r = jnp.asarray(radii, jnp.float32)
        n = hh.shape[0]
        params = (jnp.zeros((n, NUM_PARAMS), jnp.float32)
                  .at[:, 0].set(hh).at[:, 1].set(r))
        return ShapeSet(jnp.full((n,), CONE, jnp.int32), params,
                        jnp.zeros((0, 3), jnp.float32),
                        jnp.zeros((0, 3), jnp.int32),
                        kinds=frozenset((CONE,)))

    @staticmethod
    def segments(a, b) -> "ShapeSet":
        """Standalone 3D segment colliders with endpoints ``a``/``b``
        [N, 3] in shape-local space (≙ shapes/segment.wgsl). Params:
        [ax, ay, az, bx, by, bz] — endpoints double as the support core
        in the GJK narrow phase (queries/gjk.support_core)."""
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        n, dim = a.shape
        params = (jnp.zeros((n, NUM_PARAMS), jnp.float32)
                  .at[:, :dim].set(a).at[:, dim:2 * dim].set(b))
        return ShapeSet(jnp.full((n,), SEGMENT, jnp.int32), params,
                        jnp.zeros((0, dim), jnp.float32),
                        jnp.zeros((0, dim), jnp.int32),
                        kinds=frozenset((SEGMENT,)))

    @staticmethod
    def triangles(verts) -> "ShapeSet":
        """Standalone 3D triangle colliders, ``verts`` [N, 3, 3] in
        shape-local space (≙ shapes/triangle.wgsl). Stored as vertex-buffer
        ranges (params = [first_vtx, 3]) like CONVEX, so the GJK support
        arg-max and ``ShapeSet.concat`` rebasing apply unchanged; the
        conservative local bound rides params[4:7]."""
        verts = jnp.asarray(verts, jnp.float32)
        n = verts.shape[0]
        flat = verts.reshape(n * 3, 3)
        he_sym = jnp.max(jnp.abs(verts), axis=1)  # symmetric |v| bound
        params = (jnp.zeros((n, NUM_PARAMS), jnp.float32)
                  .at[:, 0].set(jnp.arange(n, dtype=jnp.float32) * 3)
                  .at[:, 1].set(3.0)
                  .at[:, 4:7].set(he_sym))
        return ShapeSet(jnp.full((n,), TRIANGLE, jnp.int32), params, flat,
                        jnp.zeros((0, 3), jnp.int32),
                        kinds=frozenset((TRIANGLE,)))

    @staticmethod
    def concat(*sets: "ShapeSet") -> "ShapeSet":
        """Concatenate shape sets, rebasing mesh buffer references."""
        from wgmath_tpu.queries.mesh_accel import MESH_LEAF

        tags, params, verts, idxs, cmins, cmaxs = [], [], [], [], [], []
        v_off = 0
        i_off = 0
        kinds: frozenset = frozenset()
        has_clusters = any(s.cluster_min.shape[0] > 0 for s in sets)
        for s in sets:
            if (has_clusters
                    and s.cluster_min.shape[0] * MESH_LEAF
                    != s.indices.shape[0]):
                # cluster id ≡ tri id // MESH_LEAF needs every index range
                # L-aligned AND cluster-covered (mesh constructors guarantee
                # both; hand-built sets must too)
                raise ValueError(
                    f"cluster-accelerated concat needs one cluster per "
                    f"MESH_LEAF index rows: {s.cluster_min.shape[0]} "
                    f"clusters vs {s.indices.shape[0]} index rows")
            p = s.params
            is_mesh = (s.tag >= POLYLINE) | (s.tag == TRIANGLE)
            p = p.at[:, 0].add(jnp.where(is_mesh, v_off, 0.0))
            p = p.at[:, 2].add(jnp.where(s.tag >= POLYLINE, i_off, 0.0))
            tags.append(s.tag)
            params.append(p)
            verts.append(s.vertices)
            idx = s.indices + v_off if s.indices.size else s.indices
            idxs.append(idx)
            cmins.append(s.cluster_min)
            cmaxs.append(s.cluster_max)
            v_off += s.vertices.shape[0]
            i_off += s.indices.shape[0]
            kinds = kinds | s.kinds
        return ShapeSet(jnp.concatenate(tags), jnp.concatenate(params),
                        jnp.concatenate(verts), jnp.concatenate(idxs),
                        jnp.concatenate(cmins), jnp.concatenate(cmaxs),
                        kinds=kinds)


def local_aabb_half_extents(shapes: ShapeSet, dim: int) -> jax.Array:
    """Conservative symmetric local-space AABB half extents per shape [N, dim].

    Exact for ball/cuboid; conservative (height+radius box) for capsule,
    cone, cylinder. Mesh shapes are handled by their precomputed bound stored
    in params[4:4+dim] (filled at build time).
    """
    p = shapes.params
    tag = shapes.tag
    r = p[:, 0:1]
    ball_he = jnp.repeat(r, dim, axis=1)
    cuboid_he = p[:, :dim]
    hh = p[:, 0:1]
    rad = p[:, 1:2]
    if dim == 3:
        capsule_he = jnp.concatenate([rad, hh + rad, rad], axis=1)
        round_he = jnp.concatenate([rad, hh, rad], axis=1)
    else:
        capsule_he = jnp.concatenate([rad, hh + rad], axis=1)
        round_he = jnp.concatenate([rad, hh], axis=1)
    mesh_he = p[:, 4:4 + dim]
    # segments store raw endpoints in params[:2·dim] (no room for a cached
    # bound): symmetric cover = per-axis max |endpoint|
    seg_he = jnp.maximum(jnp.abs(p[:, :dim]), jnp.abs(p[:, dim:2 * dim]))
    he = jnp.where((tag == BALL)[:, None], ball_he,
         jnp.where((tag == CUBOID)[:, None], cuboid_he,
         jnp.where((tag == CAPSULE)[:, None], capsule_he,
         jnp.where(((tag == CONE) | (tag == CYLINDER))[:, None], round_he,
         jnp.where((tag == SEGMENT)[:, None], seg_he,
                   mesh_he)))))
    return he


def world_aabbs(shapes: ShapeSet, poses: Sim, *, margin: float = 0.0):
    """(mins, maxs) world AABBs [N, dim] (≙ wgparry bounding_volumes/aabb.wgsl
    per-shape aabb dispatch). Rotation handled conservatively by rotating the
    symmetric local box: world half-extent = |R| · he (exact for balls)."""
    dim = poses.translation.shape[-1]
    he = local_aabb_half_extents(shapes, dim) * poses.scale[:, None]
    if dim == 3:
        from wgmath_tpu.geometry import quat

        rmat = jnp.abs(quat.to_matrix(poses.rotation))
    else:
        from wgmath_tpu.geometry import rot2

        rmat = jnp.abs(rot2.to_matrix(poses.rotation))
    world_he = jnp.einsum("nij,nj->ni", rmat, he)
    # balls are rotation-invariant: |R|·(r,r,r) would inflate the box by up
    # to √3 once bodies tumble (and with it every broad-phase budget)
    world_he = jnp.where((shapes.tag == BALL)[:, None], he, world_he) + margin
    center = poses.translation
    return center - world_he, center + world_he


def ball_radii_or_nan(shapes: ShapeSet, poses: Sim) -> jax.Array:
    """[N] effective ball radius (scale-adjusted), NaN for non-ball shapes —
    feeds the broad phase's exact sphere-sphere prefilter."""
    r = shapes.params[:, 0] * poses.scale
    return jnp.where(shapes.tag == BALL, r, jnp.nan)


def vertex_collider_ids(shapes: ShapeSet) -> jax.Array:
    """[V] i32 — owning shape index per shared-vertex-buffer row, -1 for
    rows no mesh-backed shape references.

    ≙ ``GpuBodySet.shapes_vertex_collider_id`` (body.rs:133-135, 341-362):
    the reference keeps this per-vertex collider-id map as the coupling
    surface its MPM downstream (wgsparkl) reads. Mesh-backed shapes
    reference disjoint (first_vtx, num_vtx) runs of the shared buffer, so
    ownership resolves with one sort + searchsorted over run starts."""
    V = shapes.vertices.shape[0]
    tag = shapes.tag
    is_mesh = ((tag == TRIANGLE) | (tag == POLYLINE) | (tag == TRIMESH)
               | (tag == CONVEX))
    first = jnp.where(is_mesh, shapes.params[:, 0].astype(jnp.int32),
                      jnp.int32(V + 1))
    num = jnp.where(tag == TRIANGLE, 3,
                    shapes.params[:, 1].astype(jnp.int32))
    order = jnp.argsort(first).astype(jnp.int32)
    sf = first[order]
    v = jnp.arange(V, dtype=jnp.int32)
    j = jnp.searchsorted(sf, v, side="right", method="sort") - 1
    ids = order[jnp.clip(j, 0, tag.shape[0] - 1)]
    ok = is_mesh[ids] & (v >= first[ids]) & (v < first[ids] + num[ids])
    return jnp.where(ok, ids, -1)


def world_vertex_buffer(shapes: ShapeSet, poses: Sim,
                        collider_ids: jax.Array | None = None) -> jax.Array:
    """[V, dim] — shared vertex buffer transformed into world space by each
    vertex's owning collider pose (≙ the reference's per-step
    ``shapes_vertex_buffers`` update, body.rs:293-304); unowned rows pass
    through untransformed."""
    ids = (vertex_collider_ids(shapes) if collider_ids is None
           else collider_ids)
    safe = jnp.maximum(ids, 0)
    owner = jax.tree.map(lambda x: x[safe], poses)
    w = sim_ops.mul_pt(owner, shapes.vertices)
    return jnp.where((ids >= 0)[:, None], w, shapes.vertices)
