"""Mesh-backed shapes: triangle meshes + polylines (≙ wgparry
shapes/trimesh.wgsl, polyline.wgsl, vtx_idx.wgsl and the CPU-side flattening
in shape.rs:307-480).

Meshes are flattened into the ShapeSet's shared vertex/index buffers with
per-shape (first, count) references. The reference builds a per-shape BVH on
the CPU and traverses it per thread in the narrow phase; the TPU-native first
cut evaluates *all* triangles of a mesh against each colliding convex with
masks — a dense [pairs × T_max] sweep the VPU eats for moderate meshes — and
keeps the K deepest triangle contacts per pair. (A device LBVH over triangles
is available via broad_phase.lbvh.build for large meshes.)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from wgmath_tpu.shapes import shape as shp


TRI_MARGIN = 0.02  # collision-margin shell around mesh triangles


def trimesh(vertices: np.ndarray, indices: np.ndarray) -> shp.ShapeSet:
    """One triangle-mesh collider (3D). The broad-phase bound includes the
    triangle collision margin so contacts engage at the margin standoff.

    Triangles are Morton-ordered into MESH_LEAF clusters with per-cluster
    AABBs (queries.mesh_accel ≙ the reference's CPU-built flattened BVH,
    shape.rs:307-480) so large meshes avoid the dense per-triangle sweeps."""
    from wgmath_tpu.queries.mesh_accel import build_clusters

    vertices = np.asarray(vertices, np.float32)
    indices = np.asarray(indices, np.int32)
    n_tris = len(indices)
    indices, cmin, cmax = build_clusters(vertices, indices,
                                         margin=TRI_MARGIN)
    he = (vertices.max(0) - vertices.min(0)) / 2.0
    center = (vertices.max(0) + vertices.min(0)) / 2.0
    # conservative symmetric local bound (shape AABB helper reads params[4:7])
    he_sym = np.abs(center) + he + 2.0 * TRI_MARGIN
    params = np.zeros((1, shp.NUM_PARAMS), np.float32)
    params[0, 0] = 0  # first_vtx
    params[0, 1] = len(vertices)
    params[0, 2] = 0  # first_idx
    params[0, 3] = n_tris  # real count; rows past it are cluster padding
    params[0, 4:7] = he_sym
    return shp.ShapeSet(
        jnp.asarray([shp.TRIMESH], jnp.int32), jnp.asarray(params),
        jnp.asarray(vertices), jnp.asarray(indices),
        jnp.asarray(cmin), jnp.asarray(cmax),
        kinds=frozenset((shp.TRIMESH,)))


def polyline(vertices: np.ndarray, *, closed: bool = False) -> shp.ShapeSet:
    """One polyline collider (2D boundary or 3D wire). Segments are
    Morton-clustered like trimesh triangles (queries.mesh_accel)."""
    from wgmath_tpu.queries.mesh_accel import build_clusters

    vertices = np.asarray(vertices, np.float32)
    n = len(vertices)
    segs = [[i, i + 1] for i in range(n - 1)]
    if closed:
        segs.append([n - 1, 0])
    indices = np.asarray(segs, np.int32)
    n_segs = len(indices)
    indices, cmin, cmax = build_clusters(vertices, indices)
    dim = vertices.shape[1]
    he = (vertices.max(0) - vertices.min(0)) / 2.0
    center = (vertices.max(0) + vertices.min(0)) / 2.0
    he_sym = np.abs(center) + he
    params = np.zeros((1, shp.NUM_PARAMS), np.float32)
    params[0, 1] = n
    params[0, 3] = n_segs
    params[0, 4:4 + dim] = he_sym
    return shp.ShapeSet(
        jnp.asarray([shp.POLYLINE], jnp.int32), jnp.asarray(params),
        jnp.asarray(vertices), jnp.asarray(indices),
        jnp.asarray(cmin), jnp.asarray(cmax),
        kinds=frozenset((shp.POLYLINE,)))


def heightfield(heights: np.ndarray, scale_x: float = 1.0,
                scale_z: float = 1.0) -> shp.ShapeSet:
    """Grid heightfield as a trimesh (the reference's trimesh demo source)."""
    heights = np.asarray(heights, np.float32)
    nx, nz = heights.shape
    xs = (np.arange(nx) - (nx - 1) / 2.0) * scale_x
    zs = (np.arange(nz) - (nz - 1) / 2.0) * scale_z
    verts = np.stack(np.meshgrid(xs, zs, indexing="ij"), -1)
    verts = np.concatenate([verts[..., :1], heights[..., None],
                            verts[..., 1:]], axis=-1).reshape(-1, 3)
    tris = []
    for i in range(nx - 1):
        for j in range(nz - 1):
            a = i * nz + j
            b = a + 1
            c = a + nz
            d = c + 1
            tris.append([a, b, c])
            tris.append([b, d, c])
    return trimesh(verts, np.asarray(tris, np.int32))


def _hull_faces(vertices: np.ndarray) -> np.ndarray:
    """Outward-oriented hull triangles [F, 3] (host-side qhull; empty on
    degenerate input — support/GJK still work from the raw vertices)."""
    try:
        from scipy.spatial import ConvexHull, QhullError
    except ImportError:  # pragma: no cover - scipy ships with jax
        return np.zeros((0, 3), np.int32)
    try:
        hull = ConvexHull(np.asarray(vertices, np.float64))
    except (QhullError, ValueError):  # coplanar / duplicate inputs
        return np.zeros((0, 3), np.int32)
    faces = hull.simplices.astype(np.int32)
    # qhull simplices are not consistently wound: orient each so its
    # geometric normal agrees with the qhull outward plane equation
    va, vb, vc = (vertices[faces[:, i]] for i in range(3))
    n_geom = np.cross(vb - va, vc - va)
    flip = np.sum(n_geom * hull.equations[:, :3], axis=-1) < 0.0
    faces[flip] = faces[flip][:, ::-1]
    return faces


def convex_polyhedron(vertices: np.ndarray) -> shp.ShapeSet:
    """One convex polyhedron collider from its (hull) vertices (3D) —
    support-mapped, used by GJK/EPA (≙ wgparry convex_polyhedron.wgsl).

    Hull faces (outward-wound triangles) are computed host-side and stored
    in the shared index buffer (params[2:4] range, Morton-clustered like
    trimesh so ``ShapeSet.concat``'s cluster invariant holds) — they feed
    the CONVEX ray cast and polygonal-feature extraction."""
    from wgmath_tpu.queries.mesh_accel import build_clusters

    vertices = np.asarray(vertices, np.float32)
    faces = _hull_faces(vertices)
    n_faces = len(faces)
    indices, cmin, cmax = build_clusters(vertices, faces)
    he = (vertices.max(0) - vertices.min(0)) / 2.0
    center = (vertices.max(0) + vertices.min(0)) / 2.0
    he_sym = np.abs(center) + he
    params = np.zeros((1, shp.NUM_PARAMS), np.float32)
    params[0, 0] = 0
    params[0, 1] = len(vertices)
    params[0, 2] = 0  # first_idx
    params[0, 3] = n_faces  # real count; rows past it are cluster padding
    params[0, 4:7] = he_sym
    return shp.ShapeSet(
        jnp.asarray([shp.CONVEX], jnp.int32), jnp.asarray(params),
        jnp.asarray(vertices), jnp.asarray(indices.reshape(-1, 3)),
        jnp.asarray(cmin), jnp.asarray(cmax),
        kinds=frozenset((shp.CONVEX,)))
