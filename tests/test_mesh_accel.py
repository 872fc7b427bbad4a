"""Two-level cluster acceleration for mesh queries (queries/mesh_accel.py ≙
the reference's per-shape flattened BVH, shape.rs:307-480 + the WGSL
traversals in narrow_phase.wgsl:173 / polyline.wgsl:58): build invariants,
clustered-vs-dense parity for rays and contacts, and a 100k-triangle scene
that only the accelerated path can step."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from wgmath_tpu.broad_phase.brute_force import PairList
from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.geometry.sim import Sim
from wgmath_tpu.queries import ray as ray_q
from wgmath_tpu.queries.mesh_accel import (
    MESH_LEAF,
    build_clusters,
    use_clusters,
)
from wgmath_tpu.queries.mesh_contact import mesh_ball_contacts
from wgmath_tpu.shapes import shape as shp
from wgmath_tpu.shapes.mesh import heightfield


def _bumpy_field(n: int, seed: int = 0, amp: float = 0.6):
    rng = np.random.default_rng(seed)
    xs = np.linspace(-3 * np.pi, 3 * np.pi, n)
    h = (np.sin(xs)[:, None] * np.cos(xs)[None, :]
         + amp * rng.standard_normal((n, n))).astype(np.float32)
    return heightfield(h, 0.5, 0.5), h


def _strip_clusters(shapes: shp.ShapeSet) -> shp.ShapeSet:
    """Twin shape set forced onto the dense path (identical Morton-ordered
    index buffer, no cluster AABBs)."""
    dim = shapes.vertices.shape[1]
    return dataclasses.replace(
        shapes, cluster_min=jnp.zeros((0, dim), jnp.float32),
        cluster_max=jnp.zeros((0, dim), jnp.float32))


def test_build_clusters_invariants():
    rng = np.random.default_rng(1)
    verts = rng.standard_normal((500, 3)).astype(np.float32)
    tris = rng.integers(0, 500, (301, 3)).astype(np.int32)
    out, cmin, cmax = build_clusters(verts, tris, margin=0.02)
    # padded to a LEAF multiple; clusters cover exactly the padded rows
    assert len(out) % MESH_LEAF == 0
    assert len(cmin) * MESH_LEAF == len(out)
    # real rows are a permutation of the input triangles
    key = lambda t: sorted(map(tuple, np.sort(t, axis=1)))
    assert key(out[:301]) == key(tris)
    # every real primitive sits inside its (margin-dilated) cluster AABB
    prim = verts[out]  # [T', 3, 3]
    cid = np.arange(len(out)) // MESH_LEAF
    real = np.arange(len(out)) < 301
    lo = prim.min(axis=1)[real]
    hi = prim.max(axis=1)[real]
    assert np.all(lo >= cmin[cid[real]] - 1e-6)
    assert np.all(hi <= cmax[cid[real]] + 1e-6)


def test_ray_trimesh_clustered_matches_dense():
    mesh, h = _bumpy_field(64, seed=2)  # 63²·2 = 7938 tris → clustered
    assert use_clusters(mesh)
    dense = _strip_clusters(mesh)

    rng = np.random.default_rng(3)
    n = 64
    o = np.stack([rng.uniform(-12, 12, n), np.full(n, 8.0),
                  rng.uniform(-12, 12, n)], -1).astype(np.float32)
    # mix of straight-down and oblique rays
    d = np.stack([rng.uniform(-0.3, 0.3, n), np.full(n, -1.0),
                  rng.uniform(-0.3, 0.3, n)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    first = jnp.zeros((n,), jnp.int32)
    num = jnp.full((n,), int(mesh.params[0, 3]), jnp.int32)
    t_acc = np.asarray(ray_q.ray_trimesh(jnp.asarray(o), jnp.asarray(d),
                                         mesh, first, num))
    t_ref = np.asarray(ray_q.ray_trimesh(jnp.asarray(o), jnp.asarray(d),
                                         dense, first, num))
    assert np.isfinite(t_ref).sum() > n // 2  # the field actually gets hit
    np.testing.assert_allclose(t_acc, t_ref, rtol=1e-6, atol=1e-6)


def test_ray_polyline_matches_numpy_oracle():
    # zig-zag 2D polyline, dense (below the cluster threshold)
    from wgmath_tpu.shapes.mesh import polyline

    xs = np.linspace(-5, 5, 41).astype(np.float32)
    ys = np.where(np.arange(41) % 2 == 0, 0.0, 1.0).astype(np.float32)
    verts = np.stack([xs, ys], -1)
    line = polyline(verts)
    n = 32
    rng = np.random.default_rng(4)
    o = np.stack([rng.uniform(-4.5, 4.5, n), np.full(n, 4.0)], -1)
    d = np.tile([[0.0, -1.0]], (n, 1)).astype(np.float32)
    first = jnp.zeros((n,), jnp.int32)
    num = jnp.full((n,), int(line.params[0, 3]), jnp.int32)
    t = np.asarray(ray_q.ray_polyline(
        jnp.asarray(o, jnp.float32), jnp.asarray(d), line, first, num))

    # numpy oracle: ray x = ox (downward) vs each segment
    segs = np.asarray(line.indices)[:int(line.params[0, 3])]
    va, vb = verts[segs[:, 0]], verts[segs[:, 1]]
    t_ref = np.full(n, np.inf)
    for i in range(n):
        ox = o[i, 0]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = (ox - va[:, 0]) / (vb[:, 0] - va[:, 0])
        okm = (u >= 0) & (u <= 1)
        yhit = va[:, 1] + u * (vb[:, 1] - va[:, 1])
        tt = o[i, 1] - yhit
        tt = np.where(okm & (tt >= 0), tt, np.inf)
        t_ref[i] = tt.min()
    np.testing.assert_allclose(t, t_ref, rtol=1e-5, atol=1e-5)

    # world-space dispatch: POLYLINE tag routed in 2D `cast`
    shapes_b = shp.ShapeSet(
        jnp.repeat(line.tag, n), jnp.repeat(line.params, n, axis=0),
        line.vertices, line.indices, line.cluster_min, line.cluster_max,
        kinds=line.kinds)
    poses = sim_ops.identity((n,), dim=2)
    t2 = np.asarray(ray_q.cast(shapes_b, poses, jnp.asarray(o, jnp.float32),
                               jnp.asarray(d)))
    np.testing.assert_allclose(t2, t_ref, rtol=1e-5, atol=1e-5)


def test_mesh_ball_contacts_clustered_matches_dense():
    mesh, h = _bumpy_field(64, seed=5, amp=0.3)
    assert use_clusters(mesh)
    dense = _strip_clusters(mesh)
    r = 0.25
    n_b = 24
    rng = np.random.default_rng(6)
    # balls resting just above the surface at random grid spots
    ii = rng.integers(4, 60, n_b)
    jj = rng.integers(4, 60, n_b)
    xs = (ii - 63 / 2.0) * 0.5
    zs = (jj - 63 / 2.0) * 0.5
    pos = np.stack([xs, h[ii, jj] + r + 0.001, zs], -1).astype(np.float32)

    nb = n_b + 1
    trans = jnp.concatenate([jnp.zeros((1, 3), jnp.float32),
                             jnp.asarray(pos)])
    poses = Sim(jnp.tile(jnp.asarray([0.0, 0, 0, 1], jnp.float32), (nb, 1)),
                trans, jnp.ones((nb,), jnp.float32))
    pair_ids = jnp.arange(1, nb, dtype=jnp.int32)
    pairs = PairList(jnp.zeros((n_b,), jnp.int32), pair_ids,
                     jnp.ones((n_b,), bool), jnp.int32(n_b))

    def run(mesh_set):
        shapes = shp.ShapeSet.concat(
            mesh_set, shp.ShapeSet.balls(jnp.full((n_b,), r, jnp.float32)))
        return mesh_ball_contacts(poses, shapes, pairs, 0.02,
                                  pair_cap=32, k_best=4)

    ca = run(mesh)
    cd = run(dense)
    va_, vd = np.asarray(ca.valid), np.asarray(cd.valid)
    np.testing.assert_array_equal(va_, vd)
    assert va_.sum() >= n_b  # every ball found its resting triangle
    np.testing.assert_allclose(np.asarray(ca.dist)[va_],
                               np.asarray(cd.dist)[vd], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ca.points_a)[va_],
                               np.asarray(cd.points_a)[vd], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ca.body_a)[va_],
                                  np.asarray(cd.body_a)[vd])


def test_100k_tri_scene_steps():
    """VERDICT #2 criterion: a ≥100k-triangle mesh scene steps without the
    dense O(pairs × tris) sweep. 30 balls rest on a 225² heightfield
    (100,352 triangles) for 10 frames without sinking."""
    from wgmath_tpu.dynamics import SimParams
    from wgmath_tpu.dynamics.body import (Bodies, Velocity,
                                          ball_local_mprops,
                                          cuboid_local_mprops)
    from wgmath_tpu.pipeline import PipelineConfig, new_state, step
    from wgmath_tpu.scenes.builders import _merge_mprops

    n_grid = 225
    rng = np.random.default_rng(7)
    xs = np.linspace(-2 * np.pi, 2 * np.pi, n_grid)
    h = (0.5 * np.sin(xs)[:, None] * np.cos(xs)[None, :]).astype(np.float32)
    mesh = heightfield(h, 0.2, 0.2)
    assert int(mesh.params[0, 3]) >= 100_000
    assert use_clusters(mesh)

    r = 0.15
    n_b = 30
    ii = rng.integers(10, n_grid - 10, n_b)
    jj = rng.integers(10, n_grid - 10, n_b)
    pos = np.stack([(ii - (n_grid - 1) / 2.0) * 0.2,
                    h[ii, jj] + r + 0.001,
                    (jj - (n_grid - 1) / 2.0) * 0.2], -1).astype(np.float32)
    shapes = shp.ShapeSet.concat(
        mesh, shp.ShapeSet.balls(jnp.full((n_b,), r, jnp.float32)))
    nb = n_b + 1
    trans = jnp.concatenate([jnp.zeros((1, 3), jnp.float32),
                             jnp.asarray(pos)])
    poses = Sim(jnp.tile(jnp.asarray([0.0, 0, 0, 1], jnp.float32), (nb, 1)),
                trans, jnp.ones((nb,), jnp.float32))
    mp = _merge_mprops(
        cuboid_local_mprops(jnp.asarray([[25.0, 1.0, 25.0]], jnp.float32),
                            dynamic=jnp.asarray([False])),
        ball_local_mprops(jnp.full((n_b,), r, jnp.float32)))
    bodies = Bodies(poses, Velocity.zero(nb, 3), mp)
    state = new_state(bodies, shapes)
    cfg = PipelineConfig(pair_capacity=256, contact_capacity=256,
                         mesh_pair_capacity=64, max_colors=8,
                         manifold_points=1)
    params = SimParams()
    for f in range(10):
        state = step(state, params, cfg, warmstart=f > 0)
    y_end = np.asarray(state.bodies.poses.translation)[1:, 1]
    drop = (pos[:, 1] - y_end)
    assert drop.max() < 0.02, drop.max()  # resting, not falling through
