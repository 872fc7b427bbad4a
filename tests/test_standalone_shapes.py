"""Standalone SEGMENT / TRIANGLE colliders routed through the GJK narrow
phase (VERDICT #9; ≙ the reference's per-shape contact support in
segment.wgsl / triangle.wgsl): support-function sanity, contact generation,
and a ball resting on each."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from wgmath_tpu.dynamics import SimParams
from wgmath_tpu.dynamics.body import (
    Bodies,
    LocalMassProperties,
    Velocity,
    ball_local_mprops,
    cuboid_local_mprops,
)
from wgmath_tpu.geometry import quat
from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.geometry.sim import Sim
from wgmath_tpu.pipeline import PipelineConfig, new_state, step
from wgmath_tpu.shapes import shape as shp
from wgmath_tpu.shapes.shape import ShapeSet


def _merge(*parts: LocalMassProperties) -> LocalMassProperties:
    return LocalMassProperties(
        jnp.concatenate([p.inv_mass for p in parts]),
        jnp.concatenate([p.com for p in parts]),
        jnp.concatenate([p.inertia_ref_frame for p in parts]),
        jnp.concatenate([p.inv_principal_inertia for p in parts]),
    )


def test_segment_support_and_distance():
    from wgmath_tpu.queries.gjk import gjk_distance

    # ball (r=0.5) at origin vs segment from (2,-1,0) to (2,1,0):
    # distance = 2 - 0.5 = 1.5, normal +x
    shapes = ShapeSet.concat(
        ShapeSet.balls(jnp.asarray([0.5], jnp.float32)),
        ShapeSet.segments([[2.0, -1.0, 0.0]], [[2.0, 1.0, 0.0]]))
    poses = Sim(quat.identity((2,)), jnp.zeros((2, 3), jnp.float32),
                jnp.ones((2,), jnp.float32))
    res = gjk_distance(
        shapes.tag[:1], shapes.params[:1],
        Sim(poses.rotation[:1], poses.translation[:1], poses.scale[:1]),
        shapes.tag[1:], shapes.params[1:],
        Sim(poses.rotation[1:], poses.translation[1:], poses.scale[1:]))
    # gjk returns core distance (ball core = center point)
    np.testing.assert_allclose(float(res.distance[0]), 2.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.normal[0]), [1.0, 0.0, 0.0],
                               atol=1e-3)


def test_triangle_aabb_and_segment_aabb():
    tri = ShapeSet.triangles([[[-1.0, 0.0, -1.0], [1.0, 0.0, -1.0],
                               [0.0, 0.5, 1.0]]])
    he = np.asarray(shp.local_aabb_half_extents(tri, 3))[0]
    assert np.all(he >= [1.0, 0.5, 1.0])
    seg = ShapeSet.segments([[-2.0, 0.5, 0.0]], [[1.0, -0.25, 0.0]])
    he_s = np.asarray(shp.local_aabb_half_extents(seg, 3))[0]
    np.testing.assert_allclose(he_s, [2.0, 0.5, 0.0], atol=1e-6)


def _drop_scene(collider: ShapeSet, ball_y: float, r: float = 0.4):
    shapes = ShapeSet.concat(collider,
                             ShapeSet.balls(jnp.asarray([r], jnp.float32)))
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.0, ball_y, 0.0]], jnp.float32)
    poses = Sim(quat.identity((2,)), pos, jnp.ones((2,), jnp.float32))
    mp = _merge(
        cuboid_local_mprops(jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32),
                            dynamic=jnp.zeros(1, bool)),
        ball_local_mprops(jnp.asarray([r], jnp.float32)))
    bodies = Bodies(poses, Velocity.zero(2, 3), mp)
    return new_state(bodies, shapes)


CFG = PipelineConfig(pair_capacity=64, max_colors=4, manifold_points=1)


def test_ball_rests_on_bare_triangle():
    """VERDICT #9 criterion: a bare-triangle scene rests a ball."""
    tri = ShapeSet.triangles([[[-2.0, 0.0, -2.0], [2.0, 0.0, -2.0],
                               [0.0, 0.0, 2.0]]])
    state = _drop_scene(tri, ball_y=0.55)
    params = SimParams()
    for f in range(80):
        state = step(state, params, CFG, warmstart=f > 0)
    tr = np.asarray(state.bodies.poses.translation)
    assert np.isfinite(tr).all()
    # rested at ~r above the triangle plane (soft-constraint tolerance)
    assert abs(tr[1, 1] - 0.4) < 5e-3, tr[1]
    v = np.asarray(state.bodies.vels.linear)[1]
    assert np.linalg.norm(v) < 0.05


def test_ball_rests_on_segment():
    """A ball balanced directly above a horizontal wire stays supported."""
    seg = ShapeSet.segments([[-2.0, 0.0, 0.0]], [[2.0, 0.0, 0.0]])
    state = _drop_scene(seg, ball_y=0.5)
    params = SimParams()
    for f in range(80):
        state = step(state, params, CFG, warmstart=f > 0)
    tr = np.asarray(state.bodies.poses.translation)
    assert np.isfinite(tr).all()
    assert abs(tr[1, 1] - 0.4) < 2e-2, tr[1]  # held by the wire
    assert abs(tr[1, 0]) < 0.5 and abs(tr[1, 2]) < 0.1


def test_triangle_concat_rebases_vertex_ranges():
    t2 = ShapeSet.concat(
        ShapeSet.triangles([[[-1.0, 0, -1], [1.0, 0, -1], [0.0, 0, 1]]]),
        ShapeSet.triangles([[[-1.0, 2, -1], [1.0, 2, -1], [0.0, 2, 1]]]))
    firsts = np.asarray(t2.params[:, 0]).astype(int)
    np.testing.assert_array_equal(firsts, [0, 3])
    assert t2.vertices.shape[0] == 6


def test_vertex_collider_ids_and_world_buffer():
    """≙ GpuBodySet.shapes_vertex_collider_id + shapes_vertex_buffers
    (body.rs:133-135, 293-304): per-vertex owner map over the shared
    buffer and the world-space transformed vertices."""
    import numpy as np

    from wgmath_tpu.geometry import sim as sim_ops
    from wgmath_tpu.shapes import mesh
    from wgmath_tpu.shapes.shape import (
        ShapeSet,
        vertex_collider_ids,
        world_vertex_buffer,
    )

    tri = np.asarray([[0, 1, 2]], np.int32)
    v1 = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    v2 = v1 * 2.0
    s = ShapeSet.concat(
        ShapeSet.balls(jnp.asarray([0.5])),
        mesh.trimesh(v1, tri), mesh.trimesh(v2, tri))
    ids = np.asarray(vertex_collider_ids(s))
    assert ids.tolist() == [1, 1, 1, 2, 2, 2]
    rot = jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (3, 1))
    trans = jnp.asarray([[0.0, 0, 0], [10.0, 0, 0], [0.0, 5, 0]])
    poses = sim_ops.from_parts(rot, trans)
    w = np.asarray(world_vertex_buffer(s, poses))
    np.testing.assert_allclose(w[:3], v1 + np.asarray([10.0, 0, 0]))
    np.testing.assert_allclose(w[3:], v2 + np.asarray([0.0, 5, 0]))
