"""Multi-point PFM manifolds (queries/pfm_manifold.py) vs geometric oracles.

≙ contact_pfm_pfm.wgsl contact_manifold_pfm_pfm + polygonal_feature.wgsl:
support-face extraction + contact-plane clipping for support-mapped pairs.
"""

import numpy as np
import jax.numpy as jnp

from wgmath_tpu.geometry import quat, sim as sim_ops
from wgmath_tpu.queries.gjk import pfm_contact
from wgmath_tpu.queries.pfm_manifold import pfm_manifold, support_face
from wgmath_tpu.shapes import shape as shp


def _pose(t, q=None):
    n = len(t)
    if q is None:
        q = [[0.0, 0.0, 0.0, 1.0]] * n
    return sim_ops.from_parts(jnp.asarray(q, jnp.float32),
                              jnp.asarray(t, jnp.float32))


def _qz(angle):
    """xyzw quaternion for a rotation about +z."""
    return [0.0, 0.0, float(np.sin(angle / 2)), float(np.cos(angle / 2))]


S2 = float(np.sqrt(0.5))


def _manifold(tag_a, par_a, pose_a, tag_b, par_b, pose_b, pred=0.01):
    ta = jnp.asarray([tag_a], jnp.int32)
    tb = jnp.asarray([tag_b], jnp.int32)
    pa = jnp.zeros((1, shp.NUM_PARAMS), jnp.float32).at[0, :len(par_a)].set(
        jnp.asarray(par_a, jnp.float32))
    pb = jnp.zeros((1, shp.NUM_PARAMS), jnp.float32).at[0, :len(par_b)].set(
        jnp.asarray(par_b, jnp.float32))
    n_p, p_p, d_p = pfm_contact(ta, pa, pose_a, tb, pb, pose_b)
    pts, dist, num = pfm_manifold(ta, pa, pose_a, tb, pb, pose_b,
                                  n_p, p_p, d_p, pred)
    return (np.asarray(n_p[0]), np.asarray(pts[0]), np.asarray(dist[0]),
            int(num[0]), float(d_p[0]))


def test_capsule_on_floor_two_points():
    """Horizontal capsule (axis along world x) resting 0.05 deep on a big
    cuboid floor: the parallel edge-face clip must span the segment."""
    # capsule local axis is +y; rotate y→x via -90° about z
    pose_cap = _pose([[0.0, 0.20, 0.0]], [_qz(-np.pi / 2)])
    pose_floor = _pose([[0.0, -0.5, 0.0]])
    n_a, pts, dist, num, d_gjk = _manifold(
        shp.CAPSULE, [1.0, 0.25], pose_cap,
        shp.CUBOID, [5.0, 0.5, 5.0], pose_floor)
    assert num >= 2, num
    live = dist < 1e8
    assert np.count_nonzero(live) == num
    np.testing.assert_allclose(dist[live], -0.05, atol=1e-3)
    # world x-extent of the contact points must span the capsule length
    # (A-local: the axis is +y before the pose rotation)
    ys = np.sort(pts[live][:, 1])
    assert ys[0] < -0.9 and ys[-1] > 0.9, ys
    # points on A's surface: radius distance from the axis
    rr = np.linalg.norm(pts[live][:, [0, 2]], axis=-1)
    np.testing.assert_allclose(rr, 0.25, atol=1e-3)


def test_cylinder_cap_on_floor_four_points():
    """Upright cylinder resting 0.02 deep: 4-point square cap manifold."""
    pose_cyl = _pose([[0.0, 0.48, 0.0]])
    pose_floor = _pose([[0.0, -0.5, 0.0]])
    n_a, pts, dist, num, _ = _manifold(
        shp.CYLINDER, [0.5, 0.4], pose_cyl,
        shp.CUBOID, [5.0, 0.5, 5.0], pose_floor)
    assert num == 4, num
    live = dist < 1e8
    np.testing.assert_allclose(dist[live], -0.02, atol=2e-3)
    # cap corners at radius 0.4 in the xz plane, y = -0.5 (local bottom)
    p = pts[live]
    assert np.all(p[:, 1] < -0.45)
    rad = np.linalg.norm(p[:, [0, 2]], axis=-1)
    assert np.count_nonzero(rad > 0.35) >= 3, rad


def test_parallel_capsules_two_points():
    """Two parallel horizontal capsules stacked: conformal edge-edge clip."""
    q = _qz(np.pi / 2)
    pose_lo = _pose([[0.0, 0.0, 0.0]], [q])
    pose_hi = _pose([[0.0, 0.45, 0.0]], [q])  # 2r = 0.5 → 0.05 deep
    n_a, pts, dist, num, _ = _manifold(
        shp.CAPSULE, [1.0, 0.25], pose_hi,
        shp.CAPSULE, [1.0, 0.25], pose_lo)
    assert num >= 2, num
    live = dist < 1e8
    np.testing.assert_allclose(np.sort(dist[live])[:2], -0.05, atol=1e-3)


def test_crossed_capsules_single_point():
    """Perpendicular crossed capsules: one contact point (+ the appended
    GJK witness at most)."""
    pose_lo = _pose([[0.0, 0.0, 0.0]], [_qz(np.pi / 2)])  # axis → x
    pose_hi = _pose([[0.0, 0.45, 0.0]])  # axis stays +y? no: cross axis
    # rotate hi's axis onto world z: +90° about x
    qx = [float(np.sin(np.pi / 4)), 0.0, 0.0, float(np.cos(np.pi / 4))]
    pose_hi = _pose([[0.0, 0.45, 0.0]], [qx])
    n_a, pts, dist, num, d_gjk = _manifold(
        shp.CAPSULE, [1.0, 0.25], pose_hi,
        shp.CAPSULE, [1.0, 0.25], pose_lo)
    assert 1 <= num <= 2, num
    assert abs(d_gjk + 0.05) < 1e-3, d_gjk


def test_support_face_shapes():
    d_up = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    d_side = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)

    def par(vals):
        return jnp.zeros((1, shp.NUM_PARAMS), jnp.float32).at[
            0, :len(vals)].set(jnp.asarray(vals, jnp.float32))

    # cuboid: top face, 4 verts at y=+he_y
    v, nv = support_face(jnp.asarray([shp.CUBOID]), par([0.5, 1.0, 2.0]),
                         d_up)
    assert int(nv[0]) == 4
    np.testing.assert_allclose(np.asarray(v[0, :, 1]), 1.0)

    # capsule: always the core segment
    v, nv = support_face(jnp.asarray([shp.CAPSULE]), par([0.7, 0.2]), d_side)
    assert int(nv[0]) == 2
    np.testing.assert_allclose(np.sort(np.asarray(v[0, :2, 1])), [-0.7, 0.7])

    # cylinder: side segment for lateral dir, 4-vert cap for axial
    v, nv = support_face(jnp.asarray([shp.CYLINDER]), par([0.6, 0.3]),
                         d_side)
    assert int(nv[0]) == 2
    np.testing.assert_allclose(np.asarray(v[0, :2, 0]), 0.3, atol=1e-6)
    v, nv = support_face(jnp.asarray([shp.CYLINDER]), par([0.6, 0.3]), d_up)
    assert int(nv[0]) == 4
    np.testing.assert_allclose(np.asarray(v[0, :, 1]), 0.6)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(v[0, :, [0, 2]]), axis=0), 0.3, atol=1e-6)

    # cone: slant segment upward (rim → apex), base square downward
    v, nv = support_face(jnp.asarray([shp.CONE]), par([0.5, 0.4]), d_up)
    assert int(nv[0]) == 2
    v, nv = support_face(jnp.asarray([shp.CONE]), par([0.5, 0.4]),
                         -d_up)
    assert int(nv[0]) == 4
    np.testing.assert_allclose(np.asarray(v[0, :, 1]), -0.5)


def test_convex_support_face_uses_hull_faces():
    from wgmath_tpu.shapes.mesh import convex_polyhedron

    he = np.array([0.5, 0.25, 1.0])
    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)], np.float32) * he
    ss = convex_polyhedron(corners)
    d_up = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    v, nv = support_face(ss.tag, ss.params, d_up,
                         vertices=ss.vertices, indices=ss.indices)
    assert int(nv[0]) == 3  # hull triangle of the top face
    np.testing.assert_allclose(np.asarray(v[0, :3, 1]), 0.25, atol=1e-6)


def test_capsule_rests_without_rocking():
    """Integration: a dynamic capsule dropped on the ground settles flat
    and stays (multi-point manifold prevents the single-point rocking
    mode). VERDICT round-2 'done' criterion for PFM manifolds."""
    from wgmath_tpu.dynamics import SimParams
    from wgmath_tpu.dynamics.body import capsule_local_mprops
    from wgmath_tpu.pipeline import (
        PipelineConfig,
        auto_manifold_points,
        new_state,
        step_checked,
    )
    from wgmath_tpu.dynamics.body import Bodies, Velocity
    from wgmath_tpu.shapes.shape import ShapeSet

    ground = ShapeSet.cuboids(jnp.asarray([[10.0, 0.5, 10.0]]))
    cap = ShapeSet.capsules(jnp.asarray([0.8]), jnp.asarray([0.25]))
    shapes = ShapeSet.concat(ground, cap)
    q_cap = jnp.asarray([_qz(-np.pi / 2)], jnp.float32)
    q = jnp.concatenate([jnp.asarray([[0.0, 0.0, 0.0, 1.0]]), q_cap])
    t = jnp.asarray([[0.0, -0.5, 0.0], [0.0, 0.40, 0.0]], jnp.float32)
    poses = sim_ops.from_parts(q, t)
    from wgmath_tpu.scenes.builders import _merge_mprops
    from wgmath_tpu.dynamics.body import cuboid_local_mprops

    mp = _merge_mprops(
        cuboid_local_mprops(jnp.asarray([[10.0, 0.5, 10.0]]),
                            dynamic=jnp.asarray([False])),
        capsule_local_mprops(jnp.asarray([0.8]), jnp.asarray([0.25])))
    bodies = Bodies(poses, Velocity(jnp.zeros((2, 3)), jnp.zeros((2, 3))),
                    mp)
    state = new_state(bodies, shapes)
    params = SimParams()
    p_max = auto_manifold_points(shapes, 3,
                                 dynamic=np.asarray(bodies.is_dynamic()))
    assert p_max == 4  # the PFM-aware width rule
    config = PipelineConfig(pair_capacity=64, contact_capacity=32,
                            pfm_pair_capacity=16, max_colors=4,
                            manifold_points=p_max)
    for _ in range(90):
        state, config = step_checked(state, params, config)
    ang = np.asarray(state.bodies.vels.angular[1])
    lin = np.asarray(state.bodies.vels.linear[1])
    assert np.linalg.norm(ang) < 0.05, ang
    assert np.linalg.norm(lin) < 0.05, lin
    # still lying horizontally at capsule-radius height
    y = float(state.bodies.poses.translation[1, 1])
    assert abs(y - 0.25) < 0.02, y
    # axis still horizontal: local +y maps to ~world xz plane
    axis_w = quat.mul_vec(state.bodies.poses.rotation[1],
                          jnp.asarray([0.0, 1.0, 0.0]))
    assert abs(float(axis_w[1])) < 0.05, np.asarray(axis_w)
