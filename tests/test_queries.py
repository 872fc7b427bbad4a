"""Query-layer golden tests (≙ wgparry's test_point_projection harness +
per-shape ray tests, projection.rs:60-118): NumPy oracles for ray casts,
point projection, and the SAT box-box manifold."""

import jax.numpy as jnp
import numpy as np
import pytest

from wgmath_tpu.geometry import quat
from wgmath_tpu.geometry.sim import Sim
from wgmath_tpu.queries import ray as ray_q
from wgmath_tpu.queries import projection as proj_q
from wgmath_tpu.queries.sat import cuboid_cuboid_manifold
from wgmath_tpu.shapes import ShapeSet


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def _identity_pose(n, trans=None):
    rot = jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (n, 1))
    t = jnp.zeros((n, 3)) if trans is None else jnp.asarray(trans)
    return Sim(rot, t, jnp.ones((n,)))


# --- rays ---------------------------------------------------------------------
def test_ray_ball_vs_numpy(rng):
    n = 1000
    o = rng.normal(size=(n, 3)).astype(np.float32) * 3
    d = rng.normal(size=(n, 3)).astype(np.float32)
    r = 1.0
    got = np.asarray(ray_q.ray_ball(jnp.asarray(o), jnp.asarray(d), r))
    a = np.sum(d * d, -1)
    b = np.sum(o * d, -1)
    c = np.sum(o * o, -1) - r * r
    disc = b * b - a * c
    t = np.where(disc >= 0, (-b - np.sqrt(np.maximum(disc, 0))) / a, np.inf)
    t = np.where(c <= 0, 0.0, t)
    t = np.where(t < 0, np.inf, t)
    finite = np.isfinite(t)
    assert np.array_equal(finite, np.isfinite(got))
    np.testing.assert_allclose(got[finite], t[finite], rtol=1e-4, atol=1e-5)


def test_ray_cuboid_oracle(rng):
    n = 1000
    o = rng.normal(size=(n, 3)).astype(np.float32) * 4
    d = rng.normal(size=(n, 3)).astype(np.float32)
    he = np.asarray([1.0, 0.5, 2.0], np.float32)
    got = np.asarray(ray_q.ray_cuboid(jnp.asarray(o), jnp.asarray(d),
                                      jnp.asarray(he)))
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (-he - o) / d
        t2 = (he - o) / d
    tmin = np.nanmax(np.minimum(t1, t2), axis=-1)
    tmax = np.nanmin(np.maximum(t1, t2), axis=-1)
    hit = tmax >= np.maximum(tmin, 0)
    t = np.where(hit, np.where(tmin < 0, 0.0, tmin), np.inf)
    finite = np.isfinite(t)
    assert np.mean(finite == np.isfinite(got)) > 0.999  # axis-parallel edge cases
    both = finite & np.isfinite(got)
    np.testing.assert_allclose(got[both], t[both], rtol=1e-4, atol=1e-5)


def test_ray_capsule_cylinder_cone_axis_hits():
    o = jnp.asarray([[0.0, 0.0, 5.0]] * 3)
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 3)
    t_cap = ray_q.ray_capsule(o, d, 1.0, 0.5)
    t_cyl = ray_q.ray_cylinder(o, d, 1.0, 0.5)
    np.testing.assert_allclose(np.asarray(t_cap), 4.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t_cyl), 4.5, rtol=1e-5)
    # cone: ray at y=0 hits surface where radius(0) = r/2 = 0.25
    t_cone = ray_q.ray_cone(o, d, 1.0, 0.5)
    np.testing.assert_allclose(np.asarray(t_cone), 5.0 - 0.25, rtol=1e-4)
    # top-down onto the caps
    o2 = jnp.asarray([[0.0, 5.0, 0.0]])
    d2 = jnp.asarray([[0.0, -1.0, 0.0]])
    np.testing.assert_allclose(float(ray_q.ray_capsule(o2, d2, 1.0, 0.5)[0]),
                               3.5, rtol=1e-5)
    np.testing.assert_allclose(float(ray_q.ray_cylinder(o2, d2, 1.0, 0.5)[0]),
                               4.0, rtol=1e-5)
    # inside → 0
    o3 = jnp.zeros((1, 3))
    assert float(ray_q.ray_capsule(o3, d2, 1.0, 0.5)[0]) == 0.0
    assert float(ray_q.ray_cylinder(o3, d2, 1.0, 0.5)[0]) == 0.0
    assert float(ray_q.ray_cone(o3, d2, 1.0, 0.5)[0]) == 0.0


def test_ray_triangle(rng):
    n = 500
    va = rng.normal(size=(n, 3)).astype(np.float32)
    vb = rng.normal(size=(n, 3)).astype(np.float32)
    vc = rng.normal(size=(n, 3)).astype(np.float32)
    # shoot at the centroid from a random origin
    centroid = (va + vb + vc) / 3
    o = rng.normal(size=(n, 3)).astype(np.float32) * 5
    d = centroid - o
    t = np.asarray(ray_q.ray_triangle(*map(jnp.asarray, (o, d, va, vb, vc))))
    np.testing.assert_allclose(t, 1.0, rtol=1e-3, atol=1e-4)
    # miss: shoot away
    t2 = np.asarray(ray_q.ray_triangle(*map(jnp.asarray, (o, -d, va, vb, vc))))
    assert np.all(np.isinf(t2))


def test_ray_cast_world_space(rng):
    n = 256
    shapes = ShapeSet.balls(jnp.full((n,), 0.5))
    centers = rng.normal(size=(n, 3)).astype(np.float32) * 2
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    poses = Sim(jnp.asarray(q), jnp.asarray(centers), jnp.ones((n,)))
    o = centers + np.asarray([0.0, 0.0, 3.0], np.float32)
    d = np.tile(np.asarray([[0.0, 0.0, -1.0]], np.float32), (n, 1))
    t = np.asarray(ray_q.cast(shapes, poses, jnp.asarray(o), jnp.asarray(d)))
    np.testing.assert_allclose(t, 2.5, rtol=1e-4)


# --- projection ---------------------------------------------------------------
def test_project_ball_cuboid(rng):
    n = 500
    p = rng.normal(size=(n, 3)).astype(np.float32) * 2
    res = proj_q.project_ball(jnp.asarray(p), 1.0, boundary=False)
    d = np.linalg.norm(p, axis=-1)
    inside = d <= 1.0
    np.testing.assert_array_equal(np.asarray(res.is_inside), inside)
    want = np.where(inside[:, None], p, p / np.maximum(d, 1e-30)[:, None])
    np.testing.assert_allclose(np.asarray(res.point), want, rtol=1e-4, atol=1e-5)

    he = np.asarray([1.0, 0.5, 2.0], np.float32)
    res = proj_q.project_cuboid(jnp.asarray(p), jnp.asarray(he), boundary=False)
    want = np.clip(p, -he, he)
    inside = np.all(np.abs(p) <= he, axis=-1)
    got = np.asarray(res.point)
    np.testing.assert_allclose(got[~inside], want[~inside], rtol=1e-5)
    np.testing.assert_allclose(got[inside], p[inside], rtol=1e-5)
    # boundary variant: all points end up on the surface
    resb = proj_q.project_cuboid(jnp.asarray(p), jnp.asarray(he), boundary=True)
    gb = np.asarray(resb.point)
    on_face = np.any(np.isclose(np.abs(gb), he, atol=1e-5), axis=-1)
    assert np.all(on_face)


def test_project_capsule_triangle(rng):
    n = 400
    p = rng.normal(size=(n, 3)).astype(np.float32) * 2
    res = proj_q.project_capsule(jnp.asarray(p), 1.0, 0.5, boundary=False)
    seg = np.stack([np.zeros(n), np.clip(p[:, 1], -1, 1), np.zeros(n)], -1)
    d = np.linalg.norm(p - seg, axis=-1)
    inside = d <= 0.5
    np.testing.assert_array_equal(np.asarray(res.is_inside), inside)
    out = ~inside
    want = seg + (p - seg) / np.maximum(d, 1e-30)[:, None] * 0.5
    np.testing.assert_allclose(np.asarray(res.point)[out], want[out],
                               rtol=1e-4, atol=1e-5)

    # triangle vs dense-sample oracle
    va, vb, vc = (rng.normal(size=(n, 3)).astype(np.float32) for _ in range(3))
    res = proj_q.project_triangle(*map(jnp.asarray, (p, va, vb, vc)))
    got_d = np.linalg.norm(np.asarray(res.point) - p, axis=-1)
    u = np.linspace(0, 1, 40)
    best = np.full(n, np.inf, np.float32)
    for a in u:
        for b in u:
            if a + b > 1:
                continue
            q = va + a * (vb - va) + b * (vc - va)
            best = np.minimum(best, np.linalg.norm(q - p, axis=-1))
    assert np.all(got_d <= best + 5e-3)


# --- SAT box-box ---------------------------------------------------------------
def test_sat_face_contact_stacked():
    # unit boxes stacked with 0.1 overlap → face contact, 4 points, dist −0.1
    pose_a = _identity_pose(1)
    pose_b = _identity_pose(1, [[0.0, 0.9, 0.0]])
    he = jnp.asarray([[0.5, 0.5, 0.5]])
    n, pts, dist, num = cuboid_cuboid_manifold(pose_a, pose_b, he, he, 0.002)
    assert int(num[0]) == 4
    np.testing.assert_allclose(np.asarray(n[0]), [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(dist[0, :4]), -0.1, atol=1e-5)
    p = np.asarray(pts[0])
    # clipped incident face corners at x,z = ±0.5, y = bottom face of B (0.4)
    assert np.all(np.abs(p[:, 0]) <= 0.5 + 1e-4)
    assert np.all(np.abs(p[:, 2]) <= 0.5 + 1e-4)


def test_sat_separated_no_contact():
    pose_a = _identity_pose(1)
    pose_b = _identity_pose(1, [[0.0, 2.0, 0.0]])
    he = jnp.asarray([[0.5, 0.5, 0.5]])
    _, _, _, num = cuboid_cuboid_manifold(pose_a, pose_b, he, he, 0.002)
    assert int(num[0]) == 0


def test_sat_offset_overlap_region():
    # B shifted diagonally: clipped manifold stays in the overlap rectangle
    pose_a = _identity_pose(1)
    pose_b = _identity_pose(1, [[0.6, 0.95, 0.3]])
    he = jnp.asarray([[0.5, 0.5, 0.5]])
    n, pts, dist, num = cuboid_cuboid_manifold(pose_a, pose_b, he, he, 0.002)
    assert int(num[0]) >= 1
    np.testing.assert_allclose(np.asarray(n[0]), [0, 1, 0], atol=1e-4)
    p = np.asarray(pts[0])[: int(num[0])]
    assert np.all(p[:, 0] >= 0.1 - 1e-3) and np.all(p[:, 0] <= 0.5 + 1e-3)
    assert np.all(p[:, 2] >= -0.2 - 1e-3) and np.all(p[:, 2] <= 0.5 + 1e-3)


def test_sat_rotated_edge_contact():
    # B rotated 45° about z resting a corner edge on A's top face → still
    # produces a contact with upward normal
    q45 = quat.from_scaled_axis(jnp.asarray([[0.0, 0.0, np.pi / 4]]))
    pose_a = _identity_pose(1)
    he = jnp.asarray([[0.5, 0.5, 0.5]])
    hb = 0.5 * np.sqrt(2)
    pose_b = Sim(q45, jnp.asarray([[0.0, 0.5 + hb - 0.05, 0.0]]), jnp.ones((1,)))
    n, pts, dist, num = cuboid_cuboid_manifold(pose_a, pose_b, he, he, 0.002)
    assert int(num[0]) >= 1
    assert float(n[0, 1]) > 0.9
    assert float(jnp.min(dist[0, : int(num[0])])) < -0.02


def test_ray_trimesh_heightfield():
    from wgmath_tpu.shapes.mesh import heightfield

    mesh = heightfield(np.zeros((5, 5), np.float32), 1.0, 1.0)
    n = 16
    xs = np.linspace(-1.5, 1.5, n).astype(np.float32)
    o = np.stack([xs, np.full(n, 3.0, np.float32), xs * 0.5], -1)
    d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (n, 1))
    poses = _identity_pose(1)
    # broadcast the single mesh collider across all rays
    shapes_b = ShapeSet(
        jnp.repeat(mesh.tag, n), jnp.repeat(mesh.params, n, axis=0),
        mesh.vertices, mesh.indices, kinds=mesh.kinds)
    poses_b = _identity_pose(n)
    t = np.asarray(ray_q.cast(shapes_b, poses_b, jnp.asarray(o), jnp.asarray(d)))
    np.testing.assert_allclose(t, 3.0, rtol=1e-4)  # flat field at y=0
    # miss: rays outside the grid
    o2 = o + np.asarray([10.0, 0.0, 0.0], np.float32)
    t2 = np.asarray(ray_q.cast(shapes_b, poses_b, jnp.asarray(o2), jnp.asarray(d)))
    assert np.all(np.isinf(t2))
