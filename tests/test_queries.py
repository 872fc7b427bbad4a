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


# --- projection: full shape dispatch (round-3) ---------------------------------
def _surface_samples_cone(hh, r, m=120):
    """Dense sample of a cone's surface (side + base disk), apex +Y."""
    th = np.linspace(0, 2 * np.pi, m, endpoint=False)
    ts = np.linspace(0, 1, m)
    # side: apex (0,hh,0) → base circle
    side = np.stack([
        (t * r * np.cos(a), hh - t * 2 * hh, t * r * np.sin(a))
        for t in ts for a in th])
    disk = np.stack([
        (t * r * np.cos(a), -hh, t * r * np.sin(a))
        for t in ts for a in th])
    return np.concatenate([side, disk]).astype(np.float32)


def _surface_samples_cylinder(hh, r, m=120):
    th = np.linspace(0, 2 * np.pi, m, endpoint=False)
    ts = np.linspace(0, 1, m)
    side = np.stack([(r * np.cos(a), (2 * t - 1) * hh, r * np.sin(a))
                     for t in ts for a in th])
    caps = np.stack([(t * r * np.cos(a), s * hh, t * r * np.sin(a))
                     for t in ts for a in th for s in (-1.0, 1.0)])
    return np.concatenate([side, caps]).astype(np.float32)


def _check_vs_samples(p, got_pt, samples, atol=6e-3):
    """Projected distance must match the dense-sample min distance."""
    got_d = np.linalg.norm(got_pt - p, axis=-1)
    best = np.min(np.linalg.norm(samples[None] - p[:, None], axis=-1), -1)
    np.testing.assert_allclose(got_d, best, atol=atol, rtol=1e-3)


def _inside_cone(p, hh, r):
    frac = (hh - p[:, 1]) / (2 * hh)  # 0 at apex, 1 at base
    return ((p[:, 1] >= -hh) & (p[:, 1] <= hh)
            & (np.hypot(p[:, 0], p[:, 2]) <= frac * r))


def test_project_cone_vs_samples(rng):
    hh, r = 0.8, 0.6
    p = rng.normal(size=(300, 3)).astype(np.float32) * 1.2
    res = proj_q.project_cone(jnp.asarray(p), hh, r, boundary=False)
    inside = _inside_cone(p, hh, r)
    np.testing.assert_array_equal(np.asarray(res.is_inside), inside)
    # solid: outside points hit the surface, inside points stay put
    got = np.asarray(res.point)
    np.testing.assert_allclose(got[inside], p[inside], atol=1e-6)
    samples = _surface_samples_cone(hh, r)
    _check_vs_samples(p[~inside], got[~inside], samples)
    # boundary: every output lies on the surface (min sample distance ~ 0)
    resb = proj_q.project_cone(jnp.asarray(p), hh, r, boundary=True)
    gb = np.asarray(resb.point)
    d_surf = np.min(np.linalg.norm(samples[None] - gb[:, None], axis=-1), -1)
    assert np.max(d_surf) < 2e-2
    # boundary point is the closest surface point (inside rows included)
    _check_vs_samples(p, gb, samples, atol=2e-2)


def test_project_cylinder_vs_samples(rng):
    hh, r = 0.7, 0.5
    p = rng.normal(size=(300, 3)).astype(np.float32) * 1.2
    res = proj_q.project_cylinder(jnp.asarray(p), hh, r, boundary=False)
    inside = (np.abs(p[:, 1]) <= hh) & (np.hypot(p[:, 0], p[:, 2]) <= r)
    np.testing.assert_array_equal(np.asarray(res.is_inside), inside)
    got = np.asarray(res.point)
    np.testing.assert_allclose(got[inside], p[inside], atol=1e-6)
    samples = _surface_samples_cylinder(hh, r)
    _check_vs_samples(p[~inside], got[~inside], samples)
    resb = proj_q.project_cylinder(jnp.asarray(p), hh, r, boundary=True)
    _check_vs_samples(p, np.asarray(resb.point), samples, atol=2e-2)


def test_project_convex_matches_cuboid(rng):
    """A cube-as-convex-polyhedron must project exactly like the cuboid
    closed form (GJK outside, EPA boundary exit inside)."""
    from wgmath_tpu.shapes.mesh import convex_polyhedron

    he = np.asarray([0.6, 0.4, 0.8], np.float32)
    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)], np.float32) * he
    n = 200
    p = rng.normal(size=(n, 3)).astype(np.float32)
    cvx = convex_polyhedron(corners)
    shapes = ShapeSet(
        jnp.tile(cvx.tag, (n,)), jnp.tile(cvx.params, (n, 1)),
        cvx.vertices, cvx.indices, kinds=cvx.kinds)
    poses = _identity_pose(n)

    want = proj_q.project_cuboid(jnp.asarray(p), jnp.asarray(he),
                                 boundary=False)
    got = proj_q.project(shapes, poses, jnp.asarray(p), boundary=False)
    np.testing.assert_array_equal(np.asarray(got.is_inside),
                                  np.asarray(want.is_inside))
    gd = np.linalg.norm(np.asarray(got.point) - p, axis=-1)
    wd = np.linalg.norm(np.asarray(want.point) - p, axis=-1)
    np.testing.assert_allclose(gd, wd, atol=2e-3)

    wantb = proj_q.project_cuboid(jnp.asarray(p), jnp.asarray(he),
                                  boundary=True)
    gotb = proj_q.project(shapes, poses, jnp.asarray(p), boundary=True)
    gdb = np.linalg.norm(np.asarray(gotb.point) - p, axis=-1)
    wdb = np.linalg.norm(np.asarray(wantb.point) - p, axis=-1)
    np.testing.assert_allclose(gdb, wdb, atol=2e-3)


def test_project_trimesh_cube_surface(rng):
    """Trimesh projection == closest point on the cube's boundary."""
    from wgmath_tpu.shapes.mesh import trimesh

    he = 0.5
    v = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                  for sz in (-1, 1)], np.float32) * he
    # 12 triangles of the cube (index into the (sx,sy,sz) lexicographic order)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],  # x faces
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],  # y faces
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],  # z faces
    ], np.int32)
    n = 150
    p = rng.normal(size=(n, 3)).astype(np.float32)
    ts = trimesh(v, f)
    shapes = ShapeSet(jnp.tile(ts.tag, (n,)), jnp.tile(ts.params, (n, 1)),
                      ts.vertices, ts.indices, ts.cluster_min,
                      ts.cluster_max, kinds=ts.kinds)
    got = proj_q.project(shapes, _identity_pose(n), jnp.asarray(p),
                         boundary=True)
    want = proj_q.project_cuboid(jnp.asarray(p),
                                 jnp.full((3,), he, np.float32),
                                 boundary=True)
    gd = np.linalg.norm(np.asarray(got.point) - p, axis=-1)
    wd = np.linalg.norm(np.asarray(want.point) - p, axis=-1)
    np.testing.assert_allclose(gd, wd, atol=1e-4)
    assert not np.any(np.asarray(got.is_inside))  # open-mesh contract


def test_project_segment_triangle_world(rng):
    """World dispatch for standalone SEGMENT / TRIANGLE colliders."""
    n = 64
    a = rng.normal(size=(n, 3)).astype(np.float32)
    b = rng.normal(size=(n, 3)).astype(np.float32)
    p = rng.normal(size=(n, 3)).astype(np.float32) * 2
    segs = ShapeSet.segments(a, b)
    got = proj_q.project(segs, _identity_pose(n), jnp.asarray(p))
    want = proj_q.project_segment(*map(jnp.asarray, (p, a, b)))
    np.testing.assert_allclose(np.asarray(got.point),
                               np.asarray(want.point), atol=1e-5)

    verts = rng.normal(size=(n, 3, 3)).astype(np.float32)
    tris = ShapeSet.triangles(verts)
    got = proj_q.project(tris, _identity_pose(n), jnp.asarray(p))
    want = proj_q.project_triangle(jnp.asarray(p), *(
        jnp.asarray(verts[:, i]) for i in range(3)))
    np.testing.assert_allclose(np.asarray(got.point),
                               np.asarray(want.point), atol=1e-5)


def test_project_world_cone_cylinder_posed(rng):
    """Posed world-space round trip: project through a rotated pose equals
    local projection conjugated by the pose."""
    n = 100
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(n, 3)).astype(np.float32)
    poses = Sim(jnp.asarray(q), jnp.asarray(t), jnp.ones((n,)))
    p = rng.normal(size=(n, 3)).astype(np.float32) * 2

    for maker, local_fn in (
            (ShapeSet.cones, proj_q.project_cone),
            (ShapeSet.cylinders, proj_q.project_cylinder)):
        shapes = maker(np.full(n, 0.7, np.float32),
                       np.full(n, 0.4, np.float32))
        got = proj_q.project(shapes, poses, jnp.asarray(p), boundary=True)
        from wgmath_tpu.geometry import sim as sim_ops
        p_loc = sim_ops.inv_mul_pt(poses, jnp.asarray(p))
        want_loc = local_fn(p_loc, 0.7, 0.4, boundary=True)
        want = sim_ops.mul_pt(poses, want_loc.point)
        np.testing.assert_allclose(np.asarray(got.point), np.asarray(want),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got.is_inside),
                                      np.asarray(want_loc.is_inside))


def test_project_unhandled_kind_raises():
    """Trace-time error instead of a silent wrong answer (round-2 weak #7):
    3D-only tags must raise in a 2D dispatch."""
    n = 4
    params = jnp.zeros((n, 8), jnp.float32).at[:, 0].set(1.0)
    shapes = ShapeSet(jnp.full((n,), 3, jnp.int32), params,  # CONE
                      jnp.zeros((0, 2), jnp.float32),
                      jnp.zeros((0, 2), jnp.int32),
                      kinds=frozenset((3,)))
    rot = jnp.tile(jnp.asarray([0.0, 1.0]), (n, 1))  # rot2 (cos, sin)
    poses = Sim(rot, jnp.zeros((n, 2)), jnp.ones((n,)))
    with pytest.raises(ValueError, match="no projection kernel"):
        proj_q.project(shapes, poses, jnp.zeros((n, 2)))


def test_ray_convex_matches_cuboid(rng):
    """Convex-hull ray cast (over stored hull faces) == cuboid slab cast."""
    from wgmath_tpu.shapes.mesh import convex_polyhedron

    he = np.asarray([0.5, 0.8, 0.3], np.float32)
    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)], np.float32) * he
    n = 256
    cvx = convex_polyhedron(corners)
    shapes = ShapeSet(jnp.tile(cvx.tag, (n,)), jnp.tile(cvx.params, (n, 1)),
                      cvx.vertices, cvx.indices, cvx.cluster_min,
                      cvx.cluster_max, kinds=cvx.kinds)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 4
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    got = np.asarray(ray_q.cast(shapes, _identity_pose(n), jnp.asarray(o),
                                jnp.asarray(d)))
    want = np.asarray(ray_q.ray_cuboid(jnp.asarray(o), jnp.asarray(d),
                                       jnp.asarray(he)))
    both = np.isfinite(got) & np.isfinite(want)
    np.testing.assert_array_equal(np.isfinite(got), np.isfinite(want))
    np.testing.assert_allclose(got[both], want[both], rtol=1e-4, atol=1e-5)


def test_ray_convex_trimesh_concat(rng):
    """Mixed CONVEX + TRIMESH scene: concat rebases both shapes' face
    ranges and the cast dispatch hits each through the shared buffer."""
    from wgmath_tpu.shapes.mesh import convex_polyhedron, trimesh

    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)], np.float32) * 0.5
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    shapes = ShapeSet.concat(convex_polyhedron(corners),
                             trimesh(corners, f))
    n = shapes.num_shapes
    poses = _identity_pose(n, trans=np.asarray([[0, 0, 0], [3, 0, 0]],
                                               np.float32))
    o = np.asarray([[0, 0, 5], [3, 0, 5]], np.float32)
    d = np.tile(np.asarray([[0.0, 0.0, -1.0]], np.float32), (n, 1))
    t = np.asarray(ray_q.cast(shapes, poses, jnp.asarray(o),
                              jnp.asarray(d)))
    np.testing.assert_allclose(t, 4.5, rtol=1e-4)
