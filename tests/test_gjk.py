"""GJK distance tests vs analytic/NumPy oracles (≙ wgparry gjk.wgsl tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wgmath_tpu.geometry import quat
from wgmath_tpu.geometry.sim import Sim
from wgmath_tpu.queries.gjk import gjk_distance, pfm_contact
from wgmath_tpu.shapes import shape as shp


def _pose(trans, rot=None):
    trans = jnp.asarray(trans, jnp.float32)
    n = trans.shape[0]
    if rot is None:
        rot = jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (n, 1))
    return Sim(jnp.asarray(rot), trans, jnp.ones((n,)))


def _params(**kw):
    p = np.zeros((kw.pop("n"), 8), np.float32)
    for i, v in kw.items():
        p[:, int(i[1:])] = v
    return jnp.asarray(p)


def test_gjk_ball_ball(rng=np.random.default_rng(5)):
    n = 200
    ca = rng.normal(size=(n, 3)).astype(np.float32) * 3
    cb = rng.normal(size=(n, 3)).astype(np.float32) * 3
    ra = rng.uniform(0.2, 1.0, n).astype(np.float32)
    rb = rng.uniform(0.2, 1.0, n).astype(np.float32)
    tag = jnp.full((n,), shp.BALL, jnp.int32)
    pa = jnp.zeros((n, 8)).at[:, 0].set(ra)
    pb = jnp.zeros((n, 8)).at[:, 0].set(rb)
    normal, pt_a, dist = pfm_contact(tag, pa, _pose(ca), tag, pb, _pose(cb))
    want = np.linalg.norm(cb - ca, axis=-1) - ra - rb
    sep = want > 0.05
    np.testing.assert_allclose(np.asarray(dist)[sep], want[sep],
                               rtol=1e-3, atol=1e-3)


def test_gjk_cuboid_cuboid_axis_aligned():
    # two unit boxes 3 apart on x → distance 2
    tag = jnp.full((2,), shp.CUBOID, jnp.int32)
    par = jnp.zeros((2, 8)).at[:, :3].set(0.5)
    pose_a = _pose([[0.0, 0, 0], [0.0, 0, 0]])
    pose_b = _pose([[3.0, 0, 0], [0.0, 3.0, 0]])
    res = gjk_distance(tag, par, pose_a, tag, par, pose_b)
    np.testing.assert_allclose(np.asarray(res.distance), 2.0, rtol=1e-4)
    np.testing.assert_allclose(np.abs(np.asarray(res.normal[0])), [1, 0, 0],
                               atol=1e-4)


def test_gjk_capsule_capsule_vs_segment_oracle(rng=np.random.default_rng(9)):
    n = 100
    # random capsule poses; oracle: segment-segment distance − radii
    ca = rng.normal(size=(n, 3)).astype(np.float32) * 2
    cb = rng.normal(size=(n, 3)).astype(np.float32) * 2
    qa = rng.normal(size=(n, 4)).astype(np.float32)
    qa /= np.linalg.norm(qa, -1, keepdims=True)
    qb = rng.normal(size=(n, 4)).astype(np.float32)
    qb /= np.linalg.norm(qb, -1, keepdims=True)
    hh, r = 0.7, 0.2
    tag = jnp.full((n,), shp.CAPSULE, jnp.int32)
    par = jnp.zeros((n, 8)).at[:, 0].set(hh).at[:, 1].set(r)
    normal, pt_a, dist = pfm_contact(tag, par, _pose(ca, qa),
                                     tag, par, _pose(cb, qb))

    def rot(q, v):
        import numpy as _np

        u, w = q[:, :3], q[:, 3:4]
        return v + 2 * (w * _np.cross(u, v) + _np.cross(u, _np.cross(u, v)))

    y = np.asarray([[0.0, hh, 0.0]], np.float32)
    a0, a1 = ca - rot(qa, y), ca + rot(qa, y)
    b0, b1 = cb - rot(qb, y), cb + rot(qb, y)

    # dense-sample segment-segment distance oracle
    ts = np.linspace(0, 1, 60, dtype=np.float32)
    pa_s = a0[:, None] + (a1 - a0)[:, None] * ts[None, :, None]
    pb_s = b0[:, None] + (b1 - b0)[:, None] * ts[None, :, None]
    d2 = np.linalg.norm(pa_s[:, :, None] - pb_s[:, None, :], axis=-1)
    oracle = d2.min(axis=(1, 2)) - 2 * r
    sep = oracle > 0.05
    np.testing.assert_allclose(np.asarray(dist)[sep], oracle[sep],
                               rtol=2e-2, atol=5e-3)


def test_gjk_ball_cuboid_vs_projection():
    # ball at distance from a rotated box: dist = |proj(center) − center| − r
    q = quat.from_scaled_axis(jnp.asarray([[0.3, 0.5, -0.2]]))
    tag_a = jnp.full((1,), shp.BALL, jnp.int32)
    tag_b = jnp.full((1,), shp.CUBOID, jnp.int32)
    pa = jnp.zeros((1, 8)).at[:, 0].set(0.25)
    pb = jnp.zeros((1, 8)).at[:, :3].set(jnp.asarray([0.5, 0.7, 0.3]))
    center = jnp.asarray([[2.0, 1.5, -1.0]])
    pose_a = _pose(center)
    pose_b = Sim(q, jnp.zeros((1, 3)), jnp.ones((1,)))
    _, _, dist = pfm_contact(tag_a, pa, pose_a, tag_b, pb, pose_b)

    from wgmath_tpu.queries.projection import project_cuboid
    from wgmath_tpu.geometry import sim as sim_ops

    c_local = sim_ops.inv_mul_pt(pose_b, center)
    res = project_cuboid(c_local, jnp.asarray([[0.5, 0.7, 0.3]]), boundary=False)
    want = float(jnp.linalg.norm(res.point - c_local)) - 0.25
    np.testing.assert_allclose(float(dist[0]), want, rtol=1e-3, atol=1e-3)


def test_gjk_intersecting_flag():
    tag = jnp.full((1,), shp.CUBOID, jnp.int32)
    par = jnp.zeros((1, 8)).at[:, :3].set(0.5)
    res = gjk_distance(tag, par, _pose([[0.0, 0, 0]]),
                       tag, par, _pose([[0.3, 0.2, 0.1]]))
    assert bool(res.intersecting[0])
    assert float(res.distance[0]) == 0.0


def test_epa_box_box_depth():
    from wgmath_tpu.queries.epa import epa_penetration

    tag = jnp.full((3,), shp.CUBOID, jnp.int32)
    par = jnp.zeros((3, 8)).at[:, :3].set(0.5)
    r_ab = jnp.broadcast_to(jnp.eye(3), (3, 3, 3))
    t_ab = jnp.asarray([[0.0, 0.9, 0.0], [0.6, 0.0, 0.0], [0.0, 0.0, -0.85]])
    n, depth, pa = epa_penetration(tag, par, tag, par, r_ab, t_ab)
    np.testing.assert_allclose(np.asarray(depth), [0.1, 0.4, 0.15], atol=1e-4)
    np.testing.assert_allclose(np.abs(np.asarray(n)),
                               [[0, 1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-4)
    # normal points A→B
    assert float(n[0, 1]) > 0 and float(n[1, 0]) > 0 and float(n[2, 2]) < 0


def test_pfm_contact_deep_capsules():
    """Two crossed capsules with intersecting cores: EPA supplies the depth."""
    tag = jnp.full((1,), shp.CAPSULE, jnp.int32)
    par = jnp.zeros((1, 8)).at[:, 0].set(0.5).at[:, 1].set(0.2)
    pose_a = _pose([[0.0, 0.0, 0.0]])
    # B rotated 90° about z (axis → x), centers 0.1 apart on x: cores cross
    q = quat.from_scaled_axis(jnp.asarray([[0.0, 0.0, np.pi / 2]]))
    pose_b = Sim(q, jnp.asarray([[0.1, 0.0, 0.0]]), jnp.ones((1,)))
    normal, pt_a, dist = pfm_contact(tag, par, pose_a, tag, par, pose_b)
    # segments (y-axis vs x-axis lines) intersect → core depth ≥ 0, total
    # penetration ≈ core_depth + 2r ≥ 0.4
    assert float(dist[0]) < -0.35, float(dist[0])
    assert np.isfinite(np.asarray(normal)).all()


def test_gjk_convex_polyhedron_support():
    """Convex hull (a tetra) vs ball distance via vertex-range support."""
    from wgmath_tpu.shapes.mesh import convex_polyhedron
    from wgmath_tpu.shapes import ShapeSet

    tetra = convex_polyhedron(np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32))
    ball = ShapeSet.balls(jnp.asarray([0.25]))
    combined = ShapeSet.concat(tetra, ball)
    res_d = gjk_distance(
        combined.tag[0:1], combined.params[0:1], _pose([[0.0, 0, 0]]),
        combined.tag[1:2], combined.params[1:2], _pose([[3.0, 0, 0]]),
        vertices=combined.vertices)
    # closest hull point to x=3 is the vertex (1,0,0) → core distance 2
    np.testing.assert_allclose(float(res_d.distance[0]), 2.0, rtol=1e-4)


def test_epa2_matches_support_sweep_oracle():
    """2D EPA (polygon expansion) vs brute force: penetration depth of an
    origin-interior CSO is min over directions of the support value —
    sampled at 16k angles for segment-segment (deep crossed capsule cores)."""
    import numpy as np

    from wgmath_tpu.queries.epa import epa2_penetration
    from wgmath_tpu.queries.gjk import cso_support
    from wgmath_tpu.shapes import shape as shp

    rng = np.random.default_rng(11)
    m = 32
    # capsule cores = segments along local x with half-length par[0]
    hl_a = rng.uniform(0.4, 1.2, m).astype(np.float32)
    hl_b = rng.uniform(0.4, 1.2, m).astype(np.float32)
    ang = rng.uniform(0.4, np.pi - 0.4, m).astype(np.float32)  # crossed
    off = rng.uniform(-0.2, 0.2, (m, 2)).astype(np.float32)

    tag = jnp.full((m,), shp.CAPSULE, jnp.int32)
    par_a = jnp.zeros((m, 4), jnp.float32).at[:, 0].set(jnp.asarray(hl_a))
    par_b = jnp.zeros((m, 4), jnp.float32).at[:, 0].set(jnp.asarray(hl_b))
    c, s = np.cos(ang), np.sin(ang)
    r_ab = np.zeros((m, 3, 3), np.float32)
    r_ab[:, 0, 0] = c; r_ab[:, 0, 1] = -s
    r_ab[:, 1, 0] = s; r_ab[:, 1, 1] = c
    r_ab[:, 2, 2] = 1.0
    t_ab = np.concatenate([off, np.zeros((m, 1), np.float32)], -1)

    n, depth, point_a = epa2_penetration(tag, par_a, tag, par_b,
                                         jnp.asarray(r_ab),
                                         jnp.asarray(t_ab))
    n = np.asarray(n); depth = np.asarray(depth)

    # oracle: h(theta) = support of the CSO along (cos, sin, 0); depth =
    # min_theta h (valid because the origin is interior for crossed
    # segments through near-zero offset)
    th = np.linspace(0, 2 * np.pi, 16384, endpoint=False)
    dirs = np.stack([np.cos(th), np.sin(th), np.zeros_like(th)],
                    -1).astype(np.float32)
    for i in range(0, m, 8):  # spot-check a subset (oracle is expensive)
        d_all = jnp.asarray(np.broadcast_to(dirs[:, None], dirs.shape[:1] + (1, 3)).reshape(-1, 3))
        k = d_all.shape[0]
        sup = cso_support(jnp.full((k,), shp.CAPSULE, jnp.int32),
                          jnp.broadcast_to(par_a[i], (k, 4)),
                          jnp.full((k,), shp.CAPSULE, jnp.int32),
                          jnp.broadcast_to(par_b[i], (k, 4)),
                          jnp.broadcast_to(jnp.asarray(r_ab[i]), (k, 3, 3)),
                          jnp.broadcast_to(jnp.asarray(t_ab[i]), (k, 3)),
                          d_all)
        h = np.asarray(jnp.sum(sup.w * d_all, -1))
        want_depth = h.min()
        want_dir = dirs[h.argmin()]
        if want_depth < 1e-3:
            continue  # grazing case: direction ill-conditioned
        assert abs(depth[i] - want_depth) < 2e-3 + 0.02 * want_depth, \
            (i, depth[i], want_depth)
        assert np.dot(n[i], want_dir) > 0.98, (i, n[i], want_dir)


def test_epa3_thin_cso_deep_capsules():
    """3D EPA on crossed deep capsule cores (thin CSO — the octahedron seed
    collapses and the polytope starts without the origin inside): depth and
    direction must match a spherical support sweep."""
    import numpy as np

    from wgmath_tpu.queries.epa import epa_penetration
    from wgmath_tpu.queries.gjk import cso_support
    from wgmath_tpu.shapes import shape as shp

    rng = np.random.default_rng(4)
    m = 8
    hl_a = rng.uniform(0.5, 1.2, m).astype(np.float32)
    hl_b = rng.uniform(0.5, 1.2, m).astype(np.float32)
    tag = jnp.full((m,), shp.CAPSULE, jnp.int32)
    par_a = jnp.zeros((m, 4), jnp.float32).at[:, 0].set(jnp.asarray(hl_a))
    par_b = jnp.zeros((m, 4), jnp.float32).at[:, 0].set(jnp.asarray(hl_b))
    r_ab = np.zeros((m, 3, 3), np.float32)
    for i in range(m):
        # rotate B's axis well away from A's, small random offset
        ax = rng.normal(size=3); ax /= np.linalg.norm(ax)
        th = rng.uniform(0.5, 2.6)
        K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                      [-ax[1], ax[0], 0]])
        r_ab[i] = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
    t_ab = (rng.uniform(-0.1, 0.1, (m, 3))).astype(np.float32)

    n, depth, _ = epa_penetration(tag, par_a, tag, par_b,
                                  jnp.asarray(r_ab), jnp.asarray(t_ab))
    n = np.asarray(n); depth = np.asarray(depth)

    # fibonacci-sphere support sweep oracle
    k = 8192
    g = (1 + 5 ** 0.5) / 2
    u = (np.arange(k) + 0.5) / k
    phi = 2 * np.pi * np.arange(k) / g
    z = 1 - 2 * u
    r_ = np.sqrt(np.maximum(1 - z * z, 0))
    dirs = np.stack([r_ * np.cos(phi), r_ * np.sin(phi), z],
                    -1).astype(np.float32)
    for i in range(m):
        kk = dirs.shape[0]
        sup = cso_support(jnp.full((kk,), shp.CAPSULE, jnp.int32),
                          jnp.broadcast_to(par_a[i], (kk, 4)),
                          jnp.full((kk,), shp.CAPSULE, jnp.int32),
                          jnp.broadcast_to(par_b[i], (kk, 4)),
                          jnp.broadcast_to(jnp.asarray(r_ab[i]), (kk, 3, 3)),
                          jnp.broadcast_to(jnp.asarray(t_ab[i]), (kk, 3)),
                          jnp.asarray(dirs))
        h = np.asarray(jnp.sum(sup.w * jnp.asarray(dirs), -1))
        want = h.min()
        if want < 5e-2:
            # flat/near-flat CSO (crossed segment cores): the slab rescue
            # keeps the answer a certified upper bound on the true depth.
            # Some of these random-t cases put the origin OUTSIDE the flat
            # CSO (negative oracle min) — out of EPA's contract (GJK routes
            # only intersecting pairs); depth clamps at 0 there. No
            # direction check here; the in-contract flat case is
            # test_epa3_flat_cso_crossed_segments.
            assert depth[i] <= max(want, 0.0) + 5e-3, (i, depth[i], want)
            continue
        assert abs(depth[i] - want) < 5e-3 + 0.1 * want, (i, depth[i], want)
        assert np.dot(n[i], dirs[h.argmin()]) > 0.9, (i, n[i])


def test_epa3_flat_cso_crossed_segments():
    """Zero-dilation crossed segment cores (round-1 VERDICT item 6): the
    CSO is a flat parallelogram through the origin, the octahedron seed is
    coplanar, and pre-fix EPA returned an in-plane garbage direction. The
    slab rescue must answer with the out-of-plane normal and ~zero depth,
    at zero dilation radius (nothing shields the degeneracy)."""
    import numpy as np

    from wgmath_tpu.queries.epa import epa_penetration
    from wgmath_tpu.shapes import shape as shp

    def rot_z(th):
        c, s = np.cos(th), np.sin(th)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    def rot_axis(ax, th):
        ax = np.asarray(ax, np.float64); ax /= np.linalg.norm(ax)
        K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                      [-ax[1], ax[0], 0]])
        return (np.eye(3) + np.sin(th) * K
                + (1 - np.cos(th)) * K @ K).astype(np.float32)

    # case 0/1: X-crossing in the z=0 plane (B's axis at 90 and 60 deg);
    # case 2: the same crossing tilted off-axis (plane normal not an axis)
    r_list = [rot_z(np.pi / 2), rot_z(np.pi / 3),
              rot_axis([1.0, 0.5, 0.3], 0.9) @ rot_z(np.pi / 2)]
    # expected plane normal = a_axis x b_axis_world (B rotated, A fixed)
    m = len(r_list)
    tag = jnp.full((m,), shp.CAPSULE, jnp.int32)
    par = jnp.zeros((m, 4), jnp.float32).at[:, 0].set(1.0)  # hl=1, radius=0
    r_ab = jnp.asarray(np.stack(r_list))
    t_ab = jnp.zeros((m, 3), jnp.float32)

    n, depth, _ = epa_penetration(tag, par, tag, par, r_ab, t_ab)
    n = np.asarray(n); depth = np.asarray(depth)
    a_axis = np.array([0.0, 1.0, 0])  # capsule cores run along local Y
    for i in range(m):
        b_axis = np.asarray(r_list[i]) @ a_axis
        expect = np.cross(a_axis, b_axis)
        expect /= np.linalg.norm(expect)
        assert depth[i] < 1e-4, (i, depth[i])
        assert abs(np.dot(n[i], expect)) > 0.99, (i, n[i], expect)
