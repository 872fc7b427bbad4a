"""Demo scene builders (≙ wgrapier examples2d/3d scene suite:
balls, boxes, boxes_and_balls, pyramid, many_pyramids, primitives —
all_examples3.rs:41-66, pyramid3.rs:36-76).

Each builder returns a ``PhysicsState`` ready for ``pipeline.step``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from wgmath_tpu.dynamics import (
    Bodies,
    Velocity,
    ball_local_mprops,
    cuboid_local_mprops,
)
from wgmath_tpu.dynamics.body import LocalMassProperties
from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.pipeline import PhysicsState, new_state
from wgmath_tpu.shapes import ShapeSet


def _merge_mprops(*mp: LocalMassProperties) -> LocalMassProperties:
    fields = {}
    for f in ("inv_mass", "com", "inertia_ref_frame", "inv_principal_inertia"):
        vals = [getattr(m, f) for m in mp]
        fields[f] = None if vals[0] is None else jnp.concatenate(vals)
    return LocalMassProperties(**fields)


def _with_ground(shapes, translations, mprops, dim=3,
                 ground_he=(100.0, 1.0, 100.0)):
    ground_he = jnp.asarray([ground_he[:dim]], jnp.float32)
    all_shapes = ShapeSet.concat(ShapeSet.cuboids(ground_he), shapes)
    g_trans = jnp.zeros((1, dim), jnp.float32).at[0, 1].set(-float(ground_he[0, 1]))
    trans = jnp.concatenate([g_trans, translations])
    n = trans.shape[0]
    if dim == 3:
        rot = jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (n, 1))
    else:
        rot = jnp.tile(jnp.asarray([1.0, 0.0]), (n, 1))
    poses = sim_ops.from_parts(rot, trans)
    mp = _merge_mprops(
        cuboid_local_mprops(ground_he, dynamic=jnp.asarray([False])), mprops)
    bodies = Bodies(poses, Velocity.zero(n, dim), mp)
    return new_state(bodies, all_shapes)


def balls(n: int = 1000, *, radius: float = 0.5, dim: int = 3,
          seed: int = 0) -> PhysicsState:
    """Grid of falling balls over a ground slab (≙ examples balls3.rs).

    Bodies are laid out in a loose cubic lattice with deterministic jitter so
    the pile settles with many simultaneous contacts.
    """
    rng = np.random.default_rng(seed)
    side = int(np.ceil(n ** (1.0 / dim)))
    coords = np.stack(np.meshgrid(*([np.arange(side)] * dim),
                                  indexing="ij"), -1).reshape(-1, dim)[:n]
    spacing = 2.0 * radius * 1.05
    pos = coords.astype(np.float32) * spacing
    pos -= pos.mean(0, keepdims=True) * np.asarray([1.0, 0.0] + [1.0] * (dim - 2))
    pos[:, 1] += 2.0 * radius
    pos += rng.uniform(-0.05, 0.05, pos.shape).astype(np.float32) * radius
    shapes = ShapeSet.balls(jnp.full((n,), radius), dim=dim)
    mp = ball_local_mprops(jnp.full((n,), radius), dim=dim)
    return _with_ground(shapes, jnp.asarray(pos), mp, dim=dim)


def ball_pit(n: int = 10_000, *, radius: float = 0.5, depth: int = 8,
             seed: int = 0) -> PhysicsState:
    """Lattice of balls dropped into a walled pit (ground + 4 static walls).

    Unlike the open ``balls`` scene — where scattered balls roll across the
    ground forever (spheres have no rolling resistance here, nor in the
    reference) — the pit jams: the pile reaches a quiescent, contact-rich
    steady state, which is the regime benchmark config 5 times. Statics
    (ground, walls) come first per the hub-row convention.
    """
    rng = np.random.default_rng(seed)
    spacing = 2.0 * radius * 1.05
    side = int(np.ceil(np.sqrt(n / depth)))
    coords = np.stack(np.meshgrid(np.arange(side), np.arange(depth),
                                  np.arange(side), indexing="ij"),
                      -1).reshape(-1, 3)[:n]
    pos = coords[:, [0, 1, 2]].astype(np.float32) * spacing
    pos[:, [0, 2]] -= pos[:, [0, 2]].mean(0, keepdims=True)
    pos[:, 1] += 2.0 * radius
    pos += rng.uniform(-0.05, 0.05, pos.shape).astype(np.float32) * radius
    half_w = side * spacing / 2.0 + 2.0 * radius  # inner half-width
    wall_t = 0.5
    wall_h = depth * spacing / 2.0 + 4.0
    wall_he = np.asarray([
        [wall_t, wall_h, half_w + 2 * wall_t],
        [wall_t, wall_h, half_w + 2 * wall_t],
        [half_w + 2 * wall_t, wall_h, wall_t],
        [half_w + 2 * wall_t, wall_h, wall_t],
    ], np.float32)
    wall_pos = np.asarray([
        [half_w + wall_t, wall_h, 0.0],
        [-half_w - wall_t, wall_h, 0.0],
        [0.0, wall_h, half_w + wall_t],
        [0.0, wall_h, -half_w - wall_t],
    ], np.float32)
    shapes = ShapeSet.concat(
        ShapeSet.cuboids(jnp.asarray(wall_he)),
        ShapeSet.balls(jnp.full((n,), radius)),
    )
    mp = _merge_mprops(
        cuboid_local_mprops(jnp.asarray(wall_he),
                            dynamic=jnp.zeros((4,), bool)),
        ball_local_mprops(jnp.full((n,), radius), dim=3),
    )
    trans = jnp.asarray(np.concatenate([wall_pos, pos]), jnp.float32)
    return _with_ground(shapes, trans, mp, dim=3,
                        ground_he=(half_w + 4.0, 1.0, half_w + 4.0))


def boxes(n: int = 1000, *, half_extent: float = 0.5, dim: int = 3,
          seed: int = 0) -> PhysicsState:
    """Grid of falling cuboids (≙ examples boxes3.rs)."""
    rng = np.random.default_rng(seed)
    side = int(np.ceil(n ** (1.0 / dim)))
    coords = np.stack(np.meshgrid(*([np.arange(side)] * dim),
                                  indexing="ij"), -1).reshape(-1, dim)[:n]
    spacing = 2.0 * half_extent * 1.1
    pos = coords.astype(np.float32) * spacing
    pos -= pos.mean(0, keepdims=True) * np.asarray([1.0, 0.0] + [1.0] * (dim - 2))
    pos[:, 1] += 2.0 * half_extent
    pos += rng.uniform(-0.02, 0.02, pos.shape).astype(np.float32)
    he = jnp.full((n, dim), half_extent)
    shapes = ShapeSet.cuboids(he)
    mp = cuboid_local_mprops(he)
    return _with_ground(shapes, jnp.asarray(pos), mp, dim=dim)


def pyramid(levels: int = 20, *, half_extent: float = 0.5,
            use_balls: bool = False) -> PhysicsState:
    """Square pyramid of cuboids (≙ pyramid3.rs:36-76; 50 levels ≈ 42.9k
    bodies is the reference's stress demo)."""
    he = half_extent
    spacing = 2.0 * he * 1.02
    pos = []
    for lvl in range(levels):
        width = levels - lvl
        for i in range(width):
            for j in range(width):
                pos.append([
                    (i - width / 2.0 + 0.5) * spacing,
                    he + lvl * 2.0 * he * 1.01,
                    (j - width / 2.0 + 0.5) * spacing,
                ])
    pos = np.asarray(pos, np.float32)
    n = len(pos)
    if use_balls:
        shapes = ShapeSet.balls(jnp.full((n,), he))
        mp = ball_local_mprops(jnp.full((n,), he))
    else:
        he_arr = jnp.full((n, 3), he)
        shapes = ShapeSet.cuboids(he_arr)
        mp = cuboid_local_mprops(he_arr)
    return _with_ground(shapes, jnp.asarray(pos), mp)


def pyramid_levels_for_bodies(target: int) -> int:
    """Smallest level count whose pyramid has >= target bodies."""
    for lv in range(1, 80):
        if sum((lv - k) ** 2 for k in range(lv)) >= target:
            return lv
    return 80


SCENES = {
    "balls3": lambda: balls(1000, dim=3),
    "boxes3": lambda: boxes(1000, dim=3),
    "pyramid3": lambda: pyramid(20),
    "ball_pyramid3": lambda: pyramid(20, use_balls=True),
    "balls10k": lambda: balls(10_000, dim=3),
    "ball_pit": lambda: ball_pit(10_000),
}


def keva_tower(levels: int = 8, per_level: int = 4) -> PhysicsState:
    """Plank tower with alternating orientations (≙ keva3.rs)."""
    from wgmath_tpu.geometry import quat as quat_ops

    plank = np.asarray([0.9, 0.1, 0.3], np.float32)  # half extents
    pos = []
    rots = []
    q_id = np.asarray([0.0, 0, 0, 1], np.float32)
    q_90 = np.asarray([0.0, np.sin(np.pi / 4), 0, np.cos(np.pi / 4)], np.float32)
    for lvl in range(levels):
        rotated = lvl % 2 == 1
        for i in range(per_level):
            off = (i - (per_level - 1) / 2.0) * 0.7
            y = plank[1] + lvl * 2.02 * plank[1]
            if rotated:
                pos.append([off, y, 0.0])
                rots.append(q_90)
            else:
                pos.append([0.0, y, off])
                rots.append(q_id)
    n = len(pos)
    he = jnp.tile(jnp.asarray(plank), (n, 1))
    shapes = ShapeSet.cuboids(he)
    mp = cuboid_local_mprops(he)
    ground_he = jnp.asarray([[20.0, 1.0, 20.0]], jnp.float32)
    all_shapes = ShapeSet.concat(ShapeSet.cuboids(ground_he), shapes)
    trans = jnp.concatenate([jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32),
                             jnp.asarray(pos, jnp.float32)])
    rot = jnp.concatenate([jnp.asarray([[0.0, 0, 0, 1]], jnp.float32),
                           jnp.asarray(np.stack(rots))])
    poses = sim_ops.from_parts(rot, trans)
    mpg = _merge_mprops(
        cuboid_local_mprops(ground_he, dynamic=jnp.asarray([False])), mp)
    bodies = Bodies(poses, Velocity.zero(n + 1, 3), mpg)
    return new_state(bodies, all_shapes)


def many_pyramids(count: int = 4, levels: int = 10) -> PhysicsState:
    """Grid of pyramids (≙ many_pyramids3.rs)."""
    he = 0.5
    spacing_p = 2.0 * he * 1.02
    pos = []
    grid = int(np.ceil(np.sqrt(count)))
    extent = levels * spacing_p * 1.5
    k = 0
    for gx in range(grid):
        for gz in range(grid):
            if k >= count:
                break
            k += 1
            cx = (gx - (grid - 1) / 2.0) * extent
            cz = (gz - (grid - 1) / 2.0) * extent
            for lvl in range(levels):
                width = levels - lvl
                for i in range(width):
                    for j in range(width):
                        pos.append([
                            cx + (i - width / 2.0 + 0.5) * spacing_p,
                            he + lvl * 2.0 * he * 1.01,
                            cz + (j - width / 2.0 + 0.5) * spacing_p,
                        ])
    pos = np.asarray(pos, np.float32)
    n = len(pos)
    he_arr = jnp.full((n, 3), he)
    shapes = ShapeSet.cuboids(he_arr)
    mp = cuboid_local_mprops(he_arr)
    return _with_ground(shapes, jnp.asarray(pos), mp,
                        ground_he=(200.0, 1.0, 200.0))


def pendulum_chain(links: int = 8, *, joint: str = "spherical") -> PhysicsState:
    """Chain of balls linked by joints hanging from a static anchor
    (≙ joints3.rs ball/revolute joint demos)."""
    from wgmath_tpu.dynamics.joint import revolute_joints, spherical_joints

    n = links + 1
    r = 0.2
    shapes = ShapeSet.balls(jnp.full((n,), r))
    trans = np.zeros((n, 3), np.float32)
    trans[:, 0] = np.arange(n) * 1.0
    poses = sim_ops.from_parts(jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (n, 1)),
                               jnp.asarray(trans))
    dynamic = np.ones(n, bool)
    dynamic[0] = False
    mp = ball_local_mprops(jnp.full((n,), r), dynamic=jnp.asarray(dynamic))
    bodies = Bodies(poses, Velocity.zero(n, 3), mp)
    body_a = list(range(links))
    body_b = list(range(1, links + 1))
    anchors_a = [[1.0, 0.0, 0.0]] * links
    anchors_b = [[-1.0 if False else 0.0, 0.0, 0.0]] * links
    anchors_b = [[0.0, 0.0, 0.0]] * links
    # anchor at midpoint: a's frame at +0.5, b's at −0.5
    anchors_a = [[0.5, 0.0, 0.0]] * links
    anchors_b = [[-0.5, 0.0, 0.0]] * links
    if joint == "revolute":
        joints = revolute_joints(body_a, body_b, anchors_a, anchors_b,
                                 axes=[[0.0, 0.0, 1.0]] * links,
                                 dynamic_mask=dynamic)
    else:
        joints = spherical_joints(body_a, body_b, anchors_a, anchors_b,
                                  dynamic_mask=dynamic)
    return new_state(bodies, shapes, joints)


def trimesh_scene(n_balls: int = 100) -> PhysicsState:
    """Balls raining on a bumpy heightfield (≙ trimesh3.rs)."""
    from wgmath_tpu.shapes.mesh import heightfield

    rng = np.random.default_rng(4)
    hx = 16
    xs = np.linspace(-2 * np.pi, 2 * np.pi, hx)
    hills = (np.sin(xs)[:, None] * np.cos(xs)[None, :]).astype(np.float32)
    mesh = heightfield(hills, 1.0, 1.0)
    r = 0.3
    shapes = ShapeSet.concat(mesh, ShapeSet.balls(jnp.full((n_balls,), r)))
    side = int(np.ceil(np.sqrt(n_balls)))
    coords = np.stack(np.meshgrid(np.arange(side), np.arange(side),
                                  indexing="ij"), -1).reshape(-1, 2)[:n_balls]
    pos = np.zeros((n_balls, 3), np.float32)
    pos[:, [0, 2]] = (coords - side / 2.0) * 2.5 * r
    pos[:, 1] = 3.0 + rng.uniform(0, 2, n_balls)
    trans = jnp.concatenate([jnp.zeros((1, 3), jnp.float32), jnp.asarray(pos)])
    n = n_balls + 1
    poses = sim_ops.from_parts(jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (n, 1)),
                               trans)
    mp = _merge_mprops(
        cuboid_local_mprops(jnp.asarray([[8.0, 1.0, 8.0]]),
                            dynamic=jnp.asarray([False])),
        ball_local_mprops(jnp.full((n_balls,), r)),
    )
    bodies = Bodies(poses, Velocity.zero(n, 3), mp)
    return new_state(bodies, shapes)


def balls2d(n: int = 300) -> PhysicsState:
    return balls(n, dim=2)


SCENES.update({
    "keva3": keva_tower,
    "many_pyramids3": many_pyramids,
    "joint_ball3": lambda: pendulum_chain(8, joint="spherical"),
    "joint_revolute3": lambda: pendulum_chain(8, joint="revolute"),
    "trimesh3": trimesh_scene,
    "balls2": balls2d,
    "pyramid2": lambda: boxes(200, dim=2),
})


def primitives3(per_kind: int = 40) -> PhysicsState:
    """Mixed primitive rain: balls, cuboids, capsules, cylinders, cones
    (≙ primitives3.rs) — exercises every support-mapped narrow-phase path."""
    from wgmath_tpu.dynamics.body import (
        capsule_local_mprops,
        cone_local_mprops,
        cylinder_local_mprops,
    )

    n = per_kind
    r, hh, he = 0.4, 0.3, 0.4
    shapes = ShapeSet.concat(
        ShapeSet.balls(jnp.full((n,), r)),
        ShapeSet.cuboids(jnp.full((n, 3), he)),
        ShapeSet.capsules(jnp.full((n,), hh), jnp.full((n,), r)),
        ShapeSet.cylinders(jnp.full((n,), hh), jnp.full((n,), r)),
        ShapeSet.cones(jnp.full((n,), hh), jnp.full((n,), r)),
    )
    mp = _merge_mprops(
        ball_local_mprops(jnp.full((n,), r)),
        cuboid_local_mprops(jnp.full((n, 3), he)),
        capsule_local_mprops(jnp.full((n,), hh), jnp.full((n,), r)),
        cylinder_local_mprops(jnp.full((n,), hh), jnp.full((n,), r)),
        cone_local_mprops(jnp.full((n,), hh), jnp.full((n,), r)),
    )
    total = 5 * n
    rng = np.random.default_rng(7)
    side = int(np.ceil(total ** (1.0 / 3.0)))
    coords = np.stack(np.meshgrid(*([np.arange(side)] * 3),
                                  indexing="ij"), -1).reshape(-1, 3)[:total]
    pos = coords.astype(np.float32) * 1.4
    pos -= pos.mean(0, keepdims=True) * np.asarray([1.0, 0.0, 1.0])
    pos[:, 1] += 1.5
    pos += rng.uniform(-0.05, 0.05, pos.shape).astype(np.float32)
    return _with_ground(shapes, jnp.asarray(pos), mp)


def boxes_and_balls(n: int = 400, *, dim: int = 3) -> PhysicsState:
    """Alternating boxes and balls (≙ boxes_and_balls{2,3}.rs)."""
    rng = np.random.default_rng(3)
    half = n // 2
    r, he = 0.5, 0.5
    shapes = ShapeSet.concat(
        ShapeSet.balls(jnp.full((half,), r), dim=dim),
        ShapeSet.cuboids(jnp.full((n - half, dim), he)))
    mp = _merge_mprops(
        ball_local_mprops(jnp.full((half,), r), dim=dim),
        cuboid_local_mprops(jnp.full((n - half, dim), he)))
    side = int(np.ceil(n ** (1.0 / dim)))
    coords = np.stack(np.meshgrid(*([np.arange(side)] * dim),
                                  indexing="ij"), -1).reshape(-1, dim)[:n]
    pos = coords.astype(np.float32) * 1.15
    pos -= pos.mean(0, keepdims=True) * np.asarray([1.0, 0.0] + [1.0] * (dim - 2))
    pos[:, 1] += 1.0
    pos += rng.uniform(-0.03, 0.03, pos.shape).astype(np.float32)
    return _with_ground(shapes, jnp.asarray(pos), mp, dim=dim)


def polyline2(n: int = 200) -> PhysicsState:
    """2D balls + boxes raining on a jagged polyline terrain
    (≙ polyline2.rs)."""
    from wgmath_tpu.shapes.mesh import polyline

    rng = np.random.default_rng(11)
    xs = np.linspace(-20.0, 20.0, 41)
    ys = np.sin(xs * 0.6) * 1.5
    terrain = polyline(np.stack([xs, ys], -1).astype(np.float32))
    half = n // 2
    r, he = 0.3, 0.3
    shapes = ShapeSet.concat(
        terrain,
        ShapeSet.balls(jnp.full((half,), r), dim=2),
        ShapeSet.cuboids(jnp.full((n - half, 2), he)))
    pos = np.zeros((n, 2), np.float32)
    pos[:, 0] = rng.uniform(-15, 15, n)
    pos[:, 1] = rng.uniform(4, 14, n)
    trans = jnp.concatenate([jnp.zeros((1, 2), jnp.float32), jnp.asarray(pos)])
    total = n + 1
    poses = sim_ops.from_parts(jnp.tile(jnp.asarray([1.0, 0.0]), (total, 1)),
                               trans)
    mp = _merge_mprops(
        cuboid_local_mprops(jnp.asarray([[20.0, 2.0]]),
                            dynamic=jnp.asarray([False])),
        ball_local_mprops(jnp.full((half,), r), dim=2),
        cuboid_local_mprops(jnp.full((n - half, 2), he)))
    bodies = Bodies(poses, Velocity.zero(total, 2), mp)
    return new_state(bodies, shapes)


def joint_chain(links: int = 8, *, joint: str = "fixed") -> PhysicsState:
    """Chain of balls under fixed or prismatic joints (≙ joints3.rs)."""
    from wgmath_tpu.dynamics.joint import fixed_joints, prismatic_joints

    n = links + 1
    r = 0.2
    shapes = ShapeSet.balls(jnp.full((n,), r))
    trans = np.zeros((n, 3), np.float32)
    trans[:, 0] = np.arange(n) * 1.0
    poses = sim_ops.from_parts(jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (n, 1)),
                               jnp.asarray(trans))
    dynamic = np.ones(n, bool)
    dynamic[0] = False
    mp = ball_local_mprops(jnp.full((n,), r), dynamic=jnp.asarray(dynamic))
    bodies = Bodies(poses, Velocity.zero(n, 3), mp)
    body_a = list(range(links))
    body_b = list(range(1, links + 1))
    anchors_a = [[0.5, 0.0, 0.0]] * links
    anchors_b = [[-0.5, 0.0, 0.0]] * links
    if joint == "prismatic":
        joints = prismatic_joints(body_a, body_b, anchors_a, anchors_b,
                                  axes=[[0.0, 1.0, 0.0]] * links,
                                  limits=(-0.5, 0.5), dynamic_mask=dynamic)
    else:
        joints = fixed_joints(body_a, body_b, anchors_a, anchors_b,
                              dynamic_mask=dynamic)
    return new_state(bodies, shapes, joints)


def capsules2(n: int = 100) -> PhysicsState:
    """2D capsules + balls raining on the ground (2D pfm narrow phase)."""
    from wgmath_tpu.dynamics.body import capsule_local_mprops

    rng = np.random.default_rng(13)
    half = n // 2
    hh, r = 0.3, 0.2
    shapes = ShapeSet.concat(
        ShapeSet.capsules(jnp.full((half,), hh), jnp.full((half,), r), dim=2),
        ShapeSet.balls(jnp.full((n - half,), r), dim=2))
    mp = _merge_mprops(
        capsule_local_mprops(jnp.full((half,), hh), jnp.full((half,), r),
                             dim=2),
        ball_local_mprops(jnp.full((n - half,), r), dim=2))
    pos = np.zeros((n, 2), np.float32)
    pos[:, 0] = rng.uniform(-8, 8, n)
    pos[:, 1] = rng.uniform(1.5, 10, n)
    return _with_ground(shapes, jnp.asarray(pos), mp, dim=2,
                        ground_he=(12.0, 1.0))


def joint_net2(nk: int = 12, ni: int = 12, *, joint: str = "revolute"
               ) -> PhysicsState:
    """2D net of balls linked by revolute or fixed joints
    (≙ joint_ball2.rs:22-57 / joint_fixed2.rs:28-61, scaled down).

    ``revolute``: the top row's outer fifths are static (the reference's
    hanging-net anchors). ``fixed``: the left column is static and the net
    cantilevers off it.
    """
    from wgmath_tpu.dynamics.joint import fixed_joints, revolute_joints

    shift = 1.0
    r = 0.4
    n = nk * ni
    idx = lambda k, i: k * ni + i  # noqa: E731 - grid index
    pos = np.zeros((n, 2), np.float32)
    dynamic = np.ones(n, bool)
    body_a, body_b, anch_a, anch_b = [], [], [], []
    for k in range(nk):
        for i in range(ni):
            pos[idx(k, i)] = (k * shift, -i * shift)
            if joint == "revolute":
                if i == 0 and (k < nk // 5 or k >= (4 * nk) // 5):
                    dynamic[idx(k, i)] = False
            elif k == 0:
                dynamic[idx(k, i)] = False
            if i > 0:  # vertical link: pivot at the parent's center
                body_a.append(idx(k, i - 1))
                body_b.append(idx(k, i))
                anch_a.append([0.0, 0.0])
                anch_b.append([0.0, shift])
            if k > 0:  # horizontal link
                body_a.append(idx(k - 1, i))
                body_b.append(idx(k, i))
                anch_a.append([0.0, 0.0])
                anch_b.append([-shift, 0.0])
    shapes = ShapeSet.balls(jnp.full((n,), r), dim=2)
    poses = sim_ops.from_parts(jnp.tile(jnp.asarray([1.0, 0.0]), (n, 1)),
                               jnp.asarray(pos))
    mp = ball_local_mprops(jnp.full((n,), r), dim=2,
                           dynamic=jnp.asarray(dynamic))
    bodies = Bodies(poses, Velocity.zero(n, 2), mp)
    if joint == "revolute":
        joints = revolute_joints(body_a, body_b, anch_a, anch_b, dim=2,
                                 dynamic_mask=dynamic)
    else:
        joints = fixed_joints(body_a, body_b, anch_a, anch_b, dim=2,
                              dynamic_mask=dynamic)
    return new_state(bodies, shapes, joints)


def ball_net3(nk: int = 100, ni: int = 100, *, radius: float = 0.25,
              spacing: float = 0.6, height: float = 8.0) -> PhysicsState:
    """Large 3D net: an ``nk x ni`` grid of balls joined to their 4-neighbors
    by spherical joints, draping over a big static ball onto the ground
    (joints-at-scale stress — the 3D analog of joint_ball2.rs's hanging net,
    sized to the reference's 10k-body benchmark regime).

    ~2·nk·ni joint constraints solve inside the same substep loop as the
    contacts (≙ solver.rs:238-460 + joint.rs:368-460); the drape produces
    sustained ball-ground, ball-dome, and net self-contacts. Statics
    (ground, dome) come first per the hub-row convention.
    """
    from wgmath_tpu.dynamics.joint import spherical_joints

    n = nk * ni
    idx = lambda k, i: k * ni + i  # noqa: E731 - grid index
    pos = np.zeros((n, 3), np.float32)
    ks, is_ = np.meshgrid(np.arange(nk), np.arange(ni), indexing="ij")
    pos[:, 0] = (ks.reshape(-1) - (nk - 1) / 2.0) * spacing
    pos[:, 2] = (is_.reshape(-1) - (ni - 1) / 2.0) * spacing
    pos[:, 1] = height
    h = spacing / 2.0
    body_a, body_b, anch_a, anch_b = [], [], [], []
    for k in range(nk):
        for i in range(ni):
            if k > 0:  # link along x, anchored at the midpoint
                body_a.append(idx(k - 1, i))
                body_b.append(idx(k, i))
                anch_a.append([h, 0.0, 0.0])
                anch_b.append([-h, 0.0, 0.0])
            if i > 0:  # link along z
                body_a.append(idx(k, i - 1))
                body_b.append(idx(k, i))
                anch_a.append([0.0, 0.0, h])
                anch_b.append([0.0, 0.0, -h])
    dome_r = 5.0
    shapes = ShapeSet.concat(
        ShapeSet.balls(jnp.asarray([dome_r])),
        ShapeSet.balls(jnp.full((n,), radius)),
    )
    mp = _merge_mprops(
        ball_local_mprops(jnp.asarray([dome_r]),
                          dynamic=jnp.zeros((1,), bool)),
        ball_local_mprops(jnp.full((n,), radius)),
    )
    trans = jnp.asarray(
        np.concatenate([np.asarray([[0.0, 1.0, 0.0]], np.float32), pos]))
    base = _with_ground(shapes, trans, mp, dim=3)
    n_static = 2  # ground + dome precede the net in body order
    dynamic = np.concatenate([np.zeros(n_static, bool), np.ones(n, bool)])
    joints = spherical_joints([b + n_static for b in body_a],
                              [b + n_static for b in body_b],
                              anch_a, anch_b, dynamic_mask=dynamic)
    return new_state(base.bodies, base.shapes, joints)


def joint_prismatic2(chains: int = 4, num: int = 6) -> PhysicsState:
    """2D prismatic chains: boxes sliding on alternating diagonal axes with
    ±1.5 travel limits under a static head box (≙ joint_prismatic2.rs:20-52,
    scaled down)."""
    from wgmath_tpu.dynamics.joint import prismatic_joints

    shift = 1.0
    he = 0.4
    per = num + 1
    n = chains * per
    pos = np.zeros((n, 2), np.float32)
    dynamic = np.ones(n, bool)
    body_a, body_b, anch_a, anch_b, axes = [], [], [], [], []
    for c in range(chains):
        x = c * shift * 4.0
        head = c * per
        pos[head] = (x, 0.0)
        dynamic[head] = False
        for i in range(num):
            pos[head + 1 + i] = (x, -(i + 1) * shift)
            body_a.append(head + i)
            body_b.append(head + 1 + i)
            anch_a.append([0.0, 0.0])
            anch_b.append([0.0, shift])
            s = 2.0 ** -0.5
            axes.append([s, s] if i % 2 == 0 else [-s, s])
    shapes = ShapeSet.cuboids(jnp.full((n, 2), he))
    poses = sim_ops.from_parts(jnp.tile(jnp.asarray([1.0, 0.0]), (n, 1)),
                               jnp.asarray(pos))
    mp = cuboid_local_mprops(jnp.full((n, 2), he),
                             dynamic=jnp.asarray(dynamic))
    bodies = Bodies(poses, Velocity.zero(n, 2), mp)
    joints = prismatic_joints(body_a, body_b, anch_a, anch_b, axes,
                              limits=(-1.5, 1.5), dim=2,
                              dynamic_mask=dynamic)
    return new_state(bodies, shapes, joints)


def conveyor(n_balls: int = 48, *, speed: float = 1.0,
             radius: float = 0.4) -> PhysicsState:
    """Kinematic moving platform (one-way coupling, ≙ BodyCoupling::OneWay,
    body.rs:169-192) dragging a grid of dynamic balls.

    Body 0 is a static ground slab, body 1 the kinematic platform: zero
    inverse mass (the solve never deflects it) with a prescribed +x velocity
    that enters every contact's relative-velocity term — friction spins the
    resting balls up toward belt speed while the platform's pose integrates
    at exactly ``speed``·t. Statics/kinematics come first per the hub-row
    convention (broad-phase rows emit pairs toward lower indices)."""
    plat_he = jnp.asarray([[6.0, 0.25, 4.0]], jnp.float32)
    ground_he = jnp.asarray([[40.0, 1.0, 40.0]], jnp.float32)
    side = int(np.ceil(np.sqrt(n_balls)))
    xs, zs = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    grid = np.stack([xs, zs], -1).reshape(-1, 2)[:n_balls]
    spacing = 2.0 * radius * 1.1
    pos = np.zeros((n_balls, 3), np.float32)
    pos[:, [0, 2]] = (grid - grid.mean(0, keepdims=True)) * spacing
    # rest the balls ~on the belt surface (platform top at y = 1.5)
    pos[:, 1] = 1.5 + radius * 1.02
    shapes = ShapeSet.concat(
        ShapeSet.cuboids(jnp.concatenate([ground_he, plat_he])),
        ShapeSet.balls(jnp.full((n_balls,), radius)))
    trans = jnp.concatenate([
        jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.25, 0.0]], jnp.float32),
        jnp.asarray(pos)])
    n = n_balls + 2
    poses = sim_ops.from_parts(
        jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (n, 1)), trans)
    mp = _merge_mprops(
        cuboid_local_mprops(jnp.concatenate([ground_he, plat_he]),
                            dynamic=jnp.asarray([False, False])),
        ball_local_mprops(jnp.full((n_balls,), radius)))
    vels = Velocity.zero(n, 3)
    vels = Velocity(vels.linear.at[1, 0].set(speed), vels.angular)
    kin = jnp.zeros((n,), bool).at[1].set(True)
    bodies = Bodies(poses, vels, mp, kin)
    return new_state(bodies, shapes)


SCENES.update({
    "conveyor3": conveyor,
    "capsules2": capsules2,
    "primitives3": primitives3,
    "boxes_and_balls3": lambda: boxes_and_balls(400, dim=3),
    "boxes_and_balls2": lambda: boxes_and_balls(200, dim=2),
    "polyline2": polyline2,
    "joint_fixed3": lambda: joint_chain(8, joint="fixed"),
    "joint_prismatic3": lambda: joint_chain(6, joint="prismatic"),
    "joint_ball2": lambda: joint_net2(12, 12, joint="revolute"),
    "joint_fixed2": lambda: joint_net2(8, 8, joint="fixed"),
    "joint_prismatic2": joint_prismatic2,
    # joints-at-scale drape (10k bodies + ~19.8k joints at full size; the
    # testbed entry uses a CPU-friendly size — scripts/run_jointed10k.py
    # runs the full-scale version on device)
    "ball_net3": lambda: ball_net3(16, 16),
})
