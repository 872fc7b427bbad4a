"""End-to-end physics tests: the TPU analog of the reference's oracle testing
(CPU rapier backend + visual demos, SURVEY §4): free-fall integration vs
closed form, resting contact, stacking stability, momentum conservation,
broad-phase vs O(n²) NumPy oracle, coloring/CSR invariants."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgmath_tpu.broad_phase import find_pairs
from wgmath_tpu.dynamics import (
    Bodies,
    SimParams,
    Velocity,
    ball_local_mprops,
    build_body_constraint_csr,
    color_constraints,
    cuboid_local_mprops,
    update_mprops,
)
from wgmath_tpu.dynamics.body import LocalMassProperties
from wgmath_tpu.dynamics.constraint import Contacts, build_constraints
from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.pipeline import PipelineConfig, new_state, step, step_checked
from wgmath_tpu.shapes import ShapeSet, world_aabbs


def _merge_mprops(*mp):
    out = {}
    for f in ("inv_mass", "com", "inertia_ref_frame", "inv_principal_inertia"):
        vals = [getattr(m, f) for m in mp]
        out[f] = None if vals[0] is None else jnp.concatenate(vals)
    return LocalMassProperties(**out)


def _ball_on_ground_world(ball_z=1.5, radius=0.5, n_extra=0):
    """Static ground cuboid at z∈[-1, 0] + dynamic ball(s) above it."""
    n = 2 + n_extra
    shapes = ShapeSet.concat(
        ShapeSet.cuboids(jnp.asarray([[50.0, 1.0, 50.0]])),
        ShapeSet.balls(jnp.full((1 + n_extra,), radius)),
    )
    trans = [[0.0, -1.0, 0.0], [0.0, ball_z, 0.0]]
    for i in range(n_extra):
        trans.append([0.0, ball_z + (i + 1) * 2 * radius * 1.01, 0.0])
    poses = sim_ops.from_parts(
        jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (n, 1)),
        jnp.asarray(trans, jnp.float32),
    )
    mp = _merge_mprops(
        cuboid_local_mprops(jnp.asarray([[50.0, 1.0, 50.0]]),
                            dynamic=jnp.asarray([False])),
        ball_local_mprops(jnp.full((1 + n_extra,), radius), dim=3),
    )
    bodies = Bodies(poses, Velocity.zero(n, 3), mp)
    return new_state(bodies, shapes)


CFG = PipelineConfig(pair_capacity=64, max_colors=8, max_per_body=16,
                     broad_phase_block=64)


def test_free_fall_matches_closed_form():
    params = SimParams()
    n = 1
    shapes = ShapeSet.balls(jnp.asarray([0.5]))
    poses = sim_ops.from_parts(jnp.asarray([[0.0, 0, 0, 1]]),
                               jnp.asarray([[0.0, 10.0, 0.0]]))
    bodies = Bodies(poses, Velocity.zero(n, 3), ball_local_mprops(jnp.asarray([0.5])))
    state = new_state(bodies, shapes)
    nsteps = 30
    for _ in range(nsteps):
        state, _ = step_checked(state, params, CFG)
    # discrete reference: 4 substeps/frame of semi-implicit Euler
    dt_s = params.dt / params.num_solver_iterations
    v, z = 0.0, 10.0
    for _ in range(nsteps * params.num_solver_iterations):
        v += -9.81 * dt_s
        z += v * dt_s
    got_z = float(state.bodies.poses.translation[0, 1])
    got_v = float(state.bodies.vels.linear[0, 1])
    assert abs(got_z - z) < 1e-3, (got_z, z)
    assert abs(got_v - v) < 1e-4


def test_ball_rests_on_ground():
    params = SimParams()
    state = _ball_on_ground_world(ball_z=1.0)
    cfg = CFG
    for _ in range(120):
        state, cfg = step_checked(state, params, cfg)
    z = float(state.bodies.poses.translation[1, 1])
    vz = float(state.bodies.vels.linear[1, 1])
    # resting height = ground top (0) + radius (0.5), small tolerance for the
    # soft-constraint allowed penetration
    assert abs(z - 0.5) < 0.02, z
    assert abs(vz) < 0.05, vz


@pytest.mark.parametrize("use_jacobi", [False, True])
def test_ball_stack_stable(use_jacobi):
    params = SimParams.jacobi() if use_jacobi else SimParams()
    state = _ball_on_ground_world(ball_z=0.5, n_extra=2)
    cfg = dataclasses.replace(CFG, use_jacobi=use_jacobi)
    for _ in range(150):
        state, cfg = step_checked(state, params, cfg)
    z = np.asarray(state.bodies.poses.translation[:, 1])
    # stack: 0.5, ~1.5, ~2.5 (±penetration tolerance)
    assert abs(z[1] - 0.5) < 0.05, z
    assert abs(z[2] - 1.5) < 0.1, z
    assert abs(z[3] - 2.5) < 0.15, z
    v = np.asarray(state.bodies.vels.linear)
    assert np.max(np.abs(v[1:])) < 0.2, v


def test_head_on_collision_conserves_momentum():
    params = SimParams(gravity=(0.0, 0.0, 0.0))
    shapes = ShapeSet.balls(jnp.asarray([0.5, 0.5]))
    poses = sim_ops.from_parts(
        jnp.asarray([[0.0, 0, 0, 1], [0.0, 0, 0, 1]]),
        jnp.asarray([[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]),
    )
    vels = Velocity(jnp.asarray([[2.0, 0, 0], [-2.0, 0, 0]], jnp.float32),
                    jnp.zeros((2, 3), jnp.float32))
    bodies = Bodies(poses, vels, ball_local_mprops(jnp.asarray([0.5, 0.5])))
    state = new_state(bodies, shapes)
    cfg = CFG
    for _ in range(40):
        state, cfg = step_checked(state, params, cfg)
    v = np.asarray(state.bodies.vels.linear)
    # restitution 0, equal masses: momentum conserved (≈0), both nearly stopped
    assert abs(v[:, 0].sum()) < 1e-3
    assert np.all(np.abs(v[:, 0]) < 0.15), v


def test_broad_phase_vs_numpy_oracle():
    rng = np.random.default_rng(3)
    n = 300
    centers = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    he = rng.uniform(0.1, 0.8, size=(n, 3)).astype(np.float32)
    mins, maxs = centers - he, centers + he
    pl = find_pairs(jnp.asarray(mins), jnp.asarray(maxs), capacity=8192)
    got = {(int(a), int(b)) for a, b, v in
           zip(np.asarray(pl.body_a), np.asarray(pl.body_b), np.asarray(pl.valid)) if v}
    want = set()
    for i in range(n):
        overlap = np.all((mins[i] <= maxs) & (mins <= maxs[i]), axis=-1)
        for j in np.nonzero(overlap)[0]:
            if i < j:
                want.add((i, int(j)))
    assert got == want
    assert int(pl.count) == len(want)


def test_broad_phase_overflow_reports_count():
    mins = jnp.zeros((64, 3), jnp.float32)
    maxs = jnp.ones((64, 3), jnp.float32)
    pl = find_pairs(mins, maxs, capacity=16)
    assert int(pl.count) == 64 * 63 // 2
    assert int(jnp.sum(pl.valid)) == 16


def _contacts_chain(n_bodies, n_contacts):
    """Chain contacts: (0,1), (1,2), ... for coloring/CSR tests."""
    c = n_contacts
    body_a = jnp.arange(c, dtype=jnp.int32)
    body_b = body_a + 1
    return Contacts(
        body_a, body_b,
        jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (c, 1)),
        jnp.zeros((c, 4, 3), jnp.float32),
        jnp.zeros((c, 4), jnp.float32),
        jnp.ones((c,), jnp.int32),
        jnp.ones((c,), bool),
    )


def test_coloring_and_csr_invariants():
    n = 17
    contacts = _contacts_chain(n, n - 1)
    poses = sim_ops.identity((n,), dim=3)
    bodies = Bodies(poses, Velocity.zero(n, 3),
                    ball_local_mprops(jnp.ones(n)))
    mprops = update_mprops(poses, bodies.local_mprops)
    params = SimParams()
    cons = build_constraints(poses, bodies.vels, mprops, contacts, params)
    colors = np.asarray(color_constraints(cons, n, max_colors=8))
    assert np.all(colors >= 1)
    # same-color constraints share no body
    for c in np.unique(colors):
        sel = colors == c
        ids = np.concatenate([np.asarray(cons.body_a)[sel],
                              np.asarray(cons.body_b)[sel]])
        assert len(ids) == len(set(ids.tolist())), f"color {c} conflict"
    # a chain is 2-colorable; claim-based coloring should stay small
    assert colors.max() <= 6

    entries, offsets, counts = (np.asarray(x) for x in
                                build_body_constraint_csr(cons, n))
    assert counts.sum() == 2 * (n - 1)
    for b in range(n):
        for k in range(counts[b]):
            v = entries[offsets[b] + k]
            cid, side = v >> 1, v & 1
            assert (np.asarray(cons.body_a)[cid] == b if side == 0
                    else np.asarray(cons.body_b)[cid] == b)


def test_box_stack_stable():
    """Three cuboids stacked on the ground stay put (SAT manifold path)."""
    from wgmath_tpu.scenes.builders import _merge_mprops as _mm  # reuse

    params = SimParams()
    he = jnp.asarray([[0.5, 0.5, 0.5]] * 3)
    shapes = ShapeSet.concat(
        ShapeSet.cuboids(jnp.asarray([[20.0, 1.0, 20.0]])),
        ShapeSet.cuboids(he),
    )
    trans = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 0.5, 0.0],
                         [0.0, 1.52, 0.0], [0.0, 2.54, 0.0]], jnp.float32)
    poses = sim_ops.from_parts(jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (4, 1)), trans)
    mp = _mm(
        cuboid_local_mprops(jnp.asarray([[20.0, 1.0, 20.0]]),
                            dynamic=jnp.asarray([False])),
        cuboid_local_mprops(he),
    )
    bodies = Bodies(poses, Velocity.zero(4, 3), mp)
    state = new_state(bodies, shapes)
    cfg = CFG
    for _ in range(120):
        state, cfg = step_checked(state, params, cfg)
    z = np.asarray(state.bodies.poses.translation[:, 1])
    assert abs(z[1] - 0.5) < 0.05, z
    assert abs(z[2] - 1.5) < 0.08, z
    assert abs(z[3] - 2.5) < 0.12, z
    v = np.asarray(state.bodies.vels.linear)
    assert np.max(np.abs(v[1:])) < 0.2, v
    # boxes should not have toppled
    q = np.asarray(state.bodies.poses.rotation[1:])
    assert np.all(np.abs(q[:, :3]) < 0.1), q


def test_2d_pipeline_ball_and_box_rest():
    """2D end-to-end: a ball and a box resting on a 2D ground slab
    (≙ the reference's wgrapier2d build + examples2d suite)."""
    params = SimParams()
    shapes = ShapeSet.concat(
        ShapeSet.cuboids(jnp.asarray([[50.0, 1.0]])),
        ShapeSet.balls(jnp.asarray([0.5]), dim=2),
        ShapeSet.cuboids(jnp.asarray([[0.5, 0.5]])),
    )
    trans = jnp.asarray([[0.0, -1.0], [-2.0, 1.0], [2.0, 1.0]], jnp.float32)
    rot = jnp.tile(jnp.asarray([1.0, 0.0]), (3, 1))
    poses = sim_ops.from_parts(rot, trans)
    mp = _merge_mprops(
        cuboid_local_mprops(jnp.asarray([[50.0, 1.0]]),
                            dynamic=jnp.asarray([False])),
        ball_local_mprops(jnp.asarray([0.5]), dim=2),
        cuboid_local_mprops(jnp.asarray([[0.5, 0.5]])),
    )
    bodies = Bodies(poses, Velocity.zero(3, 2), mp)
    state = new_state(bodies, shapes)
    cfg = CFG
    for _ in range(120):
        state, cfg = step_checked(state, params, cfg)
    y = np.asarray(state.bodies.poses.translation[:, 1])
    assert abs(y[1] - 0.5) < 0.03, y  # ball rests at radius height
    assert abs(y[2] - 0.5) < 0.03, y  # box rests at half-extent height
    v = np.asarray(state.bodies.vels.linear)
    assert np.max(np.abs(v[1:])) < 0.1, v


def test_trimesh_heightfield_balls_rest():
    """Balls dropped on a pyramid-shaped heightfield trimesh come to rest on
    its surface (≙ the reference's trimesh3 demo)."""
    from wgmath_tpu.shapes.mesh import heightfield

    params = SimParams()
    hf = np.zeros((9, 9), np.float32)  # flat 8x8-cell grid, spacing 1
    mesh = heightfield(hf, 1.0, 1.0)
    shapes = ShapeSet.concat(mesh, ShapeSet.balls(jnp.asarray([0.4, 0.4])))
    trans = jnp.asarray([[0.0, 0.0, 0.0], [-1.0, 1.0, 0.5], [1.3, 1.4, -0.7]],
                        jnp.float32)
    poses = sim_ops.from_parts(jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (3, 1)),
                               trans)
    mp = _merge_mprops(
        cuboid_local_mprops(jnp.asarray([[4.5, 0.1, 4.5]]),
                            dynamic=jnp.asarray([False])),
        ball_local_mprops(jnp.asarray([0.4, 0.4])),
    )
    bodies = Bodies(poses, Velocity.zero(3, 3), mp)
    state = new_state(bodies, shapes)
    cfg = dataclasses.replace(CFG, mesh_pair_capacity=16, mesh_k_best=4)
    for _ in range(120):
        state, cfg = step_checked(state, params, cfg)
    y = np.asarray(state.bodies.poses.translation[1:, 1])
    np.testing.assert_allclose(y, 0.4, atol=0.03)
    v = np.asarray(state.bodies.vels.linear[1:])
    assert np.max(np.abs(v)) < 0.1, v


def test_multi_step_matches_stepwise():
    from wgmath_tpu.pipeline import multi_step

    params = SimParams()
    state = _ball_on_ground_world(ball_z=1.0)
    cfg = CFG
    # warm: one step to materialize prev_constraints
    s1 = step(state, params, cfg, warmstart=False)
    a = multi_step(s1, params, cfg, 5)
    b = s1
    for _ in range(5):
        b = step(b, params, cfg, warmstart=True)
    np.testing.assert_allclose(np.asarray(a.bodies.poses.translation),
                               np.asarray(b.bodies.poses.translation),
                               rtol=1e-6, atol=1e-6)


def test_trimesh_box_rests():
    """A cuboid resting on a flat trimesh heightfield (convex-vs-mesh GJK
    path with triangle collision margin)."""
    from wgmath_tpu.shapes.mesh import heightfield

    params = SimParams()
    hf = np.zeros((7, 7), np.float32)
    mesh = heightfield(hf, 1.0, 1.0)
    shapes = ShapeSet.concat(mesh, ShapeSet.cuboids(jnp.asarray([[0.4, 0.4, 0.4]])))
    trans = jnp.asarray([[0.0, 0.0, 0.0], [0.2, 1.2, -0.1]], jnp.float32)
    poses = sim_ops.from_parts(jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (2, 1)),
                               trans)
    mp = _merge_mprops(
        cuboid_local_mprops(jnp.asarray([[3.5, 0.1, 3.5]]),
                            dynamic=jnp.asarray([False])),
        cuboid_local_mprops(jnp.asarray([[0.4, 0.4, 0.4]])),
    )
    bodies = Bodies(poses, Velocity.zero(2, 3), mp)
    state = new_state(bodies, shapes)
    cfg = dataclasses.replace(CFG, mesh_pair_capacity=16, mesh_k_best=4)
    for _ in range(120):
        state, cfg = step_checked(state, params, cfg)
    y = float(state.bodies.poses.translation[1, 1])
    # rest height = half extent + collision margin (0.02)
    assert abs(y - 0.42) < 0.05, y
    v = np.asarray(state.bodies.vels.linear[1])
    assert np.max(np.abs(v)) < 0.1, v


def test_polyline_ball_rests_2d():
    """2D ball resting inside a polyline bowl (polyline_convex parity)."""
    from wgmath_tpu.shapes.mesh import polyline

    params = SimParams()
    # V-shaped polyline: ball settles in the crease at the origin
    pl = polyline(np.asarray([[-2.0, 2.0], [0.0, 0.0], [2.0, 2.0]], np.float32))
    shapes = ShapeSet.concat(pl, ShapeSet.balls(jnp.asarray([0.3]), dim=2))
    trans = jnp.asarray([[0.0, 0.0], [0.1, 1.5]], jnp.float32)
    poses = sim_ops.from_parts(jnp.tile(jnp.asarray([1.0, 0.0]), (2, 1)), trans)
    mp = _merge_mprops(
        cuboid_local_mprops(jnp.asarray([[2.0, 1.0]]),
                            dynamic=jnp.asarray([False])),
        ball_local_mprops(jnp.asarray([0.3]), dim=2),
    )
    bodies = Bodies(poses, Velocity.zero(2, 2), mp)
    state = new_state(bodies, shapes)
    cfg = dataclasses.replace(CFG, mesh_pair_capacity=16)
    for _ in range(150):
        state, cfg = step_checked(state, params, cfg)
    p = np.asarray(state.bodies.poses.translation[1])
    # resting in the V crease: x ≈ 0, y ≈ r·√2 (distance r from both walls)
    assert abs(p[0]) < 0.05, p
    assert abs(p[1] - 0.3 * np.sqrt(2)) < 0.06, p


def test_polyline_cuboid_rests_2d():
    """2D box dropped onto a flat polyline rests level on its bottom face."""
    from wgmath_tpu.shapes.mesh import polyline

    params = SimParams()
    pl = polyline(np.asarray([[-4.0, 0.0], [0.0, 0.0], [4.0, 0.0]], np.float32))
    shapes = ShapeSet.concat(
        pl, ShapeSet.cuboids(jnp.asarray([[0.4, 0.3]])))
    trans = jnp.asarray([[0.0, 0.0], [0.3, 1.0]], jnp.float32)
    poses = sim_ops.from_parts(jnp.tile(jnp.asarray([1.0, 0.0]), (2, 1)), trans)
    mp = _merge_mprops(
        cuboid_local_mprops(jnp.asarray([[4.0, 0.1]]),
                            dynamic=jnp.asarray([False])),
        cuboid_local_mprops(jnp.asarray([[0.4, 0.3]])),
    )
    bodies = Bodies(poses, Velocity.zero(2, 2), mp)
    state = new_state(bodies, shapes)
    cfg = dataclasses.replace(CFG, mesh_pair_capacity=16)
    for _ in range(150):
        state, cfg = step_checked(state, params, cfg)
    p = np.asarray(state.bodies.poses.translation[1])
    rot = np.asarray(state.bodies.poses.rotation[1])
    # resting on its 0.3 half-extent face, level (rotation ≈ identity)
    assert abs(p[1] - 0.3) < 0.05, p
    assert abs(rot[1]) < 0.05, rot  # sin(theta) ≈ 0
    v = np.asarray(state.bodies.vels.linear[1])
    assert np.linalg.norm(v) < 0.1, v


def test_grid_broad_phase_matches_brute():
    """Grid BP returns exactly the brute-force pair set (random AABBs with a
    big 'ground' box exercising the global side list)."""
    from wgmath_tpu.broad_phase.brute_force import find_pairs
    from wgmath_tpu.broad_phase.grid import find_pairs_grid

    rng = np.random.default_rng(5)
    for trial, (n, dim) in enumerate([(200, 3), (150, 2), (300, 3)]):
        c = rng.uniform(-10, 10, (n, dim)).astype(np.float32)
        h = rng.uniform(0.2, 0.7, (n, 1)).astype(np.float32)
        mins = c - h
        maxs = c + h
        mins[0] = -50.0  # giant static slab → global list
        maxs[0] = 50.0
        maxs[0, 1] = -9.0
        bf = find_pairs(jnp.asarray(mins), jnp.asarray(maxs), capacity=4096,
                        max_per_row=128)
        gr = find_pairs_grid(jnp.asarray(mins), jnp.asarray(maxs),
                             capacity=4096, max_per_body=128, cell_cap=32, cand_budget=256)
        def pair_set(p):
            a = np.asarray(p.body_a)[np.asarray(p.valid)]
            b = np.asarray(p.body_b)[np.asarray(p.valid)]
            return set(zip(a.tolist(), b.tolist()))
        sb, sg = pair_set(bf), pair_set(gr)
        assert int(gr.count) == int(bf.count) == len(sb), (
            trial, int(gr.count), int(bf.count), len(sb))
        assert sb == sg, (trial, len(sb ^ sg), sorted(sb ^ sg)[:5])


def test_grid_broad_phase_ball_prefilter():
    from wgmath_tpu.broad_phase.brute_force import find_pairs
    from wgmath_tpu.broad_phase.grid import find_pairs_grid

    rng = np.random.default_rng(9)
    n = 256
    c = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    r = rng.uniform(0.3, 0.6, (n,)).astype(np.float32)
    mins = c - r[:, None]
    maxs = c + r[:, None]
    rad = r.copy()
    rad[:16] = np.nan  # some non-balls
    bf = find_pairs(jnp.asarray(mins), jnp.asarray(maxs), capacity=4096,
                    max_per_row=128, ball_radius=jnp.asarray(rad), margin=0.1)
    gr = find_pairs_grid(jnp.asarray(mins), jnp.asarray(maxs), capacity=4096,
                         max_per_body=128, cell_cap=64, cand_budget=512,
                         ball_radius=jnp.asarray(rad), margin=0.1)
    def pair_set(p):
        a = np.asarray(p.body_a)[np.asarray(p.valid)]
        b = np.asarray(p.body_b)[np.asarray(p.valid)]
        return set(zip(a.tolist(), b.tolist()))
    assert pair_set(bf) == pair_set(gr)
    assert int(bf.count) == int(gr.count)


def test_capsule_rests_2d():
    """2D lying capsule rests on the ground at y = radius (embedded-3D GJK
    narrow phase for 2D support-mapped pairs)."""
    from wgmath_tpu.dynamics.body import capsule_local_mprops

    params = SimParams()
    shapes = ShapeSet.concat(
        ShapeSet.cuboids(jnp.asarray([[10.0, 1.0]])),
        ShapeSet.capsules(jnp.asarray([0.4]), jnp.asarray([0.3]), dim=2))
    # capsule lying flat (rotated 90°), dropped from 1.0
    rot = jnp.asarray([[1.0, 0.0], [0.0, 1.0]], jnp.float32)
    trans = jnp.asarray([[0.0, -1.0], [0.1, 1.0]], jnp.float32)
    poses = sim_ops.from_parts(rot, trans)
    mp = _merge_mprops(
        cuboid_local_mprops(jnp.asarray([[10.0, 1.0]]),
                            dynamic=jnp.asarray([False])),
        capsule_local_mprops(jnp.asarray([0.4]), jnp.asarray([0.3]), dim=2),
    )
    bodies = Bodies(poses, Velocity.zero(2, 2), mp)
    state = new_state(bodies, shapes)
    cfg = CFG
    for _ in range(120):
        state, cfg = step_checked(state, params, cfg)
    p = np.asarray(state.bodies.poses.translation[1])
    v = np.asarray(state.bodies.vels.linear[1])
    assert abs(p[1] - 0.3) < 0.05, p
    assert np.linalg.norm(v) < 0.1, v


def test_manifold_width_1_matches_full_on_ball_scene():
    """Width-1 manifolds are bit-exact for scenes whose kernels only emit
    one contact point (balls + a single ground cuboid) — the extra point
    slots were masked no-ops."""
    from wgmath_tpu.pipeline import auto_manifold_points
    from wgmath_tpu.scenes.builders import balls

    params = SimParams()
    state = balls(64, dim=3)
    assert auto_manifold_points(state.shapes, 3) == 1
    cfg4 = PipelineConfig(pair_capacity=512, max_colors=8)
    cfg1 = dataclasses.replace(cfg4, manifold_points=1)
    sa, sb = state, state
    for f in range(25):
        sa = step(sa, params, cfg4, warmstart=f > 0)
        sb = step(sb, params, cfg1, warmstart=f > 0)
    np.testing.assert_allclose(np.asarray(sa.bodies.poses.translation),
                               np.asarray(sb.bodies.poses.translation),
                               rtol=1e-6, atol=1e-6)
    assert int(np.asarray(sb.pair_count)[1]) > 0  # contacts actually formed


def test_auto_manifold_points_rules():
    from wgmath_tpu.pipeline import auto_manifold_points
    from wgmath_tpu.scenes.builders import balls, boxes

    assert auto_manifold_points(balls(8, dim=3).shapes, 3) == 1
    assert auto_manifold_points(boxes(8, dim=3).shapes, 3) == 4
    assert auto_manifold_points(boxes(8, dim=2).shapes, 2) == 2


def test_bp_slack_reuse_is_conservative():
    """Temporal-coherence broad phase: the (possibly cached) pair list used
    by each step must be a superset of the true AABB-overlap pairs at that
    step's start poses — the exactness invariant (the narrow phase re-tests
    every pair, so supersets change contact *ordering* but never miss a
    contact; GS iterates are order-dependent, as with the reference's
    nondeterministic atomic-append ordering)."""
    from wgmath_tpu.scenes.builders import balls

    params = SimParams()
    state = balls(64, dim=3)
    cfg_slack = PipelineConfig(pair_capacity=1024, max_colors=8,
                               bp_slack=0.05)
    sb = state
    reused_some_frame = False
    for f in range(30):  # free fall → impact → settle start
        start_poses = sb.bodies.poses
        prev_pairs = sb.bp_pairs
        sb = step(sb, params, cfg_slack, warmstart=f > 0)
        # reference: plain AABB overlaps at the step's start poses
        mins, maxs = world_aabbs(sb.shapes, start_poses,
                                 margin=params.prediction_distance)
        mins, maxs = np.asarray(mins), np.asarray(maxs)
        n = mins.shape[0]
        ov = np.all((mins[:, None, :] <= maxs[None, :, :])
                    & (mins[None, :, :] <= maxs[:, None, :]), axis=-1)
        # the broad phase also applies an exact sphere-sphere prefilter for
        # ball pairs — mirror it (tighter than the AABB test)
        from wgmath_tpu.shapes import shape as _shp

        tags = np.asarray(sb.shapes.tag)
        rad = np.where(tags == _shp.BALL, np.asarray(sb.shapes.params[:, 0]),
                       np.nan)
        cen = np.asarray(start_poses.translation)
        d = np.linalg.norm(cen[:, None] - cen[None, :], axis=-1)
        lim = rad[:, None] + rad[None, :] + params.prediction_distance
        sphere_ok = ~np.isfinite(lim) | (d <= lim)
        ov &= sphere_ok
        iu = np.triu_indices(n, 1)
        ref = {(int(i), int(j)) for i, j in zip(*iu) if ov[i, j]}
        used = sb.bp_pairs
        got = {(int(a), int(b)) for a, b, v in
               zip(np.asarray(used.body_a), np.asarray(used.body_b),
                   np.asarray(used.valid)) if v}
        missing = ref - got
        assert not missing, f"frame {f}: missing pairs {sorted(missing)[:5]}"
        if prev_pairs is not None and np.array_equal(
                np.asarray(prev_pairs.body_a), np.asarray(used.body_a)):
            reused_some_frame = True
    assert reused_some_frame  # the cache actually kicked in
    # no NaNs, pile stays above ground
    tr = np.asarray(sb.bodies.poses.translation)
    assert np.isfinite(tr).all()
    assert tr[1:, 1].min() > 0.3  # ball centers near/above radius height
    # (body 0 is the ground slab — big static colliders come first)
    # cache structure survives a multi_step scan
    from wgmath_tpu.pipeline import multi_step

    sc = multi_step(sb, params, cfg_slack, 3)
    sd = sb
    for _ in range(3):
        sd = step(sd, params, cfg_slack, warmstart=True)
    np.testing.assert_allclose(np.asarray(sc.bodies.poses.translation),
                               np.asarray(sd.bodies.poses.translation),
                               rtol=1e-6, atol=1e-6)


def test_coloring_class_cap_balances_and_stays_disjoint():
    """class_cap keeps color classes ≤ max(cap, even split) while preserving
    the independent-set property within each color."""
    from types import SimpleNamespace

    rng = np.random.default_rng(3)
    n, c = 200, 400
    body_a = rng.integers(0, n, c).astype(np.int32)
    body_b = ((body_a + 1 + rng.integers(0, n - 1, c)) % n).astype(np.int32)
    cons = SimpleNamespace(body_a=jnp.asarray(body_a),
                           body_b=jnp.asarray(body_b),
                           valid=jnp.ones((c,), bool),
                           im_a=jnp.ones((c, 3), jnp.float32),
                           im_b=jnp.ones((c, 3), jnp.float32))
    cap = 32
    colors = np.asarray(color_constraints(cons, n, max_colors=32,
                                          class_cap=cap))
    assert (colors > 0).all()  # everything colored (no residue at 32 colors)
    for col in np.unique(colors):
        idx = np.where(colors == col)[0]
        assert len(idx) <= max(cap, c // 31 + 2)
        touched = np.concatenate([body_a[idx], body_b[idx]])
        assert len(np.unique(touched)) == len(touched), f"color {col} clash"


def test_pair_graph_coloring_stays_disjoint_on_contacts():
    """bp_slack + pair-graph coloring: the colors actually used by the GS
    sweep (on the per-frame valid contacts) must keep same-color constraints
    body-disjoint — the superset-coloring invariant."""
    from wgmath_tpu.scenes.builders import balls

    params = SimParams()
    s = balls(96, dim=3)
    cfg = PipelineConfig(pair_capacity=2048, max_colors=16, bp_slack=0.05,
                         contact_capacity=1024, gs_cmax=128,
                         manifold_points=1)
    for f in range(45):  # settle into a contact-rich pile
        s = step(s, params, cfg, warmstart=f > 0)
        cons = s.prev_constraints
        colors = np.asarray(s.prev_colors)
        valid = np.asarray(cons.valid)
        ba, bb = np.asarray(cons.body_a), np.asarray(cons.body_b)
        dyn = np.asarray(s.bodies.is_dynamic())
        for col in np.unique(colors[valid & (colors > 0)]):
            sel = valid & (colors == col)
            touched = np.concatenate([ba[sel][dyn[ba[sel]]],
                                      bb[sel][dyn[bb[sel]]]])
            assert len(np.unique(touched)) == len(touched), \
                f"frame {f} color {col}: dynamic body shared"
    assert int(np.asarray(s.pair_count)[1]) > 50  # contact-rich by now
    tr = np.asarray(s.bodies.poses.translation)
    assert np.isfinite(tr).all()


def test_narrow_phase_bc_compaction_matches_dense():
    """The compacted ball-cuboid pass (bc_capacity > 0) must produce the
    same manifolds as the dense either-order pass — balls resting on / near
    a ground slab + walls, some airborne, both pair orders present."""
    from wgmath_tpu.queries.narrow_phase import narrow_phase
    from wgmath_tpu.scenes.builders import ball_pit

    params = SimParams()
    s = ball_pit(64, depth=2)
    cfg = PipelineConfig(pair_capacity=2048, contact_capacity=1024,
                         max_colors=16, gs_cmax=128, manifold_points=1)
    for f in range(60):  # settle into ground/wall contact
        s = step(s, params, cfg, warmstart=f > 0)
    mins, maxs = world_aabbs(s.shapes, s.bodies.poses)
    pairs = find_pairs(mins, maxs, capacity=2048, max_per_row=128)
    dense = narrow_phase(s.bodies.poses, s.shapes, pairs, 0.05, p_max=1)
    comp = narrow_phase(s.bodies.poses, s.shapes, pairs, 0.05, p_max=1,
                        bc_capacity=256)
    for f in ("normal_a", "points_a", "dist", "num_points", "valid"):
        d, c = np.asarray(getattr(dense, f)), np.asarray(getattr(comp, f))
        v = np.asarray(dense.valid)
        np.testing.assert_allclose(d[v], c[v], rtol=1e-5, atol=1e-6,
                                   err_msg=f)
    np.testing.assert_array_equal(np.asarray(dense.valid),
                                  np.asarray(comp.valid))
    tags = np.asarray(s.shapes.tag)
    ba = np.asarray(pairs.body_a)
    bb = np.asarray(pairs.body_b)
    assert (v & (tags[ba] != tags[bb])).sum() > 10  # mixed pairs exercised


def test_ball_pit_settles_quiescent():
    """ball_pit reaches a bounded, finite, contact-rich state (the bench's
    steady-state regime) — nothing escapes the walls."""
    from wgmath_tpu.pipeline import auto_manifold_points
    from wgmath_tpu.scenes.builders import ball_pit

    params = SimParams()
    s = ball_pit(150, depth=3)
    cfg = PipelineConfig(
        pair_capacity=4096, contact_capacity=2048, max_colors=16,
        gs_cmax=256, bp_slack=0.02, bc_pair_capacity=512,
        manifold_points=auto_manifold_points(
            s.shapes, 3, dynamic=np.asarray(s.bodies.is_dynamic())))
    assert cfg.manifold_points == 1  # static-only cuboids -> width-1
    dyn = np.asarray(s.bodies.is_dynamic())
    maxv = np.inf
    for f in range(400):  # ~6 s sim time: drop + spread + jam
        s, cfg = step_checked(s, params, cfg)
        if f % 20 == 19:
            maxv = float(np.abs(np.asarray(s.bodies.vels.linear)[dyn]).max())
            if f >= 99 and maxv < 0.2:
                break
    tr = np.asarray(s.bodies.poses.translation)
    assert np.isfinite(tr).all()
    r = 0.5
    assert (tr[dyn, 1] > -r).all()  # nobody fell through the ground
    assert int(np.asarray(s.pair_count)[1]) > 100  # contact-rich
    assert maxv < 1.0  # jammed, not exploding


def test_velocity_slack_keeps_cache_valid_with_straggler():
    """A fast straggler ball must not invalidate the slack-cached broad
    phase every frame: its reference box grows with its speed, so the
    containment predicate keeps holding while it flies."""
    from wgmath_tpu.scenes.builders import balls

    params = SimParams()
    s = balls(96, dim=3)
    cfg = PipelineConfig(pair_capacity=2048, max_colors=16, bp_slack=0.02,
                         contact_capacity=1024, gs_cmax=128,
                         manifold_points=1)
    for f in range(50):  # settle
        s = step(s, params, cfg, warmstart=f > 0)
    # launch one ball sideways at straggler speed
    lin = s.bodies.vels.linear.at[40].set(jnp.asarray([1.5, 0.5, 1.0]))
    s = dataclasses.replace(
        s, bodies=Bodies(s.bodies.poses,
                         dataclasses.replace(s.bodies.vels, linear=lin),
                         s.bodies.local_mprops))
    s = step(s, params, cfg)  # refresh happens at most here
    cheap = 0
    for f in range(6):
        s = step(s, params, cfg)
        # pair_count[3]: 0 = cache hit, 1 = per-body repair, 2 = full BP.
        # With incremental repair a settled pile always has a trickle of
        # mm-scale escapes (repaired exactly, per body), so the feature's
        # contract is "the straggler never forces the FULL refresh" — not
        # "every body stays inside its reference box".
        cheap += int(np.asarray(s.pair_count)[3]) != 2
    # per-frame travel at 1.9 m/s ≈ 0.03 > bp_slack alone; the velocity
    # term + repair must carry it for most of a 6-frame horizon
    assert cheap >= 5, f"full BP refresh ran on {6 - cheap}/6 frames"
    assert np.isfinite(np.asarray(s.bodies.poses.translation)).all()


def test_incremental_pair_recolor_stays_valid():
    """transfer_pair_colors + assign_new_pair_colors after pair churn must
    keep same-color pairs dynamic-body-disjoint and respect the class cap."""
    from wgmath_tpu.dynamics.solver import (
        assign_new_pair_colors,
        color_pairs,
        transfer_pair_colors,
    )

    rng = np.random.default_rng(5)
    n_bodies, cap = 200, 512
    dyn = jnp.asarray(rng.random(n_bodies) > 0.1)

    def random_pairs(k):
        seen = set()
        out = []
        while len(out) < k:
            a, b = sorted(rng.integers(0, n_bodies, 2).tolist())
            if a != b and (a, b) not in seen and (dyn[a] or dyn[b]):
                seen.add((a, b))
                out.append((a, b))
        return out

    old = random_pairs(300)
    ba = jnp.asarray([p[0] for p in old] + [0] * (cap - 300), jnp.int32)
    bb = jnp.asarray([p[1] for p in old] + [0] * (cap - 300), jnp.int32)
    valid = jnp.asarray([True] * 300 + [False] * (cap - 300))
    colors = color_pairs(ba, bb, valid, dyn[ba], dyn[bb], n_bodies,
                         max_colors=16, class_cap=64)

    # churn: drop 20 pairs, add 30 new ones, shuffle slot order
    survivors = old[20:]
    new_pairs = [p for p in random_pairs(60) if p not in set(old)][:30]
    mixed = survivors + new_pairs
    rng.shuffle(mixed)
    nb_a = jnp.asarray([p[0] for p in mixed] + [0] * (cap - len(mixed)),
                       jnp.int32)
    nb_b = jnp.asarray([p[1] for p in mixed] + [0] * (cap - len(mixed)),
                       jnp.int32)
    nvalid = jnp.asarray([True] * len(mixed) + [False] * (cap - len(mixed)))

    mapped = transfer_pair_colors(nb_a, nb_b, nvalid, ba, bb, valid, colors)
    m = np.asarray(mapped)
    # survivors keep their color, news start at 0
    old_color = {p: int(c) for p, c in zip(old, np.asarray(colors)[:300])}
    for i, p in enumerate(mixed):
        if p in old_color:
            assert m[i] == old_color[p], (i, p)
        else:
            assert m[i] == 0

    out = np.asarray(assign_new_pair_colors(
        nb_a, nb_b, nvalid, mapped, dyn[nb_a], dyn[nb_b], n_bodies,
        max_colors=16, class_cap=64, new_cap=64))
    nv = np.asarray(nvalid)
    assert (out[nv] > 0).all(), "every pair colored (plenty of colors free)"
    d = np.asarray(dyn)
    a_np, b_np = np.asarray(nb_a), np.asarray(nb_b)
    for col in np.unique(out[nv]):
        sel = nv & (out == col)
        assert sel.sum() <= 64, f"class cap violated for color {col}"
        touched = np.concatenate([a_np[sel][d[a_np[sel]]],
                                  b_np[sel][d[b_np[sel]]]])
        assert len(np.unique(touched)) == len(touched), f"color {col} clash"


def test_minimize_colors_valid_and_fewer():
    """The TOPO-GC-style reseating pass (solver.minimize_colors ≙ the
    reference's primary min-color colorer, coloring.rs:220-325) must keep
    the coloring valid (same-color pairs dynamic-body-disjoint), respect
    the class cap, never add classes, and actually drain classes on a
    deliberately wasteful input coloring."""
    from wgmath_tpu.dynamics.solver import color_pairs, minimize_colors

    rng = np.random.default_rng(11)
    n_bodies, cap, max_colors = 300, 1024, 16
    dyn = jnp.asarray(rng.random(n_bodies) > 0.1)
    seen, pairs = set(), []
    while len(pairs) < 700:
        a, b = sorted(rng.integers(0, n_bodies, 2).tolist())
        if a != b and (a, b) not in seen and (dyn[a] or dyn[b]):
            seen.add((a, b))
            pairs.append((a, b))
    ba = jnp.asarray([p[0] for p in pairs] + [0] * (cap - 700), jnp.int32)
    bb = jnp.asarray([p[1] for p in pairs] + [0] * (cap - 700), jnp.int32)
    valid = jnp.asarray([True] * 700 + [False] * (cap - 700))

    def check_valid(cols, class_cap):
        d, a_np, b_np = np.asarray(dyn), np.asarray(ba), np.asarray(bb)
        v = np.asarray(valid)
        for col in np.unique(cols[v & (cols > 0)]):
            sel = v & (cols == col)
            if class_cap:
                assert sel.sum() <= class_cap, f"cap violated at {col}"
            touched = np.concatenate([a_np[sel][d[a_np[sel]]],
                                      b_np[sel][d[b_np[sel]]]])
            assert len(np.unique(touched)) == len(touched), \
                f"color {col} clash"

    # wasteful base coloring: only 2 claim rounds → sparse high classes
    base = color_pairs(ba, bb, valid, dyn[ba], dyn[bb], n_bodies,
                       max_colors=max_colors, claim_rounds=1)
    b_np = np.asarray(base)
    v = np.asarray(valid)
    assert (b_np[v] > 0).all(), "baseline colored everything"
    n_before = len(np.unique(b_np[v]))

    for class_cap in (0, 96):
        out = np.asarray(minimize_colors(
            ba, bb, valid, base, dyn[ba], dyn[bb], n_bodies,
            max_colors=max_colors, sweeps=2, class_cap=class_cap))
        check_valid(out, class_cap)
        assert (out[v] > 0).all(), "reseating never uncolors a pair"
        n_after = len(np.unique(out[v]))
        assert n_after <= n_before
        if not class_cap:
            # the 1-round Luby coloring leaves plenty of slack: reseating
            # must reclaim at least one class on this graph
            assert n_after < n_before, (n_before, n_after)


@pytest.mark.parametrize("p_max", [1, 4])
def test_cm_gs_math_matches_row_major(p_max):
    """The component-major GS impulse math (the Pallas sweep kernel body)
    must reproduce solver._point_updates bit-for-bit-ish on random data."""
    from types import SimpleNamespace

    from wgmath_tpu.dynamics.gs_pallas import gs_math_block
    from wgmath_tpu.dynamics.solver import (
        _PACK_FIELDS,
        _point_updates,
        pack_sorted_fields,
    )

    rng = np.random.default_rng(7)
    L, S, dim = 256, 2, 3
    def r(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))
    view = SimpleNamespace(
        dir_a=r(L, 3), tangent_a=r(L, S, 3), im_a=jnp.abs(r(L, 3)),
        im_b=jnp.abs(r(L, 3)), cfm_factor=jnp.abs(r(L)) * 0.5 + 0.5,
        limit=jnp.abs(r(L)), num_points=jnp.asarray(
            rng.integers(0, p_max + 1, L).astype(np.int32)),
        n_torque_a=r(L, p_max, 3), n_torque_b=r(L, p_max, 3),
        n_ii_torque_a=r(L, p_max, 3), n_ii_torque_b=r(L, p_max, 3),
        n_rhs=r(L, p_max), n_r=jnp.abs(r(L, p_max)),
        t_torque_a=r(L, p_max, S, 3), t_torque_b=r(L, p_max, S, 3),
        t_ii_torque_a=r(L, p_max, S, 3), t_ii_torque_b=r(L, p_max, S, 3),
        t_rhs=r(L, p_max, S), t_r=jnp.abs(r(L, p_max, 3)),
        body_a=jnp.zeros(L, jnp.int32), body_b=jnp.zeros(L, jnp.int32),
        # rhs-relinearization inputs added to _PACK_FIELDS by the
        # rhs-in-rung work — packed along but unread by the plain sweep
        local_pt_a=r(L, p_max, 3), local_pt_b=r(L, p_max, 3),
        info_dist=r(L, p_max), info_normal_vel=r(L, p_max),
        t_rhs_wo_bias=r(L, p_max, S),
    )
    active = jnp.asarray(rng.random(L) > 0.2)
    v1l, v1a, v2l, v2a = r(L, 3), r(L, 3), r(L, 3), r(L, 3)
    prev_n = r(L, p_max)
    prev_t = r(L, p_max, S)

    want_n, want_t, w1l, w1a, w2l, w2a = _point_updates(
        view, active, v1l, v1a, v2l, v2a, prev_n, prev_t, p_max, dim)

    packed2d, meta = pack_sorted_fields(view)
    p1 = jnp.concatenate([v1l, v1a], axis=-1)
    p2 = jnp.concatenate([v2l, v2a], axis=-1)
    got_n, got_t, d1, d2 = gs_math_block(
        packed2d, meta, view, active, p1, p2, prev_n, prev_t,
        p_max=p_max, s_len=S, use_pallas=False)

    # reduction-order reassociation across the chained point loop gives
    # ~3e-5 relative wiggle at p_max=4 — same math, different sum order
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(want_n),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1),
                               np.concatenate([np.asarray(w1l - v1l),
                                               np.asarray(w1a - v1a)], -1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2),
                               np.concatenate([np.asarray(w2l - v2l),
                                               np.asarray(w2a - v2a)], -1),
                               rtol=1e-4, atol=1e-5)


def test_bp_repair_matches_full_refresh():
    """Incremental BP repair (a few escaped bodies → row-local recompute
    merged into the cached list) must produce the same pair SET as a full
    refresh of the same frame, and its colors must stay disjoint."""
    from wgmath_tpu.scenes.builders import balls

    params = SimParams()
    cfg = PipelineConfig(pair_capacity=2048, max_colors=16, bp_slack=0.02,
                         contact_capacity=1024, gs_cmax=128,
                         manifold_points=1, bp_repair_cap=8)
    s = balls(96, dim=3)
    for f in range(60):  # settle + materialize the BP cache
        s = step(s, params, cfg, warmstart=f > 0)
    # launch two balls fast enough to escape their reference boxes
    lin = s.bodies.vels.linear.at[40].set(jnp.asarray([4.0, 1.0, 2.0]))
    lin = lin.at[61].set(jnp.asarray([-3.0, -2.0, 1.5]))
    s = dataclasses.replace(
        s, bodies=Bodies(s.bodies.poses,
                         dataclasses.replace(s.bodies.vels, linear=lin),
                         s.bodies.local_mprops))
    took_repair = False
    for f in range(8):
        s_rep = step(s, params, cfg)
        path = int(np.asarray(s_rep.pair_count)[3])
        if path == 1:
            took_repair = True
            s_full = step(s, params,
                          dataclasses.replace(cfg, bp_force="miss"))

            def pair_set(ps):
                a = np.asarray(ps.bp_pairs.body_a)
                b = np.asarray(ps.bp_pairs.body_b)
                v = np.asarray(ps.bp_pairs.valid)
                return {(int(x), int(y)) for x, y in zip(a[v], b[v])}

            rep, full = pair_set(s_rep), pair_set(s_full)
            # the superset contract covers CONTACT-POSSIBLE pairs: corner
            # AABB overlaps beyond the sphere-contact distance are dropped
            # by the (velocity-dependent) sphere prefilter, whose threshold
            # legitimately differs between the cached list (built with the
            # speeds of the build frame) and a fresh refresh — those pairs
            # can never produce a contact either way
            pos = np.asarray(s.bodies.poses.translation)
            lim = 2 * 0.5 + float(params.prediction_distance) + 1e-4
            relevant = {(i, j) for (i, j) in full
                        if np.linalg.norm(pos[i] - pos[j]) <= lim}
            assert relevant <= rep, f"repair missed: {relevant - rep}"
            assert len(rep - full) <= 96
            # colors on the repaired list stay dynamic-body-disjoint
            cols = np.asarray(s_rep.bp_colors[0])
            a = np.asarray(s_rep.bp_pairs.body_a)
            b = np.asarray(s_rep.bp_pairs.body_b)
            v = np.asarray(s_rep.bp_pairs.valid)
            dyn = np.asarray(s.bodies.is_dynamic())
            for col in np.unique(cols[v]):
                if col == 0:
                    continue
                sel = v & (cols == col)
                touched = np.concatenate([a[sel][dyn[a[sel]]],
                                          b[sel][dyn[b[sel]]]])
                assert len(np.unique(touched)) == len(touched), col
        s = s_rep
    assert took_repair, "no frame took the repair path"
    assert np.isfinite(np.asarray(s.bodies.poses.translation)).all()


def test_kinematic_bulldozer_repairs_bp_cache():
    """A kinematic platform (one-way coupling) plowing into a resting ball
    under the slack-cached broad phase. The (platform, ball) pair does NOT
    exist when the cache is built — it only appears because the moving
    platform keeps escaping its reference box and the repair cohort
    includes kinematic bodies (is_moving, not is_dynamic — a
    dynamic-only cohort would leave the platform's pair rows stale for
    ever and the ball would never be hit)."""
    he = jnp.asarray([[1.0, 0.75, 2.0]], jnp.float32)
    ground_he = jnp.asarray([[50.0, 1.0, 50.0]], jnp.float32)
    shapes = ShapeSet.concat(
        ShapeSet.cuboids(jnp.concatenate([ground_he, he])),
        ShapeSet.balls(jnp.asarray([0.5], jnp.float32)))
    trans = jnp.asarray([[0.0, -1.0, 0.0],     # ground (top at y=0)
                         [0.0, 0.76, 0.0],     # plow (bottom just off it)
                         [3.0, 0.5, 0.0]],     # resting ball, 2 m ahead
                        jnp.float32)
    poses = sim_ops.from_parts(
        jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (3, 1)), trans)
    mp = _merge_mprops(
        cuboid_local_mprops(jnp.concatenate([ground_he, he]),
                            dynamic=jnp.asarray([False, False])),
        ball_local_mprops(jnp.asarray([0.5], jnp.float32)))
    vels = Velocity.zero(3, 3)
    vels = Velocity(vels.linear.at[1, 0].set(1.0), vels.angular)
    bodies = Bodies(poses, vels, mp, jnp.asarray([False, True, False]))
    state = new_state(bodies, shapes)
    cfg = PipelineConfig(pair_capacity=256, contact_capacity=256,
                         max_colors=8, manifold_points=4, bp_algo="grid",
                         bp_slack=0.03, bp_repair_cap=4, gs_cmax=64)
    params = SimParams()
    hits = []
    for f in range(150):
        state = step(state, params, cfg, warmstart=f > 0)
        hits.append(int(np.asarray(state.pair_count)[3]))
    pos = np.asarray(state.bodies.poses.translation)
    v = np.asarray(state.bodies.vels.linear)
    assert np.all(np.isfinite(pos))
    # the platform rode its prescribed velocity: x = 150/60 = 2.5 m
    assert pos[1, 0] == pytest.approx(2.5, abs=1e-4)
    # the ball was hit and shoved forward (face reaches it at x=1.5 ⇒
    # t=1.5 s; with stale platform pair rows it would still sit at x=3)
    assert pos[2, 0] > 3.3, (pos[2], v[2])
    assert v[2, 0] > 0.5, v[2]
    # the cheap paths actually ran: the REPAIR path fired (that's the path
    # whose cohort must include kinematic bodies) and full refreshes were
    # rare (bp_path: 0 = hit, 1 = repair, 2 = full)
    assert hits.count(1) >= 5, (hits.count(1), hits.count(2))
    assert hits.count(2) <= 30, hits.count(2)


def test_cm_gs_math_lane_tiled_kernel():
    """Wide rungs split along the lane axis inside the Pallas GS-math
    kernel (L > 8192 blew scoped VMEM at pyramid-43k scale): the tiled
    interpret-mode kernel must match the untiled XLA twin exactly."""
    from types import SimpleNamespace

    from wgmath_tpu.dynamics.gs_pallas import _lane_tiling, gs_math_block
    from wgmath_tpu.dynamics.solver import pack_sorted_fields

    assert _lane_tiling(9216) == (1024, 9)
    assert _lane_tiling(24576) == (8192, 3)
    assert _lane_tiling(4096) == (4096, 1)

    rng = np.random.default_rng(11)
    L, S, p_max = 9216, 2, 1
    def r(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))
    view = SimpleNamespace(
        dir_a=r(L, 3), tangent_a=r(L, S, 3), im_a=jnp.abs(r(L, 3)),
        im_b=jnp.abs(r(L, 3)), cfm_factor=jnp.abs(r(L)) * 0.5 + 0.5,
        limit=jnp.abs(r(L)), num_points=jnp.asarray(
            rng.integers(0, p_max + 1, L).astype(np.int32)),
        n_torque_a=r(L, p_max, 3), n_torque_b=r(L, p_max, 3),
        n_ii_torque_a=r(L, p_max, 3), n_ii_torque_b=r(L, p_max, 3),
        n_rhs=r(L, p_max), n_r=jnp.abs(r(L, p_max)),
        t_torque_a=r(L, p_max, S, 3), t_torque_b=r(L, p_max, S, 3),
        t_ii_torque_a=r(L, p_max, S, 3), t_ii_torque_b=r(L, p_max, S, 3),
        t_rhs=r(L, p_max, S), t_r=jnp.abs(r(L, p_max, 3)),
        body_a=jnp.zeros(L, jnp.int32), body_b=jnp.zeros(L, jnp.int32),
        local_pt_a=r(L, p_max, 3), local_pt_b=r(L, p_max, 3),
        info_dist=r(L, p_max), info_normal_vel=r(L, p_max),
        t_rhs_wo_bias=r(L, p_max, S),
    )
    active = jnp.asarray(rng.random(L) > 0.2)
    p1 = jnp.concatenate([r(L, 3), r(L, 3)], axis=-1)
    p2 = jnp.concatenate([r(L, 3), r(L, 3)], axis=-1)
    prev_n, prev_t = r(L, p_max), r(L, p_max, S)
    packed2d, meta = pack_sorted_fields(view)
    ref = gs_math_block(packed2d, meta, view, active, p1, p2, prev_n,
                        prev_t, p_max=p_max, s_len=S, use_pallas=False)
    got = gs_math_block(packed2d, meta, view, active, p1, p2, prev_n,
                        prev_t, p_max=p_max, s_len=S, use_pallas=True)
    for g, w in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6)
