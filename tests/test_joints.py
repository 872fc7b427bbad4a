"""Impulse-joint tests: pendulum constraint preservation, fixed-joint
rigidity, revolute axis restriction, motor drive (≙ the reference's joint
demos: joint_ball/fixed/prismatic/revolute examples as behavioral oracles)."""

import jax.numpy as jnp
import numpy as np

from wgmath_tpu.dynamics import Bodies, SimParams, Velocity, ball_local_mprops
from wgmath_tpu.dynamics.joint import (
    fixed_joints,
    revolute_joints,
    spherical_joints,
)
from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.pipeline import PipelineConfig, new_state, step_checked
from wgmath_tpu.shapes import ShapeSet

CFG = PipelineConfig(pair_capacity=64, max_colors=8, broad_phase_block=64)


def _two_ball_world(pos_b, dynamic_a=False):
    n = 2
    shapes = ShapeSet.balls(jnp.asarray([0.2, 0.2]))
    poses = sim_ops.from_parts(
        jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (n, 1)),
        jnp.asarray([[0.0, 0.0, 0.0], pos_b], jnp.float32))
    mp = ball_local_mprops(jnp.asarray([0.2, 0.2]),
                           dynamic=jnp.asarray([dynamic_a, True]))
    return Bodies(poses, Velocity.zero(n, 3), mp), shapes


def test_spherical_pendulum_preserves_anchor():
    bodies, shapes = _two_ball_world([1.0, 0.0, 0.0])
    joints = spherical_joints([0], [1], [[0.0, 0.0, 0.0]], [[-1.0, 0.0, 0.0]],
                              dynamic_mask=np.asarray([False, True]))
    state = new_state(bodies, shapes, joints)
    params = SimParams()
    cfg = CFG
    for _ in range(90):
        state, cfg = step_checked(state, params, cfg)
    p = state.bodies.poses
    # the body-local anchor (−1,0,0) must stay at the world pivot (origin)
    anchor_world = sim_ops.mul_pt(
        sim_ops.Sim(p.rotation[1:2], p.translation[1:2], p.scale[1:2]),
        jnp.asarray([[-1.0, 0.0, 0.0]]))
    err = float(jnp.linalg.norm(anchor_world))
    assert err < 0.02, err
    # it must actually have swung (gravity is on)
    assert float(p.translation[1, 1]) < -0.3


def test_fixed_joint_holds_pose():
    bodies, shapes = _two_ball_world([0.7, 0.0, 0.0])
    joints = fixed_joints([0], [1], [[0.7, 0.0, 0.0]], [[0.0, 0.0, 0.0]],
                          dynamic_mask=np.asarray([False, True]))
    state = new_state(bodies, shapes, joints)
    params = SimParams()
    cfg = CFG
    for _ in range(90):
        state, cfg = step_checked(state, params, cfg)
    p = np.asarray(state.bodies.poses.translation[1])
    np.testing.assert_allclose(p, [0.7, 0.0, 0.0], atol=0.02)
    q = np.asarray(state.bodies.poses.rotation[1])
    assert abs(abs(q[3]) - 1.0) < 1e-2  # no rotation accumulated


def test_revolute_swings_in_plane():
    # hinge about z at origin; body starts along +x → swings in the xy plane
    bodies, shapes = _two_ball_world([1.0, 0.0, 0.0])
    joints = revolute_joints([0], [1], [[0.0, 0.0, 0.0]], [[-1.0, 0.0, 0.0]],
                             axes=[[0.0, 0.0, 1.0]],
                             dynamic_mask=np.asarray([False, True]))
    state = new_state(bodies, shapes, joints)
    params = SimParams()
    cfg = CFG
    min_y = 0.0
    for _ in range(60):
        state, cfg = step_checked(state, params, cfg)
        min_y = min(min_y, float(state.bodies.poses.translation[1, 1]))
    t = np.asarray(state.bodies.poses.translation[1])
    assert abs(t[2]) < 0.01, t  # no out-of-plane drift
    assert abs(np.linalg.norm(t) - 1.0) < 0.02, t  # pivot distance kept
    # swung through the bottom at some point during the 1 s (T/4 ≈ 0.5 s)
    assert min_y < -0.7, min_y


def test_revolute_motor_reaches_target_velocity():
    params = SimParams(gravity=(0.0, 0.0, 0.0))
    bodies, shapes = _two_ball_world([1.0, 0.0, 0.0])
    # acceleration-based motor: effective time constant scales with
    # I_pivot/I_com (≈63 here) ÷ damping — damping 300 → τ ≈ 0.2 s
    joints = revolute_joints([0], [1], [[0.0, 0.0, 0.0]], [[-1.0, 0.0, 0.0]],
                             axes=[[0.0, 0.0, 1.0]], motor_vel=2.0,
                             motor_damping=300.0,
                             dynamic_mask=np.asarray([False, True]))
    state = new_state(bodies, shapes, joints)
    cfg = CFG
    for _ in range(90):
        state, cfg = step_checked(state, params, cfg)
    w = np.asarray(state.bodies.vels.angular[1])
    # relative angular velocity about the hinge axis approaches the target
    assert abs(w[2] - 2.0) < 0.2, w
    assert abs(w[0]) < 0.05 and abs(w[1]) < 0.05


def test_2d_revolute_pendulum():
    """2D pendulum: a disk revolute-jointed (the 2D hinge = locked lin x,y)
    to a static anchor swings in-plane with pivot distance preserved."""
    from wgmath_tpu.dynamics.joint import make_joint_set
    from wgmath_tpu.geometry.sim import Sim

    n = 2
    shapes = ShapeSet.balls(jnp.asarray([0.2, 0.2]), dim=2)
    poses = sim_ops.from_parts(jnp.tile(jnp.asarray([1.0, 0.0]), (n, 1)),
                               jnp.asarray([[0.0, 0.0], [1.0, 0.0]]))
    mp = ball_local_mprops(jnp.asarray([0.2, 0.2]), dim=2,
                           dynamic=jnp.asarray([False, True]))
    bodies = Bodies(poses, Velocity.zero(n, 2), mp)
    rot_id = jnp.tile(jnp.asarray([1.0, 0.0]), (1, 1))
    fa = Sim(rot_id, jnp.asarray([[0.0, 0.0]]), jnp.ones((1,)))
    fb = Sim(rot_id, jnp.asarray([[-1.0, 0.0]]), jnp.ones((1,)))
    joints = make_joint_set([0], [1], fa, fb,
                            locked_axes=np.asarray([0b011], np.int32),
                            dynamic_mask=np.asarray([False, True]))
    state = new_state(bodies, shapes, joints)
    params = SimParams()
    cfg = CFG
    min_y = 0.0
    for _ in range(60):
        state, cfg = step_checked(state, params, cfg)
        min_y = min(min_y, float(state.bodies.poses.translation[1, 1]))
    t = np.asarray(state.bodies.poses.translation[1])
    assert abs(np.linalg.norm(t) - 1.0) < 0.02, t
    assert min_y < -0.7, min_y


def test_2d_prismatic_slider_limits():
    """2D prismatic chain link slides only along its diagonal axis and stops
    at the travel limits (≙ joint_prismatic2.rs:40-49 behavior)."""
    from wgmath_tpu.dynamics.joint import prismatic_joints

    n = 2
    shapes = ShapeSet.balls(jnp.asarray([0.2, 0.2]), dim=2)
    poses = sim_ops.from_parts(jnp.tile(jnp.asarray([1.0, 0.0]), (n, 1)),
                               jnp.asarray([[0.0, 0.0], [0.0, -1.0]]))
    mp = ball_local_mprops(jnp.asarray([0.2, 0.2]), dim=2,
                           dynamic=jnp.asarray([False, True]))
    bodies = Bodies(poses, Velocity.zero(n, 2), mp)
    s = 2.0 ** -0.5
    joints = prismatic_joints([0], [1], [[0.0, 0.0]], [[0.0, 1.0]],
                              [[s, s]], limits=(-1.5, 1.5), dim=2,
                              dynamic_mask=np.asarray([False, True]))
    state = new_state(bodies, shapes, joints)
    params = SimParams()
    cfg = CFG
    for _ in range(120):
        state, cfg = step_checked(state, params, cfg)
    t = np.asarray(state.bodies.poses.translation[1])
    # the anchor offset (0,-1) is fixed; displacement from it stays on the
    # slide axis (perp component ~0) and within the 1.5 travel limit
    d = t - np.asarray([0.0, -1.0])
    perp = abs(-s * d[0] + s * d[1])
    along = s * d[0] + s * d[1]
    assert perp < 0.02, (t, perp)
    assert -1.55 < along < 1.55, (t, along)
    # gravity pulls the slider downhill to the low end of its travel
    assert along < -1.3, along


def test_2d_fixed_net_rigid():
    """2D fixed-joint net: every link keeps its rest offset (the net moves
    as one rigid assembly off the static left column)."""
    from wgmath_tpu.scenes.builders import joint_net2

    state = joint_net2(4, 4, joint="fixed")
    params = SimParams()
    cfg = CFG
    p0 = np.asarray(state.bodies.poses.translation).copy()
    for _ in range(60):
        state, cfg = step_checked(state, params, cfg)
    p = np.asarray(state.bodies.poses.translation)
    # offsets between vertically adjacent bodies stay ~the rest offset
    d = np.linalg.norm(p[1:] - p[:-1], axis=-1)
    d0 = np.linalg.norm(p0[1:] - p0[:-1], axis=-1)
    assert np.max(np.abs(d - d0)) < 0.06, np.max(np.abs(d - d0))


def test_spherical_swing_cone_limit():
    """Coupled angular limit (swing cone): a ball-jointed pendulum released
    horizontally may not swing past the 35-degree cone about the anchor
    frame's +x (the reference stubs limit_angular_coupled out;
    joint_constraint_builder.wgsl:334-348)."""
    from wgmath_tpu.geometry import quat

    bodies, shapes = _two_ball_world([1.0, 0.0, 0.0])
    half = np.deg2rad(35.0)
    joints = spherical_joints([0], [1], [[0.0, 0.0, 0.0]],
                              [[-1.0, 0.0, 0.0]], swing_limit=half,
                              dynamic_mask=np.asarray([False, True]))
    state = new_state(bodies, shapes, joints)
    params = SimParams()
    cfg = CFG
    max_swing = 0.0
    for _ in range(120):
        state, cfg = step_checked(state, params, cfg)
        # swing angle = angle between the anchor frame's +x (world x: the
        # static anchor never rotates) and the pendulum's joint frame +x
        q = np.asarray(state.bodies.poses.translation[1])
        # the anchor point is body 0 at the origin; frame2's +x in world =
        # direction from the pivot to the bob (anchor_b = -x in b's frame)
        d = q / max(np.linalg.norm(q), 1e-9)
        max_swing = max(max_swing, float(np.arccos(np.clip(d[0], -1, 1))))
    # released at 90 deg (horizontal = x axis IS the frame axis: swing 0)...
    # gravity pulls -y, so the bob tries to hang at 90 deg swing; the cone
    # must stop it near 35 deg (soft-constraint overshoot allowed)
    assert max_swing < half + np.deg2rad(8.0), np.rad2deg(max_swing)
    # and it must actually have swung into the limit, not frozen
    assert max_swing > np.deg2rad(25.0), np.rad2deg(max_swing)


def test_jointed_scene_on_chained_fast_paths():
    """VERDICT r04 #5: jointed scenes must not silently fall off the fast
    solver paths. The chained + rhs-in-rung sweep (and the pair-slot
    layout on top) now runs the per-substep joint passes AROUND the
    chained contact sweeps — trajectories must match the classic ladder
    path to fp noise on a scene with BOTH joints and contacts (a fixed
    chain draping onto a ground slab)."""
    import dataclasses

    from wgmath_tpu.dynamics import cuboid_local_mprops
    from wgmath_tpu.dynamics.body import LocalMassProperties
    from wgmath_tpu.pipeline import step

    def scene():
        # ground slab first (hub-row convention), then a 5-ball chain
        # anchored 1.2 m up — the free links drape onto the ground
        n_links, r = 4, 0.2
        n = n_links + 2
        shapes = ShapeSet.concat(
            ShapeSet.cuboids(jnp.asarray([[10.0, 0.5, 10.0]])),
            ShapeSet.balls(jnp.full((n_links + 1,), r)))
        trans = np.zeros((n, 3), np.float32)
        trans[0] = (0.0, -0.5, 0.0)
        trans[1] = (0.0, 1.2, 0.0)
        for i in range(n_links):
            trans[2 + i] = ((i + 1) * 0.5, 1.2, 0.0)
        poses = sim_ops.from_parts(
            jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (n, 1)),
            jnp.asarray(trans))
        dynamic = np.ones(n, bool)
        dynamic[:2] = False
        gm = cuboid_local_mprops(jnp.asarray([[10.0, 0.5, 10.0]]),
                                 dynamic=jnp.asarray([False]))
        bm = ball_local_mprops(jnp.full((n_links + 1,), r),
                               dynamic=jnp.asarray(dynamic[1:]))
        mp = LocalMassProperties(
            jnp.concatenate([gm.inv_mass, bm.inv_mass]),
            jnp.concatenate([gm.com, bm.com]),
            jnp.concatenate([gm.inertia_ref_frame, bm.inertia_ref_frame]),
            jnp.concatenate([gm.inv_principal_inertia,
                             bm.inv_principal_inertia]))
        bodies = Bodies(poses, Velocity.zero(n, 3), mp)
        joints = spherical_joints(
            list(range(1, n_links + 1)), list(range(2, n_links + 2)),
            [[0.25, 0.0, 0.0]] * n_links, [[-0.25, 0.0, 0.0]] * n_links,
            dynamic_mask=dynamic)
        return new_state(bodies, shapes, joints)

    from wgmath_tpu.pipeline import PipelineConfig as PC
    params = SimParams()
    base = PC(pair_capacity=128, contact_capacity=64, max_colors=4,
              manifold_points=1, bp_algo="grid", bp_slack=0.03,
              gs_cmax=64, gs_windows=(64,) * 4, broad_phase_block=64)
    cfgs = {
        "ladder": base,
        "chained_rr": dataclasses.replace(base, gs_chained=True,
                                          gs_rhs_in_rung=True),
        "chained_ps": dataclasses.replace(base, gs_chained=True,
                                          gs_rhs_in_rung=True,
                                          gs_pair_slots=True),
    }
    trs = {}
    for name, cfg in cfgs.items():
        st = scene()
        for f in range(40):
            st = step(st, params, cfg, warmstart=f > 0)
        trs[name] = np.asarray(st.bodies.poses.translation)
        assert np.isfinite(trs[name]).all(), name
    # the chain actually draped: free links fell and rest near the ground
    assert trs["ladder"][-1, 1] < 0.9
    assert trs["ladder"][-1, 1] > 0.1
    for name in ("chained_rr", "chained_ps"):
        err = np.abs(trs[name] - trs["ladder"]).max()
        assert err < 1e-4, (name, err)
