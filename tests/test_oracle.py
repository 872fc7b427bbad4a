"""Cross-validation of the JAX physics pipeline against the independent f64
numpy oracle (tests/physics_oracle.py) — role ≙ the reference's CPU(rapier)
backend oracle (src_testbed/backend/cpu.rs:27, backend/mod.rs:24).

Tolerances: the implementations share semantics but differ in precision
(f32 vs f64), Gauss-Seidel ORDER (colored windows vs sequential), and
contact generation code paths — agreement is expected to a few mm over a
hundred 60 Hz frames on smooth scenes, and at equilibrium for stacks."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tests.physics_oracle import (
    OracleParams,
    SphericalJoint,
    ball_body,
    box_body,
    oracle_step,
)
from wgmath_tpu.dynamics import SimParams
from wgmath_tpu.dynamics.body import (
    Bodies,
    LocalMassProperties,
    Velocity,
    ball_local_mprops,
    cuboid_local_mprops,
)
from wgmath_tpu.geometry import quat
from wgmath_tpu.geometry.sim import Sim
from wgmath_tpu.pipeline import PipelineConfig, new_state, step
from wgmath_tpu.shapes.shape import ShapeSet


def _concat_mprops(*parts: LocalMassProperties) -> LocalMassProperties:
    return LocalMassProperties(
        jnp.concatenate([p.inv_mass for p in parts]),
        jnp.concatenate([p.com for p in parts]),
        jnp.concatenate([p.inertia_ref_frame for p in parts]),
        jnp.concatenate([p.inv_principal_inertia for p in parts]),
    )


def _scene(ball_pos, ball_r, ground_he=(5.0, 0.5, 5.0),
           ground_y=-0.5):
    """Static ground box (first, per the hub-row convention) + dynamic
    balls. Returns (state, oracle_bodies)."""
    ball_pos = np.asarray(ball_pos, np.float32)
    n_b = len(ball_pos)
    shapes = ShapeSet.concat(
        ShapeSet.cuboids(jnp.asarray([ground_he], jnp.float32)),
        ShapeSet.balls(jnp.full((n_b,), ball_r, jnp.float32)))
    pos = jnp.concatenate([
        jnp.asarray([[0.0, ground_y, 0.0]], jnp.float32),
        jnp.asarray(ball_pos, jnp.float32)])
    n = n_b + 1
    poses = Sim(quat.identity((n,)), pos, jnp.ones((n,), jnp.float32))
    mp = _concat_mprops(
        cuboid_local_mprops(jnp.asarray([ground_he], jnp.float32),
                            dynamic=jnp.zeros(1, bool)),
        ball_local_mprops(jnp.full((n_b,), ball_r, jnp.float32)))
    bodies = Bodies(poses, Velocity.zero(n, 3), mp)
    state = new_state(bodies, shapes)

    oracle = [box_body([0.0, ground_y, 0.0], ground_he, static=True)]
    for p in ball_pos:
        oracle.append(ball_body(p, ball_r))
    return state, oracle


CFG = PipelineConfig(pair_capacity=1024, contact_capacity=1024,
                     max_colors=8, manifold_points=1)


def _run_both(state, oracle, frames, joints=()):
    params = SimParams()
    op = OracleParams()
    jax_tr, orc_tr = [], []
    prev = None
    for f in range(frames):
        state = step(state, params, CFG, warmstart=f > 0)
        prev = oracle_step(oracle, op, joints=joints, prev_impulses=prev)
        jax_tr.append(np.asarray(state.bodies.poses.translation))
        orc_tr.append(np.stack([b.pos for b in oracle]))
    return np.stack(jax_tr), np.stack(orc_tr)


def test_oracle_ball_drop_and_rest():
    """A ball falling 0.7 m onto the ground: free flight, impact, and rest
    must track the f64 oracle within 2 mm at every frame (single contact —
    no ordering ambiguity between the solvers)."""
    state, oracle = _scene([[0.0, 1.2, 0.0]], 0.5)
    jax_tr, orc_tr = _run_both(state, oracle, 100)
    err = np.abs(jax_tr[:, 1] - orc_tr[:, 1]).max(axis=-1)
    assert err.max() < 2e-3, (err.max(), err.argmax())
    # and it actually rested on the ground (soft-constraint equilibrium)
    assert abs(jax_tr[-1, 1, 1] - orc_tr[-1, 1, 1]) < 1e-3
    assert orc_tr[-1, 1, 1] == pytest.approx(0.5, abs=5e-3)


def test_oracle_ball_stack_settles_alike():
    """3-ball vertical stack: trajectories may diverge transiently (GS
    ordering differs) but the settled heights must agree to mm and the
    stack must not interpenetrate beyond the soft-constraint allowance."""
    state, oracle = _scene(
        [[0.0, 0.52, 0.0], [0.0, 1.55, 0.0], [0.0, 2.58, 0.0]], 0.5)
    jax_tr, orc_tr = _run_both(state, oracle, 150)
    # transient agreement: loose (different sweep order)
    err_all = np.abs(jax_tr[:, 1:] - orc_tr[:, 1:]).max()
    assert err_all < 5e-2, err_all
    # settled equilibrium: tight
    err_end = np.abs(jax_tr[-1, 1:] - orc_tr[-1, 1:]).max()
    assert err_end < 5e-3, (jax_tr[-1, 1:, 1], orc_tr[-1, 1:, 1])
    # penetration bound: each gap ≥ -(allowed_error + settle tolerance)
    ys = orc_tr[-1, 1:, 1]
    gaps = np.diff(np.concatenate([[0.0], ys])) - np.array([0.5, 1.0, 1.0])
    assert gaps.min() > -5e-3, gaps


def test_oracle_spherical_pendulum():
    """Ball on a 1 m spherical joint released horizontally: the swing
    trajectory (smooth, contact-free) must track the f64 oracle closely,
    and the joint must hold the length constraint."""
    from wgmath_tpu.dynamics.joint import spherical_joints

    n = 2
    shapes = ShapeSet.balls(jnp.asarray([0.1, 0.2], jnp.float32))
    pos = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    poses = Sim(quat.identity((n,)), pos, jnp.ones((n,), jnp.float32))
    mp = ball_local_mprops(jnp.asarray([0.1, 0.2], jnp.float32),
                           dynamic=jnp.asarray([False, True]))
    bodies = Bodies(poses, Velocity.zero(n, 3), mp)
    jset = spherical_joints([0], [1], [[0.0, 0.0, 0.0]], [[-1.0, 0.0, 0.0]],
                            dynamic_mask=np.asarray([False, True]))
    state = new_state(bodies, shapes, joints=jset)

    oracle = [ball_body([0.0, 0.0, 0.0], 0.1, static=True),
              ball_body([1.0, 0.0, 0.0], 0.2)]
    joints = [SphericalJoint(0, 1, [0.0, 0.0, 0.0], [-1.0, 0.0, 0.0])]

    jax_tr, orc_tr = _run_both(state, oracle, 120, joints=joints)
    # early trajectory (first 2/3 swing): tight semantic agreement. Beyond
    # that f32-vs-f64 phase drift dominates (measured: error grows smoothly
    # with swing speed, peaks ~5 cm near max velocity, and collapses back
    # to <1 mm when the phases realign at frame 119) — bound it loosely.
    err_early = np.abs(jax_tr[:30, 1] - orc_tr[:30, 1]).max()
    assert err_early < 5e-3, err_early
    err = np.abs(jax_tr[:, 1] - orc_tr[:, 1]).max()
    assert err < 8e-2, err
    # joint holds: |p| stays 1 within the soft-constraint tolerance
    lengths = np.linalg.norm(jax_tr[:, 1], axis=-1)
    assert np.abs(lengths - 1.0).max() < 1e-2
    # it actually swings (reaches below -0.5 in y within 120 frames)
    assert jax_tr[:, 1, 1].min() < -0.5


def test_oracle_ball_drop_fused_path():
    """The fused-solver path (gs_fused kernels) must track the independent
    f64 oracle exactly like the ladder path does — physics quality, not
    just ladder-equivalence. Same scene/tolerances as
    test_oracle_ball_drop_and_rest, with the fused pipeline config
    (bp_slack + pair-color cache gates it on)."""
    import dataclasses

    state, oracle = _scene([[0.0, 1.2, 0.0]], 0.5)
    cfg = dataclasses.replace(CFG, bp_slack=0.03, gs_cmax=64,
                              bp_algo="grid", gs_fused=True, gs_rung0=256,
                              gs_windows=(256,) * CFG.max_colors)
    params = SimParams()
    op = OracleParams()
    jax_tr, orc_tr = [], []
    prev = None
    for f in range(100):
        state = step(state, params, cfg, warmstart=f > 0)
        prev = oracle_step(oracle, op, prev_impulses=prev)
        jax_tr.append(np.asarray(state.bodies.poses.translation))
        orc_tr.append(np.stack([b.pos for b in oracle]))
    jax_tr, orc_tr = np.stack(jax_tr), np.stack(orc_tr)
    err = np.abs(jax_tr[:, 1] - orc_tr[:, 1]).max(axis=-1)
    assert err.max() < 2e-3, (err.max(), err.argmax())
    assert abs(jax_tr[-1, 1, 1] - orc_tr[-1, 1, 1]) < 1e-3


def test_oracle_ball_drop_chained_uncapped():
    """The bench steady configuration — chained (scatter-free) sweep,
    per-class window ladder, slack-cached broad phase, effectively
    UNCAPPED class sizes (gs_cmax >> any class: round-3 finding that
    few/full color classes beat balanced ones for per-rung dispatch) —
    must track the f64 oracle like the plain ladder does."""
    import dataclasses

    state, oracle = _scene([[0.0, 1.2, 0.0]], 0.5)
    cfg = dataclasses.replace(CFG, bp_slack=0.035, gs_cmax=4096,
                              bp_algo="grid", gs_chained=True,
                              gs_windows=(256,) * CFG.max_colors)
    params = SimParams()
    op = OracleParams()
    jax_tr, orc_tr = [], []
    prev = None
    for f in range(100):
        state = step(state, params, cfg, warmstart=f > 0)
        prev = oracle_step(oracle, op, prev_impulses=prev)
        jax_tr.append(np.asarray(state.bodies.poses.translation))
        orc_tr.append(np.stack([b.pos for b in oracle]))
    jax_tr, orc_tr = np.stack(jax_tr), np.stack(orc_tr)
    err = np.abs(jax_tr[:, 1] - orc_tr[:, 1]).max(axis=-1)
    assert err.max() < 2e-3, (err.max(), err.argmax())
    assert abs(jax_tr[-1, 1, 1] - orc_tr[-1, 1, 1]) < 1e-3


def _conveyor_scene(ball_y=0.7505, belt_speed=1.0):
    """Kinematic platform (one-way coupling, ≙ BodyCoupling::OneWay,
    body.rs:169-192) + one dynamic ball resting on it. Returns
    (state, oracle_bodies)."""
    plat_he = (3.0, 0.25, 3.0)
    shapes = ShapeSet.concat(
        ShapeSet.cuboids(jnp.asarray([plat_he], jnp.float32)),
        ShapeSet.balls(jnp.asarray([0.5], jnp.float32)))
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.0, ball_y, 0.0]], jnp.float32)
    poses = Sim(quat.identity((2,)), pos, jnp.ones((2,), jnp.float32))
    mp = _concat_mprops(
        cuboid_local_mprops(jnp.asarray([plat_he], jnp.float32),
                            dynamic=jnp.zeros(1, bool)),
        ball_local_mprops(jnp.asarray([0.5], jnp.float32)))
    vels = Velocity.zero(2, 3)
    vels = Velocity(vels.linear.at[0, 0].set(belt_speed), vels.angular)
    bodies = Bodies(poses, vels, mp, jnp.asarray([True, False]))
    state = new_state(bodies, shapes)

    plat = box_body([0.0, 0.0, 0.0], plat_he, static=True)
    plat.kinematic = True
    plat.linvel = np.array([belt_speed, 0.0, 0.0])
    oracle = [plat, ball_body([0.0, float(ball_y), 0.0], 0.5)]
    return state, oracle


def test_oracle_kinematic_conveyor():
    """One-way coupling end-to-end: the platform's prescribed velocity
    integrates its pose at exactly belt_speed·t (never deflected by the
    ball's weight — infinite effective mass), while friction against the
    moving surface drags the resting ball up to belt speed. Both the JAX
    pipeline and the independent f64 oracle implement the same semantics,
    so trajectories must agree to mm."""
    frames, dt, belt = 90, 1.0 / 60.0, 1.0
    state, oracle = _conveyor_scene(belt_speed=belt)
    params = SimParams()
    op = OracleParams()
    jax_tr, orc_tr, jax_v = [], [], []
    prev = None
    for f in range(frames):
        state = step(state, params, CFG, warmstart=f > 0)
        prev = oracle_step(oracle, op, prev_impulses=prev)
        jax_tr.append(np.asarray(state.bodies.poses.translation))
        orc_tr.append(np.stack([b.pos for b in oracle]))
        jax_v.append(np.asarray(state.bodies.vels.linear))
    jax_tr, orc_tr = np.stack(jax_tr), np.stack(orc_tr)
    jax_v = np.stack(jax_v)

    # platform rides its prescribed velocity exactly: x = belt·t, y/z fixed,
    # velocity never changed by the solve (one-way: pushed-by nothing)
    t = dt * np.arange(1, frames + 1)
    np.testing.assert_allclose(jax_tr[:, 0, 0], belt * t, rtol=0, atol=1e-5)
    np.testing.assert_allclose(jax_tr[:, 0, 1:], 0.0, atol=1e-6)
    np.testing.assert_allclose(jax_v[:, 0, 0], belt, atol=1e-6)
    np.testing.assert_allclose(orc_tr[:, 0, 0], belt * t, atol=1e-9)

    # belt friction both drags AND spins the free ball: slip closes when the
    # contact point matches belt speed (v + ω·r = belt), which for a uniform
    # sphere (I = 2/5 m r²) lands at v = belt/(1 + 5/2) = 2/7·belt — it then
    # rolls for ever (no rolling resistance, same as the reference)
    assert jax_v[-1, 1, 0] == pytest.approx(2.0 / 7.0 * belt, abs=2e-2)
    wz = float(np.asarray(state.bodies.vels.angular)[1, 2])
    assert jax_v[-1, 1, 0] + wz * 0.5 == pytest.approx(belt, abs=2e-2)
    assert jax_tr[-1, 1, 0] > 0.3  # it actually traveled
    # f64 oracle cross-check: same semantics, mm agreement
    err = np.abs(jax_tr[:, 1] - orc_tr[:, 1]).max()
    assert err < 5e-3, err


def test_kinematic_platform_is_never_pushed():
    """A heavy ball slammed into the platform must not deflect the
    platform's velocity or trajectory (one-way coupling), on both the
    colored-GS and Jacobi solver paths."""
    for cfg in (CFG, dataclasses.replace(CFG, use_jacobi=True)):
        state, _ = _conveyor_scene(ball_y=1.5)
        # dense ball: 8 t — two-way coupling would visibly kick the belt
        st = state
        vel = st.bodies.vels
        vel = Velocity(vel.linear.at[1, 1].set(-8.0), vel.angular)
        mp = st.bodies.local_mprops
        mp = dataclasses.replace(
            mp, inv_mass=mp.inv_mass.at[1].mul(1e-3),
            inv_principal_inertia=mp.inv_principal_inertia.at[1].mul(1e-3))
        st = dataclasses.replace(
            st, bodies=Bodies(st.bodies.poses, vel, mp,
                              st.bodies.kinematic))
        params = SimParams()
        for f in range(60):
            st = step(st, params, cfg, warmstart=f > 0)
        pos = np.asarray(st.bodies.poses.translation)
        v = np.asarray(st.bodies.vels.linear)
        assert pos[0, 0] == pytest.approx(60.0 / 60.0, abs=1e-5)
        assert abs(pos[0, 1]) < 1e-6 and abs(pos[0, 2]) < 1e-6
        np.testing.assert_allclose(v[0], [1.0, 0.0, 0.0], atol=1e-6)
        # ...and the ball DID interact: stopped by the platform (an 8 t
        # ball's deep impact recovers over tens of frames under the
        # max_corrective_velocity clamp), not fallen through
        assert pos[1, 1] > 0.6, pos[1]
        assert abs(v[1, 1]) < 0.5, v[1]
