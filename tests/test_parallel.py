"""Sharded-step tests on the virtual 8-device CPU mesh: the sharded pipeline
must match the single-device pipeline bit-for-bit (same math, different
partitioning)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgmath_tpu.dynamics import SimParams
from wgmath_tpu.parallel import body_mesh, make_sharded_step, shard_state
from wgmath_tpu.pipeline import PipelineConfig, step
from wgmath_tpu.scenes.builders import balls


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_sharded_step_matches_single_device(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    params = SimParams()
    config = PipelineConfig(pair_capacity=2048, max_colors=8, max_per_body=16,
                            broad_phase_block=64)
    state = balls(63, dim=3)  # 64 bodies incl. ground; pads to 64 for 8 dev

    ref = step(state, params, config, warmstart=False)

    mesh = body_mesh(n_dev)
    bodies, shapes = shard_state(state, mesh)
    fn = make_sharded_step(mesh, params, config)
    out_bodies, pair_count = fn(bodies, shapes)

    n = state.bodies.num_bodies
    np.testing.assert_allclose(
        np.asarray(out_bodies.poses.translation)[:n],
        np.asarray(ref.bodies.poses.translation), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_bodies.vels.linear)[:n],
        np.asarray(ref.bodies.vels.linear), rtol=1e-5, atol=1e-6)
    assert int(pair_count) == int(np.asarray(ref.pair_count)[0])


def test_sharded_multi_step_stable():
    params = SimParams()
    config = PipelineConfig(pair_capacity=2048, max_colors=8, max_per_body=16,
                            broad_phase_block=64)
    state = balls(63, dim=3)
    mesh = body_mesh(8)
    bodies, shapes = shard_state(state, mesh)
    fn = make_sharded_step(mesh, params, config)
    for _ in range(5):
        bodies, _ = fn(bodies, shapes)
    assert np.all(np.isfinite(np.asarray(bodies.poses.translation)))


def test_sharded_solve_matches_on_contact_rich_pile():
    """Settle a pile single-device first, then compare one sharded-solve
    step (color windows split across 8 devices + per-color psum) against the
    SAME pipeline with a replicated solve — the window split must not change
    the math. (Comparing against the single-device pipeline instead would
    conflate this with constraint-order sensitivity: the gathered pair list
    orders constraints differently and Gauss-Seidel is order-dependent, so
    the two pipelines agree only to solver tolerance, not bitwise.)"""
    import wgmath_tpu.parallel.sharded as sh
    from wgmath_tpu.dynamics import solver as S

    params = SimParams()
    config = PipelineConfig(pair_capacity=2048, max_colors=16,
                            max_per_body=16, broad_phase_block=64)
    state = balls(127, dim=3)
    for f in range(40):  # contact-rich settled pile
        state = step(state, params, config, warmstart=f > 0)
    assert int(np.asarray(state.pair_count)[1]) > 60

    ref = step(state, params, config, warmstart=False)

    mesh = body_mesh(8)
    bodies, shapes = shard_state(state, mesh)

    orig_solve = S.solve

    def solve_replicated(*a, **k):
        k["shard"] = None
        return orig_solve(*a, **k)

    sh.solve = solve_replicated
    try:
        out_r, _ = make_sharded_step(mesh, params, config)(bodies, shapes)
    finally:
        sh.solve = orig_solve
    out_s, _ = make_sharded_step(mesh, params, config)(bodies, shapes)

    n = state.bodies.num_bodies
    for f in ("linear", "angular"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_s.vels, f))[:n],
            np.asarray(getattr(out_r.vels, f))[:n], rtol=1e-4, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out_s.poses.translation)[:n],
        np.asarray(out_r.poses.translation)[:n], rtol=1e-5, atol=1e-6)
    # and both stay physically consistent with the single-device step
    # (order-tolerant bound: GS converges to the same contact solution)
    np.testing.assert_allclose(
        np.asarray(out_s.poses.translation)[:n],
        np.asarray(ref.bodies.poses.translation), rtol=1e-3, atol=1e-3)


def test_full_pipeline_sharded_matches_single_device():
    """Round-2 scale-out (VERDICT #3): the FULL pipeline — grid broad
    phase, slack/velocity BP cache, pair-color cache, color-major
    compaction, warmstart — sharded over the 8-device mesh, matching the
    single-device step to float tolerance frame by frame."""
    import dataclasses

    from wgmath_tpu.parallel.sharded_pipeline import (
        make_sharded_step,
        replicate_state,
    )
    from wgmath_tpu.pipeline import PipelineConfig, step
    from wgmath_tpu.scenes.builders import balls

    params = SimParams()
    cfg = PipelineConfig(pair_capacity=2048, contact_capacity=1024,
                         max_colors=12, gs_cmax=256, bp_slack=0.03,
                         bp_algo="grid", manifold_points=1)
    state = balls(192, dim=3)
    for f in range(25):  # warm: free fall → impact → caches materialized
        state = step(state, params, cfg, warmstart=f > 0)

    mesh = body_mesh(8)
    sstep = make_sharded_step(mesh, params, cfg, n_steps=1)
    sh = replicate_state(state, mesh)
    sd = state
    for f in range(6):
        sh = sstep(sh)
        sd = step(sd, params, cfg, warmstart=True)
        np.testing.assert_allclose(
            np.asarray(sh.bodies.poses.translation),
            np.asarray(sd.bodies.poses.translation), atol=1e-5,
            err_msg=f"frame {f}")
    # caches agree too: same pair list in the BP cache
    np.testing.assert_array_equal(np.asarray(sh.bp_pairs.body_a),
                                  np.asarray(sd.bp_pairs.body_a))
    np.testing.assert_array_equal(np.asarray(sh.bp_pairs.valid),
                                  np.asarray(sd.bp_pairs.valid))
    assert np.isfinite(np.asarray(sh.bodies.poses.translation)).all()


def test_full_pipeline_sharded_with_joints():
    """Sharded path carries joint constraints (solved replicated)."""
    from wgmath_tpu.parallel.sharded_pipeline import (
        make_sharded_step,
        replicate_state,
    )
    from wgmath_tpu.pipeline import PipelineConfig, step
    from wgmath_tpu.scenes.builders import pendulum_chain

    params = SimParams()
    cfg = PipelineConfig(pair_capacity=256, max_colors=8,
                         manifold_points=1)
    state = pendulum_chain(6, joint="spherical")
    for f in range(5):
        state = step(state, params, cfg, warmstart=f > 0)
    mesh = body_mesh(8)
    sstep = make_sharded_step(mesh, params, cfg, n_steps=1)
    sh = replicate_state(state, mesh)
    sd = state
    for _ in range(5):
        sh = sstep(sh)
        sd = step(sd, params, cfg, warmstart=True)
    np.testing.assert_allclose(np.asarray(sh.bodies.poses.translation),
                               np.asarray(sd.bodies.poses.translation),
                               atol=1e-5)
    # chain holds together under the sharded solve
    tr = np.asarray(sh.bodies.poses.translation)
    assert np.isfinite(tr).all()


def test_full_pipeline_sharded_window_ladder_matches():
    """VERDICT r04 #3: the per-class window LADDER — the solve layout every
    winning single-chip candidate builds on — now runs under shard_map too
    (each rung splits across the mesh with one per-rung psum of velocity
    deltas; solve() rounds rungs up to device-count multiples). Sharded
    ladder steps must match the single-device ladder step frame by frame."""
    import dataclasses

    from wgmath_tpu.parallel.sharded_pipeline import (
        make_sharded_step,
        replicate_state,
    )
    from wgmath_tpu.pipeline import PipelineConfig, step
    from wgmath_tpu.scenes.builders import balls

    params = SimParams()
    cfg = PipelineConfig(pair_capacity=2048, contact_capacity=1024,
                         max_colors=12, gs_cmax=256, bp_slack=0.03,
                         bp_algo="grid", manifold_points=1,
                         gs_windows=(128,) * 12)
    state = balls(192, dim=3)
    for f in range(25):
        state = step(state, params, cfg, warmstart=f > 0)

    mesh = body_mesh(8)
    sstep = make_sharded_step(mesh, params, cfg, n_steps=1)
    sh = replicate_state(state, mesh)
    sd = state
    for f in range(5):
        sh = sstep(sh)
        sd = step(sd, params, cfg, warmstart=True)
        np.testing.assert_allclose(
            np.asarray(sh.bodies.poses.translation),
            np.asarray(sd.bodies.poses.translation), atol=1e-5,
            err_msg=f"frame {f}")
    assert np.isfinite(np.asarray(sh.bodies.poses.translation)).all()
