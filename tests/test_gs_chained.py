"""Chained (scatter-free) GS sweep vs the ladder reference pass.

The chained sweep (solver.build_gs_chain + gs_color_major_pass(chain=...))
replaces each color's scatter-add with a contiguous static-offset stream
write and gathers through a cached last-writer index chain. It must
reproduce the ladder sweep up to one float re-association per velocity
write (stream stores ``v + d`` where the ladder computes ``v + (v+d - v)``).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from wgmath_tpu.dynamics import SimParams
from wgmath_tpu.dynamics.solver import build_gs_chain, gs_color_major_pass
from wgmath_tpu.pipeline import PipelineConfig, step, step_checked

from tests.test_gs_fused import _random_setup


@pytest.mark.parametrize("seed", [0, 1])
def test_chained_sweep_matches_ladder_pass(seed):
    (bodies, mprops, cons, ss, packed_fields, layout, windows, n_colors,
     ctot, n) = _random_setup(seed=seed)
    p_max, s_len = 1, 2
    vels = bodies.vels
    prev_n = jnp.asarray(
        np.random.default_rng(seed + 7).uniform(0, 0.1, (ctot, p_max)),
        jnp.float32)
    prev_t = jnp.zeros((ctot, p_max, s_len), jnp.float32)

    ref_v, ref_n, ref_t = gs_color_major_pass(
        ss, vels, prev_n, prev_t, layout, jnp.int32(n_colors),
        cmax=max(windows), dim=3, packed_fields=packed_fields,
        windows=windows)

    dyn_a = jnp.any(ss.im_a != 0.0, axis=-1)
    dyn_b = jnp.any(ss.im_b != 0.0, axis=-1)
    chain = build_gs_chain(ss.body_a, ss.body_b, dyn_a, dyn_b,
                           layout[1], layout[2], windows, n)
    out_v, out_n, out_t = gs_color_major_pass(
        ss, vels, prev_n, prev_t, layout, jnp.int32(n_colors),
        cmax=max(windows), dim=3, packed_fields=packed_fields,
        windows=windows, chain=chain)

    np.testing.assert_allclose(np.asarray(out_v.linear),
                               np.asarray(ref_v.linear), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_v.angular),
                               np.asarray(ref_v.angular), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(ref_n),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t),
                               rtol=1e-5, atol=1e-7)


def test_chain_last_writer_untouched_bodies_identity():
    (bodies, mprops, cons, ss, packed_fields, layout, windows, n_colors,
     ctot, n) = _random_setup(seed=3)
    dyn_a = jnp.any(ss.im_a != 0.0, axis=-1)
    dyn_b = jnp.any(ss.im_b != 0.0, axis=-1)
    src, last_writer = build_gs_chain(ss.body_a, ss.body_b, dyn_a, dyn_b,
                                      layout[1], layout[2], windows, n)
    lw = np.asarray(last_writer)
    touched = set()
    ba, bb = np.asarray(ss.body_a), np.asarray(ss.body_b)
    da, db = np.asarray(dyn_a), np.asarray(dyn_b)
    counts = np.asarray(layout[2])
    offsets = np.asarray(layout[1])
    for ci, w in enumerate(windows, start=1):
        for s in range(min(w, int(counts[ci]))):
            row = int(offsets[ci]) + s
            if da[row]:
                touched.add(int(ba[row]))
            if db[row]:
                touched.add(int(bb[row]))
    for b in range(n):
        if b not in touched:
            assert lw[b] == b, (b, lw[b])
        else:
            assert lw[b] >= n, (b, lw[b])
    assert np.asarray(src).shape == (2 * sum(windows),)


def test_pipeline_gs_chained_matches_ladder():
    """Wiring test: the chained pipeline path (cached chain in the solve
    bundle) advances a settled pile the same way as the ladder path from
    an identical warmed state, and stays coherent across cache hits,
    misses, and regrows."""
    from wgmath_tpu.pipeline import PipelineConfig, step, step_checked
    from wgmath_tpu.scenes.builders import balls

    params = SimParams()
    base = PipelineConfig(pair_capacity=2048, contact_capacity=1024,
                          max_colors=12, gs_cmax=256, bp_slack=0.03,
                          bp_algo="grid", manifold_points=1,
                          gs_windows=(256,) * 12)
    state = balls(160, dim=3)
    cfg = base
    for _ in range(30):
        state, cfg = step_checked(state, params, cfg)
    cfg_c = dataclasses.replace(cfg, gs_chained=True)

    s_lad = step(state, params, cfg, warmstart=True)
    s_chn = step(state, params, cfg_c, warmstart=True)
    np.testing.assert_allclose(
        np.asarray(s_chn.bodies.vels.linear),
        np.asarray(s_lad.bodies.vels.linear), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_chn.bodies.poses.translation),
        np.asarray(s_lad.bodies.poses.translation), rtol=1e-5, atol=1e-6)

    # multi-frame: the chained path keeps its own caches coherent (the
    # chain rides the solve bundle under the stable-keys cond)
    sc, cc = s_chn, cfg_c
    for _ in range(10):
        sc, cc = step_checked(sc, params, cc)
    assert np.isfinite(np.asarray(sc.bodies.poses.translation)).all()
    # and still tracks the ladder run loosely after 10 more frames
    sl, cl = s_lad, cfg
    for _ in range(10):
        sl, cl = step_checked(sl, params, cl)
    np.testing.assert_allclose(
        np.asarray(sc.bodies.poses.translation),
        np.asarray(sl.bodies.poses.translation), rtol=1e-3, atol=1e-3)


def test_window_prune_matches_unpruned():
    """Trailing zero rungs (step_checked's prune past the last occupied
    class) must not change the physics: a pruned ladder and the same ladder
    with 256-row floor rungs produce identical steps (empty classes are
    no-ops either way)."""
    from wgmath_tpu.pipeline import PipelineConfig, step, step_checked
    from wgmath_tpu.scenes.builders import balls

    state = balls(300)
    params = SimParams()
    cfg = PipelineConfig(pair_capacity=8192, max_colors=8, gs_cmax=512,
                         broad_phase_block=256, bp_slack=0.02,
                         gs_windows=(256,) * 8, gs_chained=True)
    for _ in range(6):
        state, cfg = step_checked(state, params, cfg)
    assert 0 in cfg.gs_windows, cfg.gs_windows  # prune actually happened
    unpruned = dataclasses.replace(
        cfg, gs_windows=tuple(w or 256 for w in cfg.gs_windows))
    out_p = step(state, params, cfg)
    out_u = step(state, params, unpruned)
    np.testing.assert_array_equal(
        np.asarray(out_p.bodies.poses.translation),
        np.asarray(out_u.bodies.poses.translation))
    np.testing.assert_array_equal(
        np.asarray(out_p.bodies.vels.linear),
        np.asarray(out_u.bodies.vels.linear))


def test_fine_capacities_and_rung_quantum_regrow():
    """fine_capacities re-buckets pair/contact caps to ceil(1.1·n/1024)
    ·1024 and gs_rung_quantum/_headroom size the window ladder rungs —
    and the tightened configuration steps EXACTLY like the coarse one
    (capacities/windows are padding, never physics)."""
    from wgmath_tpu.pipeline import fine_bucket
    from wgmath_tpu.scenes.builders import balls

    assert fine_bucket(26186) == 29696
    assert fine_bucket(33914) == 37888
    assert fine_bucket(100) == 2048  # floor

    state = balls(300)
    params = SimParams()
    coarse = PipelineConfig(pair_capacity=8192, max_colors=8, gs_cmax=512,
                            broad_phase_block=256, bp_slack=0.02,
                            gs_windows=(256,) * 8, gs_chained=True)
    fine = dataclasses.replace(coarse, pair_capacity=2048,
                               contact_capacity=2048, fine_capacities=True,
                               gs_windows=(128,) * 8, gs_rung_quantum=128,
                               gs_rung_headroom=1.08)
    sc, cc = state, coarse
    sf, cf = state, fine
    for _ in range(8):
        sc, cc = step_checked(sc, params, cc)
        sf, cf = step_checked(sf, params, cf)
    # fine caps grew in 1024-quanta (not the 1.5x ladder)
    assert cf.pair_capacity % 1024 == 0
    assert cf.contact_capacity % 1024 == 0
    # rungs grew in 128-quanta
    assert all(w % 128 == 0 for w in cf.gs_windows)
    np.testing.assert_allclose(
        np.asarray(sc.bodies.poses.translation),
        np.asarray(sf.bodies.poses.translation), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sc.bodies.vels.linear),
        np.asarray(sf.bodies.vels.linear), atol=1e-5)


def test_pipeline_rhs_in_rung_matches_ladder():
    """The rhs-in-rung chained path (in-kernel substep relinearization,
    gs_pallas.gs_math_block_rhs) advances a settled pile like the ladder:
    same formula on the same substep-start poses, computed per rung from
    the stream-ridden pose columns instead of a standalone
    update_rhs_sorted phase."""
    from wgmath_tpu.scenes.builders import balls

    params = SimParams()
    base = PipelineConfig(pair_capacity=2048, contact_capacity=1024,
                          max_colors=12, gs_cmax=256, bp_slack=0.03,
                          bp_algo="grid", manifold_points=1,
                          gs_windows=(256,) * 12)
    state = balls(160, dim=3)
    cfg = base
    for _ in range(30):
        state, cfg = step_checked(state, params, cfg)
    cfg_r = dataclasses.replace(cfg, gs_chained=True, gs_rhs_in_rung=True)

    s_lad = step(state, params, cfg, warmstart=True)
    s_rr = step(state, params, cfg_r, warmstart=True)
    np.testing.assert_allclose(
        np.asarray(s_rr.bodies.vels.linear),
        np.asarray(s_lad.bodies.vels.linear), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_rr.bodies.poses.translation),
        np.asarray(s_lad.bodies.poses.translation), rtol=1e-5, atol=1e-6)

    # multi-frame coherence (caches, regrows) + loose ladder tracking
    sr, cr = s_rr, cfg_r
    sl, cl = s_lad, cfg
    for _ in range(10):
        sr, cr = step_checked(sr, params, cr)
        sl, cl = step_checked(sl, params, cl)
    assert np.isfinite(np.asarray(sr.bodies.poses.translation)).all()
    np.testing.assert_allclose(
        np.asarray(sr.bodies.poses.translation),
        np.asarray(sl.bodies.poses.translation), rtol=1e-3, atol=1e-3)


def test_pair_slot_layout_matches_chained():
    """gs_pair_slots (contacts at color-major BP-cached pair slots; layout/
    warmstart ride a bp-hit cond) must reproduce the plain chained_rr
    trajectory over a short horizon, survive a forced BP refresh (slot
    permutation => by-key warmstart + fresh bundle), and keep pair/contact
    counts identical."""
    import dataclasses

    import numpy as np

    from wgmath_tpu.dynamics import SimParams
    from wgmath_tpu.pipeline import PipelineConfig, step, step_checked
    from wgmath_tpu.scenes.builders import ball_pit

    params = SimParams()
    cfg = PipelineConfig(pair_capacity=2048, contact_capacity=1024,
                         max_colors=16, gs_cmax=512, bp_slack=0.03,
                         bp_algo="grid", manifold_points=1,
                         gs_windows=(128,) * 16, gs_chained=True,
                         gs_rhs_in_rung=True)
    state = ball_pit(160)
    for _ in range(30):
        state, cfg = step_checked(state, params, cfg)

    sa, ca = state, cfg
    cb = dataclasses.replace(cfg, gs_pair_slots=True)
    sb = state
    for f in range(6):
        sa, ca = step_checked(sa, params, ca)
        sb, cb = step_checked(sb, params, cb)
        dp = float(np.max(np.abs(
            np.asarray(sa.bodies.poses.translation)
            - np.asarray(sb.bodies.poses.translation))))
        assert np.isfinite(dp) and dp < 5e-3, (f, dp)
        # micro-divergence (different warmstart decisions) shifts
        # marginal pairs at this tiny scale — positions are the real
        # gate; counts just need to stay in the same regime
        pa, pb = np.asarray(sa.pair_count), np.asarray(sb.pair_count)
        assert abs(int(pa[0]) - int(pb[0])) <= max(32, int(pa[0]) * 3 // 20)
        assert abs(int(pa[1]) - int(pb[1])) <= max(32, int(pa[1]) * 3 // 20)

    # forced refresh: slots permute; the next frames stay healthy
    cb_miss = dataclasses.replace(cb, bp_force="miss")
    sb, _ = step_checked(sb, params, cb_miss)
    for _ in range(3):
        sb, cb = step_checked(sb, params, cb)
    tr = np.asarray(sb.bodies.poses.translation)
    assert np.isfinite(tr).all()
    assert int(np.asarray(sb.pair_count)[1]) > 100

    # the cached pair list must be color-major sorted (the layout's
    # correctness invariant): valid pairs' colors are non-decreasing
    cols = np.asarray(sb.bp_colors[0])
    valid = np.asarray(sb.bp_pairs.valid)
    vc = cols[valid]
    assert (np.diff(np.clip(vc, 1, cb.max_colors)) >= 0).all()
    assert int(np.asarray(sb.bp_colors[3])) == 1


def test_static_slots_match_dynamic_pair_slots():
    """gs_static_slots: compile-time rung placement must reproduce the
    dynamic color-major pair-slot trajectories (same classes, same
    within-class order — only the absolute slots change), through
    cache-hit, repair, and forced-refresh frames."""
    from wgmath_tpu.scenes.builders import balls

    params = SimParams()
    # max_colors=16: enough classes that the colorer leaves NO residue
    # (the bench regime). With residue the layouts legitimately differ in
    # WHICH rows sit out for a degraded frame (dynamic: residue-first
    # block; static: tail segment) and warmstart side-order ties flip —
    # fp-level seeds that amplify chaotically.
    base = PipelineConfig(pair_capacity=4096, contact_capacity=2048,
                          max_colors=16, manifold_points=1, bp_algo="grid",
                          bp_slack=0.03, gs_cmax=2048,
                          gs_windows=(128,) * 16, gs_chained=True,
                          gs_rhs_in_rung=True, gs_pair_slots=True)
    cs = dataclasses.replace(base, gs_static_slots=True)
    sa, sb = balls(256), balls(256)
    ca, cb = base, cs
    for f in range(30):
        sa, ca = step_checked(sa, params, ca)
        sb, cb = step_checked(sb, params, cb)
    err = np.abs(np.asarray(sa.bodies.poses.translation)
                 - np.asarray(sb.bodies.poses.translation)).max()
    assert err < 1e-5, err
    # static layout invariant: every valid pair of color c sits inside
    # class c's static rung or in the tail segment
    cols = np.asarray(sb.bp_colors[0])
    valid = np.asarray(sb.bp_pairs.valid)
    W = np.concatenate([[0], np.cumsum(cb.gs_windows[:cb.max_colors])])
    assert cb.pair_capacity >= W[-1] + 256  # static placement actually on
    slots = np.nonzero(valid)[0]
    for s in slots:
        c = int(cols[s])
        if s < W[-1]:
            assert 1 <= c <= cb.max_colors
            assert W[c - 1] <= s < W[c], (s, c)
    assert int(np.asarray(sb.bp_colors[3])) != 1  # static flag
    # forced refresh stays healthy
    sb, _ = step_checked(sb, params,
                         dataclasses.replace(cb, bp_force="miss"))
    for _ in range(3):
        sb, cb = step_checked(sb, params, cb)
    assert np.isfinite(np.asarray(sb.bodies.poses.translation)).all()
