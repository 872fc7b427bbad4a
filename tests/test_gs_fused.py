"""Fused-sweep kernel (dynamics/gs_fused.py) vs the ladder reference pass
(solver.gs_color_major_pass) on identical rung-padded color-major inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wgmath_tpu.dynamics import SimParams
from wgmath_tpu.dynamics.body import (
    Bodies,
    Velocity,
    ball_local_mprops,
    update_mprops,
)
from wgmath_tpu.dynamics.constraint import Contacts, build_constraints
from wgmath_tpu.dynamics.gs_fused import (
    build_fused_tables,
    fused_layout,
    fused_sweep,
    gather_width,
)
from wgmath_tpu.dynamics.solver import (
    color_constraints,
    gs_color_major_pass,
    sort_solver_fields_packed,
)
from wgmath_tpu.geometry import sim as sim_ops


def _random_setup(seed=0, n=48, c=96, n_static=2, max_colors=16):
    # max_colors is generous: color_constraints dumps leftovers into the
    # LAST color without disjointness (residue contract) — both sweep
    # implementations require proper colors, asserted below
    """Random contact set -> constraints, colors, rung-padded layout."""
    rng = np.random.default_rng(seed)
    # random distinct pairs (a < b); body 0..n_static-1 are static
    pairs = set()
    while len(pairs) < c:
        a, b = rng.integers(0, n, 2)
        if a == b:
            continue
        pairs.add((min(a, b), max(a, b)))
    pairs = sorted(pairs)[:c]
    body_a = jnp.asarray([p[0] for p in pairs], jnp.int32)
    body_b = jnp.asarray([p[1] for p in pairs], jnp.int32)
    normals = rng.normal(size=(c, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    contacts = Contacts(
        body_a, body_b,
        jnp.asarray(normals),
        jnp.asarray(rng.uniform(-0.3, 0.3, (c, 1, 3)), jnp.float32),
        jnp.asarray(rng.uniform(-0.05, 0.0, (c, 1)), jnp.float32),
        jnp.ones((c,), jnp.int32),
        jnp.ones((c,), bool),
    )
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    poses = sim_ops.from_parts(
        jnp.asarray(q), jnp.asarray(rng.uniform(-3, 3, (n, 3)), jnp.float32))
    radii = jnp.asarray(rng.uniform(0.3, 0.7, (n,)), jnp.float32)
    mp = ball_local_mprops(radii)
    # lock the static bodies (zero inv mass)
    import dataclasses

    inv_mass = mp.inv_mass.at[:n_static].set(0.0)
    inertia = mp.inv_inertia_sqrt.at[:n_static].set(0.0) \
        if hasattr(mp, "inv_inertia_sqrt") else None
    fields = {f.name: getattr(mp, f.name) for f in dataclasses.fields(mp)}
    fields["inv_mass"] = inv_mass
    for k in list(fields):
        if "inertia" in k:
            fields[k] = fields[k].at[:n_static].set(0.0)
    mp = type(mp)(**fields)
    vels = Velocity(
        jnp.asarray(rng.normal(size=(n, 3)) * 0.5, jnp.float32),
        jnp.asarray(rng.normal(size=(n, 3)) * 0.5, jnp.float32))
    bodies = Bodies(poses, vels, mp)
    mprops = update_mprops(poses, mp)
    params = SimParams().substep().with_dim(3)
    cons = build_constraints(poses, vels, mprops, contacts, params)
    colors = color_constraints(cons, n, max_colors=max_colors)
    colors_np = np.asarray(colors)
    n_colors = int(colors_np.max())
    dyn_np = np.asarray(jnp.any(mprops.inv_mass != 0.0, axis=-1))
    for k in range(1, n_colors + 1):
        ids = []
        for i in np.nonzero(colors_np == k)[0]:
            for bid in (int(contacts.body_a[i]), int(contacts.body_b[i])):
                if dyn_np[bid]:
                    ids.append(bid)
        assert len(ids) == len(set(ids)), f"improper coloring in class {k}"

    # static rung ladder: each color's class rounded up to 128
    counts_np = np.bincount(colors_np, minlength=max_colors + 2)
    windows = tuple(
        int(-(-max(int(counts_np[k]), 1) // 128) * 128)
        for k in range(1, max_colors + 1))
    rungs, offsets, ctot = fused_layout(windows, 0)
    order = np.full((ctot,), c, np.int32)  # >= c = padding slot
    for k in range(1, max_colors + 1):
        rows = np.nonzero(colors_np == k)[0]
        order[offsets[k]:offsets[k] + len(rows)] = rows
    order_padded = jnp.asarray(order)
    ss, packed_fields = sort_solver_fields_packed(cons, order_padded)
    counts = jnp.asarray(np.concatenate(
        [counts_np[:max_colors + 1], [0]]).astype(np.int32))
    layout = (order_padded, jnp.asarray(offsets[:-1]), counts)
    return (bodies, mprops, cons, ss, packed_fields, layout, windows,
            n_colors, ctot, n)


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_sweep_matches_ladder_pass(seed):
    (bodies, mprops, cons, ss, packed_fields, layout, windows, n_colors,
     ctot, n) = _random_setup(seed=seed)
    p_max, s_len = 1, 2
    vels = bodies.vels
    prev_n = jnp.asarray(
        np.random.default_rng(seed + 7).uniform(0, 0.1, (ctot, p_max)),
        jnp.float32)
    prev_t = jnp.zeros((ctot, p_max, s_len), jnp.float32)

    # ---- reference: the per-color ladder pass on the same static layout
    ref_v, ref_n, ref_t = gs_color_major_pass(
        ss, vels, prev_n, prev_t, layout, jnp.int32(n_colors),
        cmax=max(windows), dim=3, packed_fields=packed_fields,
        windows=windows)

    # ---- fused sweep
    w_g = gather_width(n, windows)
    dyn_a = jnp.any(ss.im_a != 0.0, axis=-1)
    dyn_b = jnp.any(ss.im_b != 0.0, axis=-1)
    idx, inv = build_fused_tables(ss.body_a, ss.body_b, dyn_a, dyn_b,
                                  ss.valid, windows=windows, rung0=0,
                                  w_g=w_g)
    vt = jnp.zeros((8, w_g), jnp.float32)
    vt = vt.at[0:3, :n].set(vels.linear.T)
    vt = vt.at[3:6, :n].set(vels.angular.T)
    winT, meta = packed_fields
    out_v, out_n, out_t = fused_sweep(
        vt, prev_n.reshape(ctot, p_max).T,
        prev_t.reshape(ctot, p_max * s_len).T,
        winT.T, ss.valid.astype(jnp.float32)[None, :],
        ss.num_points.astype(jnp.float32)[None, :],
        ss.cfm_factor[0], ss.n_rhs.reshape(ctot, p_max).T,
        ss.t_rhs.reshape(ctot, p_max * s_len).T,
        idx, inv, layout[2], windows=windows, rung0=0, p_max=p_max,
        s_len=s_len, meta=meta, use_pallas=False)

    np.testing.assert_allclose(np.asarray(out_v[0:3, :n].T),
                               np.asarray(ref_v.linear), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_v[3:6, :n].T),
                               np.asarray(ref_v.angular), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_n.T),
                               np.asarray(ref_n.reshape(ctot, p_max)),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(out_t.T),
        np.asarray(ref_t.reshape(ctot, p_max * s_len)),
        rtol=1e-5, atol=1e-7)


def test_fused_sweep_pallas_interpret_matches_xla():
    (bodies, mprops, cons, ss, packed_fields, layout, windows, n_colors,
     ctot, n) = _random_setup(seed=2)
    p_max, s_len = 1, 2
    w_g = gather_width(n, windows)
    dyn_a = jnp.any(ss.im_a != 0.0, axis=-1)
    dyn_b = jnp.any(ss.im_b != 0.0, axis=-1)
    idx, inv = build_fused_tables(ss.body_a, ss.body_b, dyn_a, dyn_b,
                                  ss.valid, windows=windows, rung0=0,
                                  w_g=w_g)
    vt = jnp.zeros((8, w_g), jnp.float32)
    vt = vt.at[0:3, :n].set(bodies.vels.linear.T)
    vt = vt.at[3:6, :n].set(bodies.vels.angular.T)
    winT, meta = packed_fields
    prev_n = jnp.zeros((p_max, ctot), jnp.float32)
    prev_t = jnp.zeros((p_max * s_len, ctot), jnp.float32)
    args = (vt, prev_n, prev_t, winT.T,
            ss.valid.astype(jnp.float32)[None, :],
            ss.num_points.astype(jnp.float32)[None, :], ss.cfm_factor[0],
            ss.n_rhs.reshape(ctot, p_max).T,
            ss.t_rhs.reshape(ctot, p_max * s_len).T, idx, inv, layout[2])
    kw = dict(windows=windows, rung0=0, p_max=p_max, s_len=s_len, meta=meta)
    a_v, a_n, a_t = fused_sweep(*args, use_pallas=False, **kw)
    b_v, b_n, b_t = fused_sweep(*args, use_pallas=True, **kw)  # interpret
    np.testing.assert_allclose(np.asarray(a_v), np.asarray(b_v), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a_n), np.asarray(b_n), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a_t), np.asarray(b_t), rtol=1e-6)


def test_pipeline_gs_fused_matches_ladder():
    """Wiring test: the fused-sweep pipeline path (static rung-padded
    compaction + one-kernel sweeps) advances a settled pile the same way
    as the window-ladder path from an identical warmed state."""
    import dataclasses

    from wgmath_tpu.pipeline import PipelineConfig, step, step_checked
    from wgmath_tpu.scenes.builders import balls

    params = SimParams()
    base = PipelineConfig(pair_capacity=2048, contact_capacity=1024,
                          max_colors=12, gs_cmax=256, bp_slack=0.03,
                          bp_algo="grid", manifold_points=1,
                          gs_windows=(256,) * 12)
    state = balls(160, dim=3)
    cfg = base
    for _ in range(30):  # settle; ladder rungs re-bucket as needed
        state, cfg = step_checked(state, params, cfg)
    cfg_f = dataclasses.replace(cfg, gs_fused=True, gs_rung0=256)

    s_lad = step(state, params, cfg, warmstart=True)
    s_fus = step(state, params, cfg_f, warmstart=True)
    np.testing.assert_allclose(
        np.asarray(s_fus.bodies.vels.linear),
        np.asarray(s_lad.bodies.vels.linear), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_fus.bodies.poses.translation),
        np.asarray(s_lad.bodies.poses.translation), rtol=1e-5, atol=1e-6)
    # same live contacts survived the static-rung compaction
    assert (int(np.asarray(s_fus.pair_count)[1])
            == int(np.asarray(s_lad.pair_count)[1]))

    # multi-frame: the fused path keeps its own caches coherent
    sf, cf = s_fus, cfg_f
    for _ in range(10):
        sf, cf = step_checked(sf, params, cf)
    assert np.isfinite(np.asarray(sf.bodies.poses.translation)).all()


def test_fused_builder_matches_reference():
    """build_pallas.build_constraints_fused vs constraint.build_constraints
    field-by-field on random contacts (XLA fallback + pallas interpret)."""
    import dataclasses

    from wgmath_tpu.dynamics.build_pallas import (
        build_constraints_fused,
        field_meta,
    )

    for seed in (0, 3):
        (bodies, mprops, cons_setup, ss, packed_fields, layout, windows,
         n_colors, ctot, n) = _random_setup(seed=seed)
        # rebuild raw contacts identical to _random_setup's
        rng = np.random.default_rng(seed)
        pairs = set()
        while len(pairs) < 96:
            a, b = rng.integers(0, n, 2)
            if a == b:
                continue
            pairs.add((min(a, b), max(a, b)))
        pairs = sorted(pairs)[:96]
        c = 96
        normals = rng.normal(size=(c, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        contacts = Contacts(
            jnp.asarray([p[0] for p in pairs], jnp.int32),
            jnp.asarray([p[1] for p in pairs], jnp.int32),
            jnp.asarray(normals),
            jnp.asarray(rng.uniform(-0.3, 0.3, (c, 1, 3)), jnp.float32),
            jnp.asarray(rng.uniform(-0.05, 0.0, (c, 1)), jnp.float32),
            jnp.ones((c,), jnp.int32),
            jnp.ones((c,), bool),
        )
        params = SimParams().substep().with_dim(3)
        ref = build_constraints(bodies.poses, bodies.vels, mprops, contacts,
                                params)
        got, bigT, meta = build_constraints_fused(
            bodies.poses, bodies.vels, mprops, contacts, params)
        for f in meta:
            r = np.asarray(getattr(ref, f))
            g = np.asarray(getattr(got, f))
            # f32 rounding in cancellation-heavy torque terms scales with
            # the field's magnitude, not per-element values
            tol = 1e-5 + 2e-6 * float(np.abs(r).max(initial=0.0))
            assert np.abs(r - g).max(initial=0.0) <= tol, \
                f"field {f} (seed {seed}): {np.abs(r - g).max()} > {tol}"
        # the PALLAS wrapper (interpret off-TPU) must agree with the XLA
        # fallback bit-for-bit — it passes meta as a name-sorted tuple, and
        # a dict-order pack once shifted EVERY field on device (the round-2
        # "fused builder miscomputes" bug; scripts/isolate_fused_kernels.py)
        got_p, bigT_p, meta_p = build_constraints_fused(
            bodies.poses, bodies.vels, mprops, contacts, params,
            use_pallas=True)
        assert meta_p == meta
        dp = np.abs(np.asarray(bigT_p) - np.asarray(bigT))
        rel = dp / (np.abs(np.asarray(bigT)) + 1.0)
        # interpret-Pallas and fused XLA round differently (fma
        # contraction) — gate on the relative metric, not bitwise; the
        # ordering bug this guards against reads as rel ~1e2
        assert rel.max() < 1e-3, f"pallas builder rel {rel.max()}"

        # bigT row-layout must match pad_solver_fields_packed's
        from wgmath_tpu.dynamics.solver import pad_solver_fields_packed

        ss2, (packed2d, pmeta) = pad_solver_fields_packed(ref, 0)
        k_pack = packed2d.shape[1]
        np.testing.assert_allclose(np.asarray(bigT[:k_pack].T),
                                   np.asarray(packed2d), rtol=2e-5,
                                   atol=1e-5)
        for f, (at, tail) in pmeta.items():
            assert meta[f] == (at, tuple(tail)), f


def test_pipeline_gs_fused_regrow_path():
    """Rung regrow mid-run: deliberately tiny initial windows force the
    static layout to re-bucket (shape change across frames); the by-key
    warmstart transfer must survive the capacity change and the pile must
    keep its contacts."""
    import dataclasses

    from wgmath_tpu.pipeline import PipelineConfig, step_checked
    from wgmath_tpu.scenes.builders import balls

    params = SimParams()
    cfg = PipelineConfig(pair_capacity=2048, contact_capacity=1024,
                         max_colors=12, gs_cmax=256, bp_slack=0.03,
                         bp_algo="grid", manifold_points=1,
                         gs_windows=(256,) * 12)
    state = balls(160, dim=3)
    for _ in range(25):
        state, cfg = step_checked(state, params, cfg)
    # flip to fused with UNDERSIZED windows: the first fused frame drops
    # the per-color overflow, exports TRUE class counts, and step_checked
    # regrows the rungs (a buffer-shape change across frames — the by-key
    # warmstart transfer must survive the capacity change)
    cfg_f = dataclasses.replace(cfg, gs_fused=True, gs_rung0=256,
                                gs_windows=(16,) * 12)
    shapes_seen = set()
    for _ in range(8):
        state, cfg_f = step_checked(state, params, cfg_f)
        shapes_seen.add(cfg_f.gs_windows)
    assert len(shapes_seen) >= 2, "rung regrow never fired"
    tr = np.asarray(state.bodies.poses.translation)
    assert np.isfinite(tr).all()
    # the settled pile keeps a healthy contact count through the regrow
    assert int(np.asarray(state.pair_count)[1]) > 100


def test_pipeline_gs_fused_boxes_p4():
    """4-point manifolds (cuboid stacks) through the fused kernels: the
    builder/sweep/warmstart/rhs paths all loop over p_max — exercised at
    p_max=4 here, matching the ladder step from a warmed state."""
    import dataclasses

    from wgmath_tpu.pipeline import PipelineConfig, step, step_checked
    from wgmath_tpu.scenes.builders import boxes

    params = SimParams()
    cfg = PipelineConfig(pair_capacity=1024, contact_capacity=512,
                         max_colors=12, gs_cmax=256, bp_slack=0.03,
                         bp_algo="grid", sat_pair_capacity=512,
                         manifold_points=4, gs_windows=(256,) * 12)
    state = boxes(48, dim=3)
    for _ in range(30):
        state, cfg = step_checked(state, params, cfg)
    cfg_f = dataclasses.replace(cfg, gs_fused=True, gs_rung0=256)
    s_lad = step(state, params, cfg, warmstart=True)
    s_fus = step(state, params, cfg_f, warmstart=True)
    np.testing.assert_allclose(
        np.asarray(s_fus.bodies.vels.linear),
        np.asarray(s_lad.bodies.vels.linear), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s_fus.bodies.poses.translation),
        np.asarray(s_lad.bodies.poses.translation), rtol=1e-5, atol=1e-5)
    assert (int(np.asarray(s_fus.pair_count)[1])
            == int(np.asarray(s_lad.pair_count)[1]))
