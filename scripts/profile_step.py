"""Phase-level slope profiling of the 10k-body physics step on real TPU.

Settles the bench scene once (checkpointed to .settled_10k.pkl so repeat
profiling runs skip the ~90-frame settle), then slope-times each pipeline
phase in isolation:

  bp       broad phase (world AABBs + find_pairs)
  np       narrow phase (given fixed pairs)
  compact  contact compaction
  setup    solver prepare (constraints + coloring + sort; solve w/ 0 sweeps)
  solve    full TGS solve
  step     the whole fused frame

Run: python scripts/profile_step.py [--resettle]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets compile cache; provides slope_time/_log)
import dataclasses  # noqa: E402
import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wgmath_tpu.dynamics import SimParams  # noqa: E402
from wgmath_tpu.pipeline import PipelineConfig, step, step_checked  # noqa: E402
from wgmath_tpu.utils import checkpoint  # noqa: E402

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".settled_10k_v4.pkl")  # v4: 1.5x capacity buckets


def settled_state():
    """Settled 10k-ball state under the bench's production config
    (width-1 manifolds, slack-cached broad phase, balanced coloring)."""
    from wgmath_tpu.scenes.builders import ball_pit

    params = SimParams()
    state0 = ball_pit(10_000)
    from wgmath_tpu.pipeline import auto_manifold_points

    config = PipelineConfig(
        pair_capacity=4096, contact_capacity=2048, max_colors=24,
        broad_phase_block=512, gs_cmax=1024, bp_slack=0.02,
        bc_pair_capacity=4096, gs_tail_window=512,
        manifold_points=auto_manifold_points(
            state0.shapes, 3, dynamic=np.asarray(state0.bodies.is_dynamic())))
    if os.path.exists(CKPT) and "--resettle" not in sys.argv:
        blob = checkpoint.load(CKPT)
        state = blob["state"]
        cfg = {}
        for k, v in blob["config"].items():
            v = v.item() if hasattr(v, "item") else v
            default = getattr(PipelineConfig, k)
            caster = type(default) if default is not None else (lambda x: x)
            cfg[k] = caster(v)
        config = PipelineConfig(**cfg)
        bench._log(f"loaded settled state from {CKPT}")
        if (getattr(state, "prev_colors", None) is None
                or (config.bp_slack > 0
                    and getattr(state, "bp_colors", None) is None)):
            # older checkpoints predate the prev_colors/bp_colors fields;
            # one step materializes them so fori_loop carries are stable
            state, config = step_checked(state, params, config)
        return state, params, config
    state = state0
    # settle WITHOUT the slack cache: mid-churn velocity inflation fattens
    # every box, overflowing grid budgets (persistent truncation) and
    # growing pair capacity past what the steady state needs. Plain BP per
    # frame is cheap enough for a one-off settle; the cache rebuilds on the
    # first steady-state step.
    settle_cfg = dataclasses.replace(config, bp_slack=0.0)
    for f in range(900):
        state, settle_cfg = step_checked(state, params, settle_cfg)
        if f % 15 == 0:
            maxv = float(jnp.max(jnp.abs(state.bodies.vels.linear)))
            bench._log(f"settle frame {f}, "
                       f"pairs={int(np.asarray(state.pair_count)[0])}, "
                       f"cap={settle_cfg.pair_capacity}, maxvel={maxv:.2f}")
            if f >= 150 and maxv < 0.05:
                break
    # carry the settled capacities into the cached-BP config, then run a
    # few steady steps so the saved state carries a materialized BP cache
    # (and any first-step capacity regrow happens before the save)
    config = dataclasses.replace(
        settle_cfg, bp_slack=config.bp_slack)
    for _ in range(3):
        state, config = step_checked(state, params, config)
    checkpoint.save(CKPT, {"state": state,
                           "config": dataclasses.asdict(config)})
    return state, params, config


def main():
    state, params, config = settled_state()
    bodies = state.bodies
    counts = np.asarray(state.pair_count)
    bench._log(f"pairs={counts[0]} contacts={counts[1]} cmax={counts[2]} "
               f"caps: pair={config.pair_capacity} "
               f"contact={config.contact_capacity} gs_cmax={config.gs_cmax}")

    from wgmath_tpu.broad_phase.brute_force import find_pairs
    from wgmath_tpu.dynamics.body import update_mprops
    from wgmath_tpu.dynamics.constraint import compact_contacts
    from wgmath_tpu.dynamics.solver import solve
    from wgmath_tpu.queries.narrow_phase import narrow_phase
    from wgmath_tpu.shapes.shape import BALL, ball_radii_or_nan, world_aabbs

    shapes = state.shapes
    poses = bodies.poses
    mprops = update_mprops(poses, bodies.local_mprops)
    mins, maxs = world_aabbs(shapes, poses, margin=params.prediction_distance)
    radii = ball_radii_or_nan(shapes, poses) if BALL in shapes.kinds else None
    pairs = find_pairs(mins, maxs, capacity=config.pair_capacity,
                       block=config.broad_phase_block,
                       max_per_row=config.broad_phase_max_per_row,
                       ball_radius=radii, margin=params.prediction_distance)
    contacts = narrow_phase(poses, shapes, pairs, params.prediction_distance,
                            sat_capacity=config.sat_pair_capacity,
                            pfm_capacity=config.pfm_pair_capacity)
    contacts_c, _ = compact_contacts(contacts, config.contact_capacity)
    pairs = jax.block_until_ready(pairs)
    contacts_c = jax.block_until_ready(contacts_c)

    results = {}

    def phase(name, make, args, ks=(2, 10)):
        t = bench.slope_time(make, args, k_small=ks[0], k_large=ks[1], reps=2)
        results[name] = t * 1e3
        bench._log(f"{name}: {t * 1e3:.1f} ms")

    # --- broad phase (includes world AABBs)
    def make_bp(k):
        @jax.jit
        def f(poses):
            def body(i, carry):
                tr, acc = carry
                mn, mx = world_aabbs(shapes, poses, margin=params.prediction_distance)
                r = ball_radii_or_nan(shapes, poses)
                p = find_pairs(mn + acc * 0, mx, capacity=config.pair_capacity,
                               block=config.broad_phase_block,
                               max_per_row=config.broad_phase_max_per_row,
                               ball_radius=r, margin=params.prediction_distance)
                # consume every output so nothing is DCE'd out of the timing
                acc = (acc + p.count.astype(jnp.float32)
                       + jnp.sum(p.body_a + p.body_b).astype(jnp.float32) * 1e-9)
                return tr, acc
            _, acc = jax.lax.fori_loop(0, k, body, (poses.translation, 0.0))
            return acc
        return f

    phase("bp_brute", make_bp, (poses,))

    from wgmath_tpu.broad_phase.grid import find_pairs_grid

    def make_bp_grid(k):
        @jax.jit
        def f(poses):
            def body(i, carry):
                tr, acc = carry
                mn, mx = world_aabbs(shapes, poses, margin=params.prediction_distance)
                r = ball_radii_or_nan(shapes, poses)
                p = find_pairs_grid(mn + acc * 0, mx,
                                    capacity=config.pair_capacity,
                                    max_per_body=config.broad_phase_max_per_row,
                                    cell_cap=config.bp_cell_cap,
                                    global_cap=config.bp_global_cap,
                                    ball_radius=r,
                                    margin=params.prediction_distance)
                acc = (acc + p.count.astype(jnp.float32)
                       + jnp.sum(p.body_a + p.body_b).astype(jnp.float32) * 1e-9)
                return tr, acc
            _, acc = jax.lax.fori_loop(0, k, body, (poses.translation, 0.0))
            return acc
        return f

    phase("bp_grid", make_bp_grid, (poses,))

    # --- narrow phase (fixed pairs)
    def make_np(k):
        @jax.jit
        def f(poses, pairs):
            def body(i, acc):
                c = narrow_phase(poses, shapes, pairs,
                                 params.prediction_distance + acc * 0,
                                 sat_capacity=config.sat_pair_capacity,
                                 pfm_capacity=config.pfm_pair_capacity)
                return (acc + jnp.sum(c.valid.astype(jnp.float32)) * 1e-9
                        + jnp.sum(c.points_a) * 1e-9 + jnp.sum(c.normal_a) * 1e-9
                        + jnp.sum(jnp.where(jnp.isfinite(c.dist), c.dist, 0.0)) * 1e-9)
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    phase("np", make_np, (poses, pairs))

    # --- compaction
    def make_compact(k):
        @jax.jit
        def f(contacts):
            def body(i, acc):
                c, n = compact_contacts(
                    jax.tree.map(lambda x: x, contacts), config.contact_capacity)
                return (acc + n.astype(jnp.float32) * 1e-9 + acc * 0
                        + jnp.sum(c.points_a) * 1e-9 + jnp.sum(c.body_a) * 1e-9)
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    phase("compact", make_compact, (contacts,))

    # --- solver: 1 vs 4 substeps isolates setup (coloring+sort) from sweeps
    p1 = dataclasses.replace(params, num_solver_iterations=1)

    def make_solve(params_k, ws):
        def mk(k):
            @jax.jit
            def f(bodies, mprops, contacts, prev):
                def body(i, carry):
                    acc, vel = carry
                    po, ve, cons, mc, _col = solve(
                        bodies, mprops,
                        dataclasses.replace(contacts,
                                            dist=contacts.dist + acc * 0),
                        params_k, use_jacobi=config.use_jacobi,
                        max_colors=config.max_colors,
                        max_per_body=config.max_per_body,
                        warmstart_from=prev if ws else None, joints=None,
                        gs_cmax=config.gs_cmax)
                    acc = (acc + jnp.sum(ve.linear) * 1e-9
                           + jnp.sum(po.translation) * 1e-9
                           + jnp.sum(cons.n_impulse) * 1e-9
                           + jnp.sum(mc.astype(jnp.float32)) * 1e-9)
                    return acc, ve
                acc, _ = jax.lax.fori_loop(0, k, body, (0.0, bodies.vels))
                return acc
            return f
        return mk

    prev = state.prev_constraints
    phase("solve1", make_solve(p1, False), (bodies, mprops, contacts_c, prev))
    phase("solve", make_solve(params, False), (bodies, mprops, contacts_c, prev))
    phase("solve_ws", make_solve(params, True),
          (bodies, mprops, contacts_c, prev))

    # --- step without warmstart (isolates transfer_warmstart in context)
    def make_step_nows(k):
        @jax.jit
        def f(state):
            def body(i, s):
                return step(s, params, config, warmstart=False)
            s = jax.lax.fori_loop(0, k, body, state)
            return s.bodies.poses.translation
        return f

    phase("step_nows", make_step_nows, (state,), ks=(2, 10))

    # --- full step
    def make_step(k):
        @jax.jit
        def f(state):
            def body(i, s):
                return step(s, params, config)
            s = jax.lax.fori_loop(0, k, body, state)
            return s.bodies.poses.translation
        return f

    phase("step", make_step, (state,), ks=(2, 10))

    bench._log("---- summary (ms) ----")
    for k, v in results.items():
        bench._log(f"{k:8s} {v:8.1f}")
    s1, s4 = results.get("solve1", 0), results.get("solve", 0)
    per_sub = (s4 - s1) / 3.0
    bench._log(f"per-substep={per_sub:.1f}  setup≈{s1 - per_sub:.1f}  "
               f"warmstart_delta={results.get('solve_ws', 0) - s4:.1f}  "
               f"step_unaccounted={results.get('step', 0) - results.get('bp', 0) - results.get('np', 0) - results.get('compact', 0) - results.get('solve_ws', 0):.1f}")


if __name__ == "__main__":
    main()
