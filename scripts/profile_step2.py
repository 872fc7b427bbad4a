"""In-context phase profiling of the settled 10k-body step on real TPU.

Unlike profile_step.py (which times phases with generic kwargs), this
mirrors pipeline.step's EXACT call parameters — manifold width, bc/sat
compaction capacities, cached pair colors, slack-cached broad phase — so
the per-phase numbers add up to the real step cost.

Phases:
  bp_cached   the steady-state BP path (containment check, cond -> cached)
  bp_miss     the BP-refresh path (grid BP + pair coloring)
  np          narrow phase with the pipeline's kwargs
  compact     contact compaction (+ color compaction)
  solve_pre   solve with colors_in (steady state: no coloring) - 1 substep
  solve_full  solve with colors_in - 4 substeps
  step        full frame (steady state)

Run: python scripts/profile_step2.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wgmath_tpu.dynamics import SimParams  # noqa: E402
from wgmath_tpu.pipeline import PipelineConfig, step  # noqa: E402

from profile_step import settled_state  # noqa: E402


def main():
    state, params, config = settled_state()
    bodies = state.bodies
    counts = np.asarray(state.pair_count)
    bench._log(f"pairs={counts[0]} contacts={counts[1]} cmax={counts[2]} "
               f"caps: pair={config.pair_capacity} "
               f"contact={config.contact_capacity} gs_cmax={config.gs_cmax} "
               f"p_max={config.manifold_points} bc={config.bc_pair_capacity}")

    from wgmath_tpu.broad_phase.grid import find_pairs_grid
    from wgmath_tpu.dynamics.body import update_mprops
    from wgmath_tpu.dynamics.constraint import compact_contacts
    from wgmath_tpu.dynamics.solver import color_pairs, solve
    from wgmath_tpu.queries.narrow_phase import narrow_phase
    from wgmath_tpu.shapes.shape import BALL, ball_radii_or_nan, world_aabbs

    shapes = state.shapes
    poses = bodies.poses
    mprops = jax.jit(update_mprops)(poses, bodies.local_mprops)
    slack = config.bp_slack
    sphere_margin = params.prediction_distance + 2.0 * slack * float(np.sqrt(3))

    results = {}

    def phase(name, make, args, ks=(2, 10)):
        t = bench.slope_time(make, args, k_small=ks[0], k_large=ks[1], reps=2)
        results[name] = t * 1e3
        bench._log(f"{name}: {t * 1e3:.1f} ms")

    def consume_pairs(p, acc):
        return (acc + p.count.astype(jnp.float32)
                + jnp.sum(p.body_a + p.body_b).astype(jnp.float32) * 1e-9)

    # --- steady-state BP: containment check + cond takes the cached branch
    def make_bp_cached(k):
        @jax.jit
        def f(state):
            def body(i, acc):
                mn, mx = world_aabbs(shapes, state.bodies.poses,
                                     margin=params.prediction_distance
                                     + acc * 0)
                inside = jnp.all((mn >= state.bp_ref[0])
                                 & (mx <= state.bp_ref[1]))
                p = jax.lax.cond(inside, lambda: state.bp_pairs,
                                 lambda: state.bp_pairs)
                return consume_pairs(p, acc) + inside.astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    phase("bp_cached", make_bp_cached, (state,))

    # --- BP refresh: grid BP + pair-graph coloring (the cache-miss path)
    dyn = jax.jit(lambda b: b.is_dynamic())(bodies)
    n_bodies = bodies.num_bodies

    def make_bp_miss(k):
        @jax.jit
        def f(poses):
            def body(i, acc):
                mn, mx = world_aabbs(shapes, poses,
                                     margin=params.prediction_distance)
                r = ball_radii_or_nan(shapes, poses)
                p = find_pairs_grid(mn - slack + acc * 0, mx + slack,
                                    capacity=config.pair_capacity,
                                    max_per_body=config.broad_phase_max_per_row,
                                    cell_cap=config.bp_cell_cap,
                                    global_cap=config.bp_global_cap,
                                    cand_budget=config.bp_cand_budget,
                                    ball_radius=r, margin=sphere_margin,
                                    dynamic=dyn)
                cols = color_pairs(p.body_a, p.body_b, p.valid,
                                   dyn[p.body_a], dyn[p.body_b], n_bodies,
                                   max_colors=config.max_colors,
                                   class_cap=config.gs_cmax)
                return consume_pairs(p, acc) + jnp.sum(cols) * 1e-9
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    phase("bp_miss", make_bp_miss, (poses,), ks=(2, 6))

    # --- in-context narrow phase + compaction
    pairs = state.bp_pairs
    pair_colors = state.bp_colors[0]

    def make_np(k):
        @jax.jit
        def f(poses, pairs):
            def body(i, acc):
                c = narrow_phase(poses, shapes, pairs,
                                 params.prediction_distance + acc * 0,
                                 sat_capacity=config.sat_pair_capacity,
                                 pfm_capacity=config.pfm_pair_capacity,
                                 p_max=config.manifold_points,
                                 bc_capacity=config.bc_pair_capacity)
                return (acc + jnp.sum(c.valid.astype(jnp.float32)) * 1e-9
                        + jnp.sum(c.points_a) * 1e-9
                        + jnp.sum(c.normal_a) * 1e-9
                        + jnp.sum(jnp.where(jnp.isfinite(c.dist), c.dist,
                                            0.0)) * 1e-9)
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    phase("np", make_np, (poses, pairs))

    contacts_raw = jax.jit(
        lambda poses, pairs: narrow_phase(
            poses, shapes, pairs, params.prediction_distance,
            sat_capacity=config.sat_pair_capacity,
            pfm_capacity=config.pfm_pair_capacity,
            p_max=config.manifold_points,
            bc_capacity=config.bc_pair_capacity))(poses, pairs)

    def make_compact(k):
        @jax.jit
        def f(contacts, cols):
            def body(i, acc):
                c, cnt, cc = compact_contacts(
                    dataclasses.replace(contacts, dist=contacts.dist + acc * 0),
                    config.contact_capacity, extra=cols)
                return (acc + cnt.astype(jnp.float32) * 1e-9
                        + jnp.sum(c.points_a) * 1e-9
                        + jnp.sum(cc) * 1e-9)
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    phase("compact", make_compact, (contacts_raw, pair_colors))

    contacts_c, _cnt, ccolors = jax.jit(
        lambda c, cols: compact_contacts(c, config.contact_capacity,
                                         extra=cols))(contacts_raw,
                                                      pair_colors)
    contacts_c = jax.block_until_ready(contacts_c)

    # --- solve with cached colors (steady state: coloring skipped)
    p1 = dataclasses.replace(params, num_solver_iterations=1)

    def make_solve(params_k):
        def mk(k):
            @jax.jit
            def f(bodies, mprops, contacts, prev, cols):
                def body(i, carry):
                    acc, vel = carry
                    po, ve, cons, mc, _c = solve(
                        bodies, mprops,
                        dataclasses.replace(contacts,
                                            dist=contacts.dist + acc * 0),
                        params_k, use_jacobi=config.use_jacobi,
                        max_colors=config.max_colors,
                        max_per_body=config.max_per_body,
                        warmstart_from=prev, joints=None,
                        gs_cmax=config.gs_cmax, colors_in=cols)
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
    phase("solve_pre", make_solve(p1), (bodies, mprops, contacts_c, prev,
                                        ccolors))
    phase("solve_full", make_solve(params), (bodies, mprops, contacts_c,
                                             prev, ccolors))

    # --- full steady-state step
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
        bench._log(f"{k:10s} {v:8.1f}")
    s1, s4 = results.get("solve_pre", 0), results.get("solve_full", 0)
    per_sub = (s4 - s1) / 3.0
    glue = (results.get("step", 0) - results.get("bp_cached", 0)
            - results.get("np", 0) - results.get("compact", 0)
            - results.get("solve_full", 0))
    bench._log(f"per-substep={per_sub:.1f}  setup~{s1 - per_sub:.1f}  "
               f"glue~{glue:.1f}")


if __name__ == "__main__":
    main()
