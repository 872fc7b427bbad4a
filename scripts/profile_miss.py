"""Decompose the 128.9 ms BP-miss step and measure the natural path mix.

profile_chained (round 3) measured: hit 19.5 / repair 25.3 / miss 128.9
ms/step. The miss path = world AABBs + grid BP on inflated boxes +
transfer_pair_colors (sort+searchsorted over pair capacity) +
assign_new_pair_colors (or full Luby when > bp_recolor_cap new) + the
normal narrow/solve. This script times each piece in isolation and counts
how often natural stepping takes each path (pair_count[3] histogram over
K steps), so the natural-step optimization targets the right term.

Run: python scripts/profile_miss.py > /tmp/profile_miss.log 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets compile cache)
import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wgmath_tpu.dynamics import SimParams  # noqa: E402
from wgmath_tpu.pipeline import step, step_checked  # noqa: E402
from profile_step import settled_state  # noqa: E402


def abs_k(make_body, init, K=30, reps=3):
    """Time K chained iterations of make_body inside one jit."""
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, K, make_body, c)

    jax.block_until_ready(run(init))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(run(init))
        ts.append(time.time() - t0)
    return min(ts) / K * 1e3


def main():
    state0, params, config0 = settled_state()
    state = dataclasses.replace(state0, bp_pairs=None, bp_ref=None,
                                bp_colors=None, solve_cache=None)
    cfg = dataclasses.replace(config0, gs_chained=True,
                              gs_windows=(256,) * config0.max_colors)
    for _ in range(8):
        state, cfg = step_checked(state, params, cfg)
    state = jax.block_until_ready(state)
    n = state.bodies.poses.translation.shape[0]
    cap = state.bp_pairs.body_a.shape[0]
    bench._log(f"pair capacity={cap}, pairs={int(state.pair_count[0])}")

    from wgmath_tpu.broad_phase.grid import find_pairs_grid
    from wgmath_tpu.dynamics.solver import (
        assign_new_pair_colors, color_pairs, transfer_pair_colors)
    from wgmath_tpu.shapes.shape import world_aabbs

    from wgmath_tpu.shapes.shape import BALL, ball_radii_or_nan

    dyn = state.bodies.is_dynamic()
    mins, maxs = world_aabbs(state.shapes, state.bodies.poses)
    infl = cfg.bp_slack
    radii = (ball_radii_or_nan(state.shapes, state.bodies.poses)
             if BALL in state.shapes.kinds else None)
    radii_bp = None if radii is None else radii + np.sqrt(3.0) * infl

    # 1) grid BP on inflated boxes, mirroring pipeline._run_bp's knobs
    #    (feedback: shift mins by a hair of the output count so XLA can't
    #    hoist the BP out of the loop)
    def bp_body(i, c):
        mn, acc = c
        p = find_pairs_grid(mn - infl, maxs + infl, capacity=cap,
                            max_per_body=cfg.broad_phase_max_per_row,
                            cell_cap=cfg.bp_cell_cap,
                            global_cap=cfg.bp_global_cap,
                            cand_budget=cfg.bp_cand_budget,
                            ball_radius=radii_bp,
                            margin=params.prediction_distance,
                            dynamic=dyn)
        return mn + jnp.float32(1e-12) * p.count, acc + p.count

    t = abs_k(bp_body, (mins, jnp.int32(0)))
    bench._log(f"grid BP alone: {t:.2f} ms")

    pairs = state.bp_pairs
    colors = state.bp_colors[0]

    # 2) transfer_pair_colors (old list == new list: worst-case full match)
    def tr_body(i, c):
        cols, acc = c
        mapped = transfer_pair_colors(pairs.body_a, pairs.body_b,
                                      pairs.valid, pairs.body_a,
                                      pairs.body_b, pairs.valid, cols)
        return mapped, acc + jnp.sum(mapped)

    t = abs_k(tr_body, (colors, jnp.int32(0)))
    bench._log(f"transfer_pair_colors alone: {t:.2f} ms")

    # 3) assign_new_pair_colors with zero new pairs (steady-state refresh)
    def as_body(i, c):
        cols, acc = c
        out = assign_new_pair_colors(pairs.body_a, pairs.body_b,
                                     pairs.valid, cols, dyn[pairs.body_a],
                                     dyn[pairs.body_b], n,
                                     max_colors=cfg.max_colors,
                                     class_cap=cfg.gs_cmax,
                                     new_cap=cfg.bp_recolor_cap)
        return jnp.where(out > 0, cols, out), acc + jnp.sum(out)

    t = abs_k(as_body, (colors, jnp.int32(0)))
    bench._log(f"assign_new_pair_colors alone: {t:.2f} ms")

    # 4) full Luby recolor (what a > bp_recolor_cap churn refresh pays)
    def luby_body(i, c):
        cols, acc = c
        out = color_pairs(pairs.body_a, pairs.body_b,
                          pairs.valid & (cols >= 0), dyn[pairs.body_a],
                          dyn[pairs.body_b], n, max_colors=cfg.max_colors,
                          claim_rounds=cfg.bp_claim_rounds,
                          class_cap=cfg.gs_cmax)
        return out, acc + jnp.sum(out)

    t = abs_k(luby_body, (colors, jnp.int32(0)))
    bench._log(f"full Luby color_pairs alone: {t:.2f} ms")

    # 5) natural path mix over K steps: histogram of pair_count[3]
    K = 200

    @jax.jit
    def run_mix(s):
        def body(i, c):
            s, hist = c
            s2 = step(s, params, cfg)
            hist = hist.at[s2.pair_count[3]].add(1)
            return s2, hist
        return jax.lax.fori_loop(0, K, body, (s, jnp.zeros(3, jnp.int32)))

    t0 = time.time()
    s2, hist = jax.block_until_ready(run_mix(state))
    wall = time.time() - t0  # includes compile; rerun for time
    t0 = time.time()
    s2, hist = jax.block_until_ready(run_mix(state))
    wall = time.time() - t0
    hist = np.asarray(hist)
    bench._log(f"natural mix over {K} steps: hit={hist[0]} "
               f"repair={hist[1]} miss={hist[2]}; {wall / K * 1e3:.2f} "
               f"ms/step")


if __name__ == "__main__":
    main()
