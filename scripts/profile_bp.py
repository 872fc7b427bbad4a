"""End-to-end broad-phase comparison on the settled 10k state (real TPU)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scripts.profile_step import settled_state  # noqa: E402
from wgmath_tpu.broad_phase.brute_force import find_pairs  # noqa: E402
from wgmath_tpu.broad_phase.grid import find_pairs_grid  # noqa: E402
from wgmath_tpu.shapes.shape import ball_radii_or_nan, world_aabbs  # noqa: E402


def main():
    import dataclasses

    state, params, config = settled_state()

    shapes = state.shapes
    poses = state.bodies.poses

    def consume(p):
        return (p.count.astype(jnp.float32)
                + jnp.sum(p.body_a + p.body_b).astype(jnp.float32) * 1e-9)

    def make(kind):
        def mk(k):
            @jax.jit
            def f(poses):
                def body(i, acc):
                    mn, mx = world_aabbs(shapes, poses,
                                         margin=params.prediction_distance)
                    r = ball_radii_or_nan(shapes, poses)
                    if kind == "grid":
                        p = find_pairs_grid(
                            mn + acc * 0, mx, capacity=config.pair_capacity,
                            max_per_body=config.broad_phase_max_per_row,
                            cell_cap=config.bp_cell_cap,
                            global_cap=config.bp_global_cap,
                            ball_radius=r, margin=params.prediction_distance)
                    else:
                        p = find_pairs(
                            mn + acc * 0, mx, capacity=config.pair_capacity,
                            block=config.broad_phase_block,
                            max_per_row=config.broad_phase_max_per_row,
                            ball_radius=r, margin=params.prediction_distance)
                    return acc + consume(p)
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f
        return mk

    # sanity: identical counts
    mn, mx = world_aabbs(shapes, poses, margin=params.prediction_distance)
    r = ball_radii_or_nan(shapes, poses)
    pg = find_pairs_grid(mn, mx, capacity=config.pair_capacity,
                         max_per_body=config.broad_phase_max_per_row,
                         cell_cap=config.bp_cell_cap,
                         global_cap=config.bp_global_cap,
                         ball_radius=r, margin=params.prediction_distance)
    pb = find_pairs(mn, mx, capacity=config.pair_capacity,
                    block=config.broad_phase_block,
                    max_per_row=config.broad_phase_max_per_row,
                    ball_radius=r, margin=params.prediction_distance)
    bench._log(f"counts: grid={int(pg.count)} brute={int(pb.count)}")

    for kind in ("grid", "brute"):
        t = bench.slope_time(make(kind), (poses,), k_small=2, k_large=16,
                             reps=2)
        bench._log(f"bp_{kind}: {t * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
