"""Phase bisect of the pruned chained step on real TPU.

Times the chained+pruned config at substeps=1/2/4 (fixed-vs-substep split)
and at bp_force=hit/miss (cache-path split) from a fresh steady-state
recolor. Run after validate_prune.py.

Run: python scripts/profile_chained.py > /tmp/profile_chained.log 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import dataclasses  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402

from wgmath_tpu.dynamics import SimParams  # noqa: E402
from wgmath_tpu.pipeline import step, step_checked  # noqa: E402
from profile_step import settled_state  # noqa: E402


def time_k(state, params, config, K=50, reps=3):
    state = jax.block_until_ready(step(state, params, config))

    @jax.jit
    def run_k(state):
        def body(i, s):
            return step(s, params, config)
        s = jax.lax.fori_loop(0, K, body, state)
        return s.bodies.poses.translation, s.pair_count

    jax.block_until_ready(run_k(state))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(run_k(state))
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
    bench._log(f"windows={cfg.gs_windows}")

    # fixed-vs-substep split (forced hit so the BP path is constant)
    ms = {}
    for sub in (1, 2, 4):
        p = dataclasses.replace(params, num_solver_iterations=sub)
        ms[sub] = time_k(state, p, dataclasses.replace(cfg, bp_force="hit"),
                         K=30)
        bench._log(f"substeps={sub}: {ms[sub]:.2f} ms/step")
    per = (ms[4] - ms[1]) / 3.0
    bench._log(f"per-substep={per:.2f} ms, fixed(np+setup+glue)="
               f"{ms[1] - per:.2f} ms")

    # cache-path split
    for force in ("hit", "miss", "repair"):
        t = time_k(state, params, dataclasses.replace(cfg, bp_force=force),
                   K=20)
        bench._log(f"bp_force={force}: {t:.2f} ms/step")


if __name__ == "__main__":
    main()
