"""Split solve cost into setup vs per-substep: time the forced-hit step at
num_solver_iterations = 1, 2, 4. cost(n) ≈ (np+glue+setup) + n · per_substep.
Run: python scripts/profile_solve2.py
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

from wgmath_tpu.pipeline import step, step_checked  # noqa: E402
from profile_step import settled_state  # noqa: E402


def time_k(state, params, config, K=50, reps=3):
    @jax.jit
    def run_k(state):
        def body(i, s):
            return step(s, params, config)
        s = jax.lax.fori_loop(0, K, body, state)
        return s.bodies.poses.translation, s.bodies.vels.linear, s.pair_count

    out = jax.block_until_ready(run_k(state))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(run_k(state))
        ts.append(time.time() - t0)
    return min(ts) / K * 1e3


def main():
    state, params, config = settled_state()
    for _ in range(3):
        state, config = step_checked(state, params, config)
    state = jax.block_until_ready(state)
    cfg = dataclasses.replace(config, bp_force="hit")
    res = {}
    for n_sub in (1, 2, 4):
        p = dataclasses.replace(params, num_solver_iterations=n_sub)
        ms = time_k(state, p, cfg)
        res[n_sub] = ms
        bench._log(f"substeps={n_sub}: {ms:.2f} ms/step")
    per_sub = (res[4] - res[1]) / 3.0
    base = res[1] - per_sub
    bench._log(f"per-substep={per_sub:.2f} ms, fixed(np+setup+glue)="
               f"{base:.2f} ms")


if __name__ == "__main__":
    main()
