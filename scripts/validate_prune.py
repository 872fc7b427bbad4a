"""Validate + time the pruned chained ladder on real TPU.

Fresh steady-state recolor (BP cache stripped, like bench now does) →
step_checked warmups grow occupied rungs and prune trailing empties →
exactness vs the unpruned ladder from the same state → absolute timing.

Run: python scripts/validate_prune.py > /tmp/validate_prune.log 2>&1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets compile cache)
import dataclasses  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402

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
    bench._log(f"pruned windows={cfg.gs_windows}")
    nz = sum(1 for w in cfg.gs_windows if w)
    bench._log(f"ladder length {nz} of {len(cfg.gs_windows)}")

    # exactness: one step pruned vs floor-256 unpruned from the same state
    unpruned = dataclasses.replace(
        cfg, gs_windows=tuple(w or 256 for w in cfg.gs_windows))
    s_p = jax.block_until_ready(step(state, params, cfg))
    s_u = jax.block_until_ready(step(state, params, unpruned))
    dv = np.abs(np.asarray(s_p.bodies.vels.linear)
                - np.asarray(s_u.bodies.vels.linear)).max()
    dp = np.abs(np.asarray(s_p.bodies.poses.translation)
                - np.asarray(s_u.bodies.poses.translation)).max()
    bench._log(f"pruned vs unpruned 1-step: max |dv|={dv:.3e} |dp|={dp:.3e}")
    assert dv == 0.0 and dp == 0.0, "prune changed the physics"

    for force in ("hit", None):
        tag = f"bp_force={force}" if force else "natural"
        ms = time_k(state, params, dataclasses.replace(cfg, bp_force=force))
        bench._log(f"[{tag}] chained+pruned: {ms:.2f} ms/step "
                   f"({1e3 / ms:.1f} steps/s)")


if __name__ == "__main__":
    main()
