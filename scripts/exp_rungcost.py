"""Measure the marginal cost of a sweep rung: time the forced-hit chained
step with the standard pruned ladder vs the same ladder with its tail
rungs zeroed (classes park — physically wrong, timing-only probe).

If the saving is ~n_removed x 2 sweeps x 4 substeps x ~55 us, the sweep is
rung-dispatch bound and packing tail color classes (18 -> ~13 via greedy
first-fit at recolor time) is worth ~2+ ms/step.

Run: python scripts/exp_rungcost.py > /tmp/exp_rungcost.log 2>&1
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


def time_k(state, params, config, K=40, reps=3):
    @jax.jit
    def run_k(s):
        def body(i, s):
            return step(s, params, config)
        s = jax.lax.fori_loop(0, K, body, s)
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
    cfg = dataclasses.replace(config0, gs_chained=True, bp_slack=0.035,
                              gs_windows=(256,) * config0.max_colors)
    for _ in range(8):
        state, cfg = step_checked(state, params, cfg)
    state = jax.block_until_ready(state)
    wins = cfg.gs_windows
    nz = [i for i, w in enumerate(wins) if w]
    bench._log(f"windows={wins} ({len(nz)} rungs)")

    base = dataclasses.replace(cfg, bp_force="hit")
    t_full = time_k(state, params, base)
    bench._log(f"full ladder ({len(nz)} rungs): {t_full:.2f} ms/step")

    for cut in (5, 9):
        wz = list(wins)
        removed = 0
        for i in reversed(nz):
            if removed == cut:
                break
            wz[i] = 0
            removed += 1
        cfgz = dataclasses.replace(base, gs_windows=tuple(wz))
        t = time_k(state, params, cfgz)
        per_rung_us = (t_full - t) / cut / (2 * 4) * 1e3
        bench._log(f"tail-{cut} zeroed ({len(nz) - cut} rungs): {t:.2f} "
                   f"ms/step -> {per_rung_us:.0f} us per rung-sweep-substep")


if __name__ == "__main__":
    main()
