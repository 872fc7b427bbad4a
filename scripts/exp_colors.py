"""Measure sweep-ladder shape + step time vs Luby claim rounds.

The per-color sweep pays a fixed dispatch/gather overhead, so fewer, fuller
color classes shorten the ladder. claim_rounds densifies each class toward
a maximal independent set at (amortized) recolor time. This times the
chained sweep at claim_rounds 4 (default) vs 10 on the settled 10k scene.

Run: python scripts/exp_colors.py > /tmp/exp_colors.log 2>&1
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


def time_k(state, params, config, K=30, reps=3):
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
    for rounds in (4, 10):
        cfg = dataclasses.replace(
            config0, bp_claim_rounds=rounds, gs_chained=True,
            gs_windows=(256,) * config0.max_colors)
        # strip the BP cache → the first step takes the full-recolor path
        # with the new claim_rounds
        state = dataclasses.replace(state0, bp_pairs=None, bp_ref=None,
                                    bp_colors=None, solve_cache=None)
        for _ in range(8):
            state, cfg = step_checked(state, params, cfg)
        state = jax.block_until_ready(state)
        w = cfg.gs_windows
        bench._log(f"rounds={rounds}: windows={w} "
                   f"sum={sum(w)} n>{256}={sum(1 for x in w if x > 256)}")
        counts = np.asarray(state.pair_count)
        bench._log(f"rounds={rounds}: class counts={counts[8:].tolist()}")
        ms = time_k(state, params, cfg)
        bench._log(f"rounds={rounds}: chained natural {ms:.2f} ms/step")
        ms_h = time_k(state, params,
                      dataclasses.replace(cfg, bp_force="hit"))
        bench._log(f"rounds={rounds}: chained bp=hit  {ms_h:.2f} ms/step")


if __name__ == "__main__":
    main()
