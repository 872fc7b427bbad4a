"""Sweep bp_repair_cap x bp_slack for the natural 10k step.

Round-3 baseline (cap=128, slack=0.02, batched cohort repair):
hit=102 repair=98 miss=0, 21.93 ms/step. A bigger cohort halves repair
frequency at ~linear [E, N] row cost; more slack cuts escape rate at the
price of more pairs (bigger sweep windows).

Run: python scripts/exp_repair_sweep.py > /tmp/exp_repair.log 2>&1
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

CONFIGS = [
    (128, 0.02),  # baseline (re-timed: the repair sphere prefilter changed it)
    (256, 0.02),
    (512, 0.02),
    (128, 0.035),
    (256, 0.035),
    (512, 0.05),
]


def main():
    state0, params, config0 = settled_state()
    base = dataclasses.replace(state0, bp_pairs=None, bp_ref=None,
                               bp_colors=None, solve_cache=None)
    K = 200
    for cap, slack in CONFIGS:
        cfg = dataclasses.replace(config0, gs_chained=True,
                                  bp_repair_cap=cap, bp_slack=slack,
                                  gs_windows=(256,) * config0.max_colors)
        state = base
        try:
            for _ in range(8):
                state, cfg = step_checked(state, params, cfg)
            state = jax.block_until_ready(state)

            @jax.jit
            def run_mix(s, cfg=cfg):
                def body(i, c):
                    s, hist = c
                    s2 = step(s, params, cfg)
                    hist = hist.at[s2.pair_count[3]].add(1)
                    return s2, hist
                return jax.lax.fori_loop(0, K, body,
                                         (s, jnp.zeros(3, jnp.int32)))

            jax.block_until_ready(run_mix(state))
            ts = []
            for _ in range(3):
                t0 = time.time()
                s2, hist = jax.block_until_ready(run_mix(state))
                ts.append(time.time() - t0)
            hist = np.asarray(hist)
            ms = min(ts) / K * 1e3
            bench._log(
                f"cap={cap} slack={slack}: pairs="
                f"{int(np.asarray(s2.pair_count)[0])} hit={hist[0]} "
                f"repair={hist[1]} miss={hist[2]}; {ms:.2f} ms/step "
                f"({1e3 / ms:.1f} steps/s)")
        except Exception as e:  # noqa: BLE001
            bench._log(f"cap={cap} slack={slack}: FAILED "
                       f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
