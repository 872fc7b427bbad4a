"""Validate + time the effectively-uncapped coloring (gs_cmax=8192) on TPU.

CPU result (exp_degree_priority.py): capless Luby colors the settled 10k
pair graph in 12 classes (front-loaded 5025..3) vs 17-24 capped. Expect
the pruned chained ladder to drop to ~12 rungs and the forced-hit step to
shed ~5 rungs x 8 passes x ~55 us ~= 2 ms.

Run: python scripts/validate_capless.py > /tmp/validate_capless.log 2>&1
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


def time_k(state, params, config, K=40, reps=3, mix=False):
    @jax.jit
    def run_k(s):
        def body(i, c):
            s, hist = c
            s2 = step(s, params, config)
            return s2, hist.at[s2.pair_count[3]].add(1)
        return jax.lax.fori_loop(0, K, body, (s, jnp.zeros(3, jnp.int32)))

    jax.block_until_ready(run_k(state))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(run_k(state))
        ts.append(time.time() - t0)
    hist = np.asarray(out[1])
    return min(ts) / K * 1e3, hist


def main():
    state0, params, config0 = settled_state()
    base = dataclasses.replace(state0, bp_pairs=None, bp_ref=None,
                               bp_colors=None, solve_cache=None)
    for cmax in (8192,):
        cfg = dataclasses.replace(config0, gs_chained=True, bp_slack=0.035,
                                  gs_cmax=cmax,
                                  gs_windows=(256,) * config0.max_colors)
        state = base
        for _ in range(8):
            state, cfg = step_checked(state, params, cfg)
        state = jax.block_until_ready(state)
        nz = sum(1 for w in cfg.gs_windows if w)
        bench._log(f"cmax={cmax}: windows={cfg.gs_windows} ({nz} rungs)")

        # settled sanity: the pile must stay calm for 60 natural frames
        @jax.jit
        def run60(s):
            def body(i, s):
                return step(s, params, cfg)
            return jax.lax.fori_loop(0, 60, body, s)

        s60 = jax.block_until_ready(run60(state))
        maxv = float(jnp.max(jnp.abs(s60.bodies.vels.linear)))
        pos_ok = bool(jnp.all(jnp.isfinite(s60.bodies.poses.translation)))
        bench._log(f"cmax={cmax}: 60-frame natural max|v|={maxv:.3f} "
                   f"finite={pos_ok}")
        assert pos_ok and maxv < 1.0

        ms_hit, _ = time_k(state, params,
                           dataclasses.replace(cfg, bp_force="hit"))
        bench._log(f"cmax={cmax}: forced-hit {ms_hit:.2f} ms/step")
        ms_nat, hist = time_k(state, params, cfg, K=200)
        bench._log(f"cmax={cmax}: natural {ms_nat:.2f} ms/step "
                   f"({1e3 / ms_nat:.1f} steps/s) mix hit={hist[0]} "
                   f"repair={hist[1]} miss={hist[2]}")


if __name__ == "__main__":
    main()
