"""Validate + time the chained (scatter-free) GS sweep on the real TPU.

1. Exactness: one step ladder vs chained from the same warmed settled state
   (tolerances cover the one float re-association per velocity write).
2. Multi-frame stability: 50 chained steps stay finite and track the ladder.
3. Timing: K=50 chained steps in one jit, min of 3 (absolute doctrine).

Run: python scripts/validate_chained_tpu.py [--quick]
Writes progress to stdout (tee to a file; grep|tail block-buffers).
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
    # one step outside the loop normalizes the solve-cache pytree (the
    # chained bundle is 8-tuple vs the ladder's 6) so the fori carry is
    # structure-stable
    state = jax.block_until_ready(step(state, params, config))

    @jax.jit
    def run_k(state):
        def body(i, s):
            return step(s, params, config)
        s = jax.lax.fori_loop(0, K, body, state)
        return s.bodies.poses.translation, s.bodies.vels.linear, s.pair_count

    jax.block_until_ready(run_k(state))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(run_k(state))
        ts.append(time.time() - t0)
    return min(ts) / K * 1e3


def main():
    state, params, config = settled_state()
    # mirror bench's ladder candidate: seed the per-color window ladder and
    # let checked steps re-bucket the rungs to the settled class sizes
    config = dataclasses.replace(
        config, gs_windows=(256,) * config.max_colors)
    for _ in range(6):
        state, config = step_checked(state, params, config)
    state = jax.block_until_ready(state)
    cfg_lad = config
    cfg_chn = dataclasses.replace(config, gs_chained=True)
    bench._log(f"windows={config.gs_windows} max_colors={config.max_colors}")
    assert config.gs_windows, "ladder windows missing - chained would be inert"

    # --- exactness: one step each from the identical warmed state
    s_lad = jax.block_until_ready(step(state, params, cfg_lad,
                                       warmstart=True))
    s_chn = jax.block_until_ready(step(state, params, cfg_chn,
                                       warmstart=True))
    dv = np.abs(np.asarray(s_chn.bodies.vels.linear)
                - np.asarray(s_lad.bodies.vels.linear)).max()
    dp = np.abs(np.asarray(s_chn.bodies.poses.translation)
                - np.asarray(s_lad.bodies.poses.translation)).max()
    bench._log(f"1-step: max |dv|={dv:.3e}  max |dp|={dp:.3e}")
    assert dv < 1e-3 and dp < 1e-4, "chained diverges from ladder"

    # --- multi-frame stability
    sc = s_chn
    for i in range(10):
        sc, cfg_chn = step_checked(sc, params, cfg_chn)
    sc = jax.block_until_ready(sc)
    t = np.asarray(sc.bodies.poses.translation)
    assert np.isfinite(t).all(), "chained state went non-finite"
    bench._log(f"10 chained frames OK (pair_count={np.asarray(sc.pair_count)[:5]})")

    # --- timing (forced hit + natural)
    for force in ("hit", None):
        tag = f"bp_force={force}" if force else "natural"
        cl = dataclasses.replace(cfg_lad, bp_force=force)
        cc = dataclasses.replace(cfg_chn, bp_force=force)
        ms_l = time_k(state, params, cl)
        bench._log(f"[{tag}] ladder : {ms_l:.2f} ms/step")
        ms_c = time_k(state, params, cc)
        bench._log(f"[{tag}] chained: {ms_c:.2f} ms/step "
                   f"({ms_l / ms_c:.2f}x ladder)")


if __name__ == "__main__":
    main()
