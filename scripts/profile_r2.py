"""Round-2 hit/repair/miss decomposition on real TPU (absolute timing).

Times K=50 chained steps under bp_force in {None, hit, miss} plus a forced
repair, on the settled 10k ball_pit checkpoint. All outputs consumed.
Run: python scripts/profile_r2.py [--resettle]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (sets compile cache)
import dataclasses
import jax, jax.numpy as jnp, numpy as np
from wgmath_tpu.pipeline import PipelineConfig, step, step_checked
from profile_step import settled_state

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
        t0 = time.time(); out = jax.block_until_ready(run_k(state))
        ts.append(time.time() - t0)
    return min(ts) / K * 1e3, np.asarray(out[2])

def main():
    state, params, config = settled_state()
    counts = np.asarray(state.pair_count)
    bench._log(f"counts={counts.tolist()} caps: pair={config.pair_capacity} "
               f"contact={config.contact_capacity} gs_cmax={config.gs_cmax} "
               f"tail={config.gs_tail_window} mp={config.manifold_points}")
    # make sure the state is warm under the CURRENT config (pair_count [8],
    # repair path fields materialized)
    for _ in range(3):
        state, config = step_checked(state, params, config)
    bench._log(f"warm counts={np.asarray(state.pair_count).tolist()}")
    for force in (None, "hit", "repair", "miss"):
        cfg = dataclasses.replace(config, bp_force=force)
        ms, cts = time_k(state, params, cfg)
        bench._log(f"bp_force={force}: {ms:.2f} ms/step ({1000/ms:.1f} steps/s) "
                   f"end_counts={cts.tolist()}")

if __name__ == "__main__":
    main()
