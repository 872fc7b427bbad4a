"""Joints-at-scale stress: ball_net3(100,100) = 10,000 balls + 19,800
spherical joints draping over a static dome onto the ground.

The reference solves joints inside the same substep loop as contacts
(solver.rs:238-460, joint.rs:368-460); this measures the repo's jointed
path at the 10k-body bench scale on the chained fast path (VERDICT r04
item 5: jointed-at-scale steps/s >= 60).

Run: python scripts/run_jointed10k.py [--frames 400]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (compile cache + logging)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wgmath_tpu.dynamics import SimParams  # noqa: E402
from wgmath_tpu.pipeline import (  # noqa: E402
    PipelineConfig,
    auto_manifold_points,
    step,
    step_checked,
)
from wgmath_tpu.scenes.builders import ball_net3  # noqa: E402


def main():
    frames = 400
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    state = ball_net3(100, 100)
    n = state.bodies.poses.translation.shape[0]
    nj = state.joints.body_a.shape[0]
    ncol = int(np.max(np.asarray(state.joints.colors))) + 1
    bench._log(f"ball_net3: {n} bodies, {nj} joints in {ncol} colors")
    params = SimParams()
    config = PipelineConfig(
        pair_capacity=65536, contact_capacity=32768, max_colors=24,
        broad_phase_block=512, gs_cmax=4096, bp_slack=0.0,
        manifold_points=auto_manifold_points(
            state.shapes, 3, dynamic=np.asarray(state.bodies.is_dynamic())))
    t0 = time.time()
    for f in range(frames):
        state, config = step_checked(state, params, config)
        if f % 20 == 0:
            state = jax.block_until_ready(state)
            maxv = float(jnp.max(jnp.abs(state.bodies.vels.linear)))
            pc = np.asarray(state.pair_count)
            bench._log(f"frame {f}: pairs={pc[0]} contacts={pc[1]} "
                       f"maxvel={maxv:.3f} wall={time.time() - t0:.0f}s")
            if f >= 120 and maxv < 0.08:
                break

    # steady state: grow the chained ladder via checked steps, then time
    from wgmath_tpu.pipeline import fine_bucket

    cnt = np.asarray(state.pair_count)
    steady = dataclasses.replace(
        config, bp_slack=0.035, gs_cmax=8192, fine_capacities=True,
        gs_rung_quantum=128, gs_rung_headroom=1.08,
        pair_capacity=fine_bucket(int(cnt[0]) * 13 // 10),
        contact_capacity=fine_bucket(int(cnt[1])))
    results = {}
    for name, cfg in [
        ("ladder", dataclasses.replace(
            steady, gs_windows=(128,) * steady.max_colors)),
        ("chained_ps", dataclasses.replace(
            steady, gs_windows=(128,) * steady.max_colors,
            gs_chained=True, gs_rhs_in_rung=True, gs_pair_slots=True)),
    ]:
        try:
            warm = state
            for _ in range(6):  # rung growth + warmstart establishment
                warm, cfg = step_checked(warm, params, cfg)
            warm = jax.block_until_ready(warm)
            K = 30

            @jax.jit
            def run_k(s):
                def body(i, s):
                    return step(s, params, cfg)  # noqa: B023

                s = jax.lax.fori_loop(0, K, body, s)
                return s.bodies.poses.translation, s.pair_count

            bench._sync(run_k(warm))
            ts = []
            for _ in range(3):
                t1 = time.time()
                bench._sync(run_k(warm))
                ts.append(time.time() - t1)
            ms = min(ts) / K * 1e3
            results[name] = ms
            bench._log(f"jointed 10k [{name}]: {ms:.2f} ms/step "
                       f"({1000.0 / ms:.1f} steps/s)")
        except Exception as e:  # noqa: BLE001 - report and move on
            bench._log(f"jointed 10k [{name}] FAILED: {type(e).__name__}: "
                       f"{e}")
    if results:
        best = min(results, key=results.get)
        bench._log(f"jointed 10k best: {best} {results[best]:.2f} ms/step "
                   f"({1000.0 / results[best]:.1f} steps/s)")


if __name__ == "__main__":
    main()
