"""Reference-scale stress scene: pyramid(50) = 42,925 cuboids + ground
(≙ examples3d/pyramid3.rs:36-76 at the reference's demo scale).

Settles on the real TPU with capacity re-bucketing, reports steady-state
step rate (absolute K-chained timing), and dumps a rendered artifact via
the testbed recorder (artifacts/pyramid43k.npz + .png frames).

Run: python scripts/run_pyramid43k.py [--frames 240]
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
from wgmath_tpu.scenes.builders import pyramid  # noqa: E402
from wgmath_tpu.testbed.viewer import Recorder  # noqa: E402


def main():
    frames = 240
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    state = pyramid(50)
    n = state.bodies.poses.translation.shape[0]
    bench._log(f"pyramid(50): {n} bodies")
    params = SimParams()
    # seeded near the expected jammed scale (~6-10 AABB neighbors per box)
    # so the capacity re-buckets cost a handful of recompiles, not a dozen
    config = PipelineConfig(
        pair_capacity=262144, contact_capacity=131072, max_colors=24,
        broad_phase_block=512, gs_cmax=8192, bp_slack=0.0,
        sat_pair_capacity=131072, bc_pair_capacity=256,
        # grid-BP budgets seeded for the dense 43k box lattice: cell size
        # == box size here, so each body sees ~27-54 pre-compaction
        # candidates — the 48 default truncated the pair list from frame
        # ~5, the missing support contacts collapsed the pyramid, and the
        # collapse blew every downstream capacity (round-5 first run)
        bp_cand_budget=216, bp_cell_cap=16, bp_global_cap=32,
        broad_phase_max_per_row=128,
        manifold_points=auto_manifold_points(
            state.shapes, 3, dynamic=np.asarray(state.bodies.is_dynamic())))
    rec = Recorder(state)
    rec.record(state)
    t0 = time.time()
    for f in range(frames):
        state, config = step_checked(state, params, config)
        if f % 10 == 0:
            state = jax.block_until_ready(state)
            maxv = float(jnp.max(jnp.abs(state.bodies.vels.linear)))
            pc = np.asarray(state.pair_count)
            bench._log(f"frame {f}: pairs={pc[0]} contacts={pc[1]} "
                       f"maxvel={maxv:.3f} wall={time.time() - t0:.0f}s")
            rec.record(state)
            if f >= 60 and maxv < 0.05:
                break
    os.makedirs("artifacts", exist_ok=True)
    rec.save("artifacts/pyramid43k.npz")
    bench._log("saved artifacts/pyramid43k.npz")

    # steady-state rate, absolute timing of K chained steps
    K = 20
    cfg = config

    @jax.jit
    def run_k(s):
        def body(i, s):
            return step(s, params, cfg)

        s = jax.lax.fori_loop(0, K, body, s)
        return s.bodies.poses.translation, s.pair_count

    bench._sync(run_k(state))  # tunnel: block_until_ready is unreliable
    ts = []
    for _ in range(3):
        t0 = time.time()
        bench._sync(run_k(state))
        ts.append(time.time() - t0)
    ms = min(ts) / K * 1e3
    bench._log(f"pyramid 42.9k steady state: {ms:.1f} ms/step "
               f"({1000.0 / ms:.1f} steps/s)")

    from wgmath_tpu.testbed.viewer import render_npz

    paths = render_npz("artifacts/pyramid43k.npz", "artifacts/pyramid43k",
                       every=4, gif="artifacts/pyramid43k.gif")
    bench._log(f"rendered {len(paths)} frames + artifacts/pyramid43k.gif")


if __name__ == "__main__":
    main()
