"""Measure minimize_colors (TOPO-GC-style reseating) on the bench scene.

VERDICT r03 item 5: Luby colors the settled 10k graph in ~12 classes; each
occupied class costs one GS rung (~8 sweep passes x ~55 us dispatch per
step). This experiment loads the committed settled state, forces a full
recolor with and without the reseating pass, and reports (a) occupied class
counts + per-class sizes and (b) K-chained ms/step for chained_rr at
sweeps=0/1/2.

Run on the TPU (one measurement process at a time):
    python scripts/exp_min_colors.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from wgmath_tpu.pipeline import step, step_checked

K = 50


def class_histogram(state, cfg):
    cols = np.asarray(state.bp_colors[0])
    valid = np.asarray(state.bp_pairs.valid)
    occ = cols[valid & (cols > 0)]
    uniq, cnt = np.unique(occ, return_counts=True)
    return dict(zip(uniq.tolist(), cnt.tolist()))


def main():
    state0, params, steady_base, ladder = bench.physics_steady_setup()
    base = dataclasses.replace(ladder, gs_chained=True, gs_rhs_in_rung=True)

    # (mode, pair_slots, sweeps): rr sweeps=0 is the round-3 baseline; ps
    # is the round-4 winner the result has to move.
    grid = [("rr", False, 0), ("rr", False, 2),
            ("ps", True, 0), ("ps", True, 1), ("ps", True, 2)]
    for mode, ps, sweeps in grid:
        cfg = dataclasses.replace(base, gs_pair_slots=ps,
                                  bp_min_color_sweeps=sweeps)
        st = state0  # bp cache dropped by the loader -> full recolor
        t0 = time.time()
        for _ in range(6):
            st, cfg = step_checked(st, params, cfg)
        st = jax.block_until_ready(st)
        hist = class_histogram(st, cfg)
        sizes = sorted(hist.values(), reverse=True)
        print(f"{mode} sweeps={sweeps}: {len(hist)} occupied classes, "
              f"sizes={sizes} (warmup {time.time()-t0:.0f}s)", flush=True)

        @jax.jit
        def run_k(s, cfg=cfg):
            def body(i, ss):
                return step(ss, params, cfg)
            out = jax.lax.fori_loop(0, K, body, s)
            return out.bodies.poses.translation, out.pair_count

        out = jax.block_until_ready(run_k(st))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = jax.block_until_ready(run_k(st))
            ts.append(time.time() - t0)
        print(f"  chained_{mode} sweeps={sweeps}: {min(ts)/K*1e3:.2f} "
              f"ms/step ({K/min(ts):.1f} steps/s), contacts="
              f"{int(np.asarray(out[1])[1])}", flush=True)


if __name__ == "__main__":
    main()
