"""Color-count ladder experiment on the forced-hit 10k step.

Hypothesis: with the per-color window ladder, total gather/scatter ROWS per
sweep are ~fixed (= 2x constraints), so per-color op dispatch overhead makes
FEWER, WIDER colors strictly cheaper. Sweep (max_colors, gs_cmax) configs,
let step_checked re-bucket the ladder, then absolute-time the hit path.

Run: python scripts/profile_colors.py
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import jax  # noqa: E402
import numpy as np  # noqa: E402

from wgmath_tpu.pipeline import step_checked  # noqa: E402
from profile_step import settled_state  # noqa: E402
from profile_substep import time_k  # noqa: E402


def main():
    state, params, config = settled_state()

    variants = [
        ("bench-current", dict()),
        ("mc16-cap2048", dict(max_colors=16, gs_cmax=2048)),
        ("mc12-cap4096", dict(max_colors=12, gs_cmax=4096)),
        ("mc10-cap6144", dict(max_colors=10, gs_cmax=6144)),
    ]
    for name, over in variants:
        cfg = dataclasses.replace(
            config, gs_windows=(), gs_tail_window=0, **over)
        st = state
        # re-bucket: colors, ladder rungs, caps all settle via the
        # device-count overflow contract
        for _ in range(8):
            st, cfg = step_checked(st, params, cfg)
        st = jax.block_until_ready(st)
        pc = np.asarray(st.pair_count)
        hit_cfg = dataclasses.replace(cfg, bp_force="hit")
        ms = time_k(st, params, hit_cfg)
        bench._log(
            f"{name}: {ms:.2f} ms/step hit  (colors head={pc[2]}, "
            f"windows={cfg.gs_windows and len(cfg.gs_windows)} "
            f"rungs={cfg.gs_windows} gs_cmax={cfg.gs_cmax} "
            f"max_colors={cfg.max_colors})")


if __name__ == "__main__":
    main()
