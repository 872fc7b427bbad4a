"""Ladder-window sweep timing on the settled 10k pit (forced hit + natural).
Run: python scripts/profile_ladder.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import dataclasses  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402

from wgmath_tpu.pipeline import step, step_checked  # noqa: E402
from profile_step import settled_state  # noqa: E402
from profile_solve2 import time_k  # noqa: E402


def main():
    state, params, config = settled_state()
    config = dataclasses.replace(
        config, gs_windows=(256,) * config.max_colors,
        gs_tail_window=0)
    # settle the ladder (regrows from exported class counts)
    for i in range(4):
        state, config = step_checked(state, params, config)
    bench._log(f"ladder: {config.gs_windows}")
    cc = np.asarray(state.pair_count)[8:]
    bench._log(f"class counts: residue={cc[0]} classes={cc[1:].tolist()}")
    state = jax.block_until_ready(state)
    for force in ("hit", None):
        cfg = dataclasses.replace(config, bp_force=force)
        ms = time_k(state, params, cfg)
        bench._log(f"ladder bp_force={force}: {ms:.2f} ms/step "
                   f"({1000/ms:.1f} steps/s)")


if __name__ == "__main__":
    main()
