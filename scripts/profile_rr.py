"""Substep-count scaling of the rhs-in-rung chained hit path: fixed vs
per-substep cost (absolute K-chained timing).

Run: python scripts/profile_rr.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import bench  # noqa: E402
import dataclasses  # noqa: E402

import jax  # noqa: E402

from wgmath_tpu.pipeline import step_checked  # noqa: E402
from profile_fixed import time_k  # noqa: E402


def main():
    state, params, steady_base, ladder = bench.physics_steady_setup()
    cfg = dataclasses.replace(ladder, gs_chained=True, gs_rhs_in_rung=True)
    for _ in range(6):
        state, cfg = step_checked(state, params, cfg)
    state = jax.block_until_ready(state)

    hit = dataclasses.replace(cfg, bp_force="hit")
    ms = {}
    for s in (1, 2, 4):
        p = dataclasses.replace(params, num_solver_iterations=s)
        ms[s] = time_k(state, p, hit)
        bench._log(f"substeps={s}: {ms[s]:.2f} ms/step")
    per = (ms[4] - ms[1]) / 3
    bench._log(f"per-substep={per:.2f} ms, fixed={ms[1] - per:.2f} ms")

    # natural-path mix for the record
    ms_nat = time_k(state, params, cfg)
    bench._log(f"natural: {ms_nat:.2f} ms/step ({1e3 / ms_nat:.1f} steps/s)")


if __name__ == "__main__":
    main()
