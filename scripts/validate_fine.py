"""Validate the fine-capacity + 128-quantum rung config on real TPU:
exactness vs the coarse chained run is covered by CPU tests; here we check
the timing (hit + natural) and that no capacity thrashes during 50 steps.

Run: python scripts/validate_fine.py
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
import numpy as np  # noqa: E402

from wgmath_tpu.pipeline import step_checked  # noqa: E402
from profile_fixed import bench_steady_state, time_k  # noqa: E402


def main():
    state, params, cfg = bench_steady_state()

    # capacity stability: 30 further checked steps must not regrow
    cfg2 = cfg
    st = state
    for _ in range(30):
        st, cfg2 = step_checked(st, params, cfg2)
    if cfg2 != cfg:
        changed = {f.name: (getattr(cfg, f.name), getattr(cfg2, f.name))
                   for f in dataclasses.fields(cfg)
                   if getattr(cfg, f.name) != getattr(cfg2, f.name)}
        bench._log(f"config kept growing over 30 checked steps: {changed}")
        cfg = cfg2
        state = st

    ms_hit = time_k(state, params, dataclasses.replace(cfg, bp_force="hit"))
    bench._log(f"fine chained hit: {ms_hit:.2f} ms/step")
    ms_nat = time_k(state, params, cfg)
    bench._log(f"fine chained natural: {ms_nat:.2f} ms/step "
               f"({1e3 / ms_nat:.1f} steps/s)")


if __name__ == "__main__":
    main()
