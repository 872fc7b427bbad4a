"""Validate rhs-in-rung on real TPU: exactness vs the ladder (50 chained
steps from the same settled state) + hit/natural timing.

Run: python scripts/validate_rhs.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import bench  # noqa: E402
import dataclasses  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402

from wgmath_tpu.pipeline import step, step_checked  # noqa: E402
from profile_fixed import time_k  # noqa: E402


def run50(state, params, cfg, K=50):
    import jax.numpy as jnp

    @jax.jit
    def run_k(s0):
        def body(i, s):
            return step.__wrapped__(s, params, cfg)
        s = jax.lax.fori_loop(0, K, body, s0)
        return s.bodies.poses.translation
    return np.asarray(jax.block_until_ready(run_k(state)))


def main():
    state0, params, steady_base, ladder = bench.physics_steady_setup()

    def warm(cfg):
        st, c = state0, cfg
        for _ in range(6):
            st, c = step_checked(st, params, c)
        return jax.block_until_ready(st), c

    st_l, cfg_l = warm(ladder)
    pos_ref = run50(st_l, params, cfg_l)
    bench._log("ladder 50-step reference done")

    cfg_rr0 = dataclasses.replace(ladder, gs_chained=True,
                                  gs_rhs_in_rung=True)
    st_r, cfg_rr = warm(cfg_rr0)
    pos_rr = run50(st_r, params, cfg_rr)
    err = float(np.max(np.abs(pos_rr - pos_ref)))
    finite = bool(np.isfinite(pos_rr).all())
    bench._log(f"rhs-in-rung vs ladder after 50 steps: max|dp|={err:.3g} m "
               f"finite={finite}")

    ms_hit = time_k(st_r, params,
                    dataclasses.replace(cfg_rr, bp_force="hit"))
    bench._log(f"rhs-in-rung hit: {ms_hit:.2f} ms/step")
    ms_nat = time_k(st_r, params, cfg_rr)
    bench._log(f"rhs-in-rung natural: {ms_nat:.2f} ms/step "
               f"({1e3 / ms_nat:.1f} steps/s)")


if __name__ == "__main__":
    main()
