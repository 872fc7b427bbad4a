"""TPU validation of the fused sweep + builder (run when the tunnel is up).

1. exp_dyngather probe findings are subsumed: this compiles the REAL
   kernels (Mosaic accepts or rejects tpu.dynamic_gather at our shapes).
2. Correctness: fused step vs ladder step on a 160-ball pile, on-device.
3. Perf: forced-hit absolute timing of the settled 10k pit, fused vs
   current config.

Run: python scripts/validate_fused_tpu.py [--skip-10k]
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (compile cache + logging)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wgmath_tpu.dynamics import SimParams  # noqa: E402
from wgmath_tpu.pipeline import PipelineConfig, step, step_checked  # noqa: E402
from wgmath_tpu.scenes.builders import balls  # noqa: E402


def small_correctness():
    params = SimParams()
    base = PipelineConfig(pair_capacity=2048, contact_capacity=1024,
                          max_colors=12, gs_cmax=256, bp_slack=0.03,
                          bp_algo="grid", manifold_points=1,
                          gs_windows=(256,) * 12)
    state = balls(160, dim=3)
    cfg = base
    for _ in range(30):
        state, cfg = step_checked(state, params, cfg)
    state = jax.block_until_ready(state)
    s_lad = jax.block_until_ready(step(state, params, cfg, warmstart=True))
    bench._log("ladder step ok")
    good = None
    for name, cfg_f in (
            ("fused[pallas]", dataclasses.replace(cfg, gs_fused=True,
                                                  gs_rung0=256)),
            ("fused[xla]", dataclasses.replace(cfg, gs_fused=True,
                                               gs_rung0=256,
                                               gs_fused_pallas=False))):
        try:
            s_fus = jax.block_until_ready(
                step(state, params, cfg_f, warmstart=True))
        except Exception as e:
            bench._log(f"{name} FAILED to compile/run: "
                       f"{type(e).__name__}: {str(e)[:160]}")
            continue
        bench._log(f"{name} step COMPILED AND RAN on TPU")
        dv = np.abs(np.asarray(s_fus.bodies.vels.linear)
                    - np.asarray(s_lad.bodies.vels.linear)).max()
        dp = np.abs(np.asarray(s_fus.bodies.poses.translation)
                    - np.asarray(s_lad.bodies.poses.translation)).max()
        bench._log(f"{name} vs ladder: max |dv|={dv:.3e} |dp|={dp:.3e}")
        assert dv < 1e-3 and dp < 1e-4, (dv, dp)
        # multi-frame stability on device
        sf, cf = s_fus, cfg_f
        for _ in range(5):
            sf, cf = step_checked(sf, params, cf)
        assert np.isfinite(np.asarray(sf.bodies.poses.translation)).all()
        bench._log(f"{name} multi-frame ok")
        good = good or cfg_f
    assert good is not None, "no fused variant ran on this backend"
    return good


def big_perf(fused_base):
    from profile_substep import time_k

    # the committed bench checkpoint loads in ~2 s; the old
    # profile_step.settled_state path re-settled from scratch (~20 min of
    # capacity-regrow recompiles over the tunnel)
    state, params, steady_base, ladder = bench.physics_steady_setup()
    config = ladder
    for _ in range(3):
        state, config = step_checked(state, params, config)
    state = jax.block_until_ready(state)
    hit = dataclasses.replace(config, bp_force="hit")
    ms_cur = time_k(state, params, hit)
    bench._log(f"current hit path: {ms_cur:.2f} ms/step")

    # fused config: seed the ladder SMALL and let the class-count export
    # grow each rung to its true size (+15%) — rungs never shrink, so a
    # big seed would freeze in wasted rows
    mc = config.max_colors
    cfg_f = dataclasses.replace(config, gs_fused=True, gs_rung0=256,
                                gs_windows=(256,) * mc,
                                gs_fused_pallas=fused_base.gs_fused_pallas)
    st, cf = state, cfg_f
    for i in range(8):  # re-bucket rungs via the class-count export
        st, cf = step_checked(st, params, cf)
    st = jax.block_until_ready(st)
    bench._log(f"fused config settled: windows={cf.gs_windows} "
               f"rung0={cf.gs_rung0}")
    hit_f = dataclasses.replace(cf, bp_force="hit")
    ms_fus = time_k(st, params, hit_f)
    bench._log(f"fused hit path: {ms_fus:.2f} ms/step "
               f"({1000.0 / ms_fus:.1f} steps/s)")
    nat_f = time_k(st, params, cf)
    bench._log(f"fused natural: {nat_f:.2f} ms/step "
               f"({1000.0 / nat_f:.1f} steps/s)")


def main():
    good = small_correctness()
    if "--skip-10k" not in sys.argv:
        big_perf(good)


if __name__ == "__main__":
    main()
