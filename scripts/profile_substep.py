"""Substep-internal bisect on the forced-hit 10k step: stub out the GS
sweep / rhs relinearization / warmstart apply one at a time (keeping real
data feedback so nothing hoists) and difference the step times.

Run: python scripts/profile_substep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import wgmath_tpu.dynamics.solver as slv  # noqa: E402
from wgmath_tpu.dynamics.body import Velocity  # noqa: E402
from wgmath_tpu.pipeline import step, step_checked  # noqa: E402
from profile_step import settled_state  # noqa: E402


def time_k(state, params, config, K=50, reps=3):
    @jax.jit
    def run_k(s0):
        def body(i, s):
            return step.__wrapped__(s, params, config)

        s = jax.lax.fori_loop(0, K, body, s0)
        return (s.bodies.poses.translation, s.bodies.vels.linear,
                s.pair_count)

    out = jax.block_until_ready(run_k(state))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run_k(state))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K * 1e3


def main():
    state, params, config = settled_state()
    for _ in range(3):
        state, config = step_checked(state, params, config)
    state = jax.block_until_ready(state)
    cfg = dataclasses.replace(config, bp_force="hit")

    real_pass = slv.gs_color_major_pass
    real_rhs = slv.update_rhs_sorted

    def fake_pass(sorted_cons, vels, n_imp_s, t_imp_s, layout, num_colors,
                  **kw):
        # consume the inputs the real sweep would (rhs etc. stay live)
        s = (jnp.sum(sorted_cons.n_rhs) + jnp.sum(sorted_cons.t_rhs)
             + jnp.sum(n_imp_s) + jnp.sum(t_imp_s)) * 1e-30
        return (Velocity(vels.linear + s, vels.angular),
                n_imp_s + s, t_imp_s + s)

    def fake_rhs(ss, poses, sub):
        s = jnp.sum(poses.translation) * 1e-30
        return (ss.n_rhs + s, getattr(ss, "n_rhs_wo_bias", ss.n_rhs) + s,
                ss.t_rhs + s)

    ms_full = time_k(state, params, cfg)
    bench._log(f"full: {ms_full:.2f} ms/step")

    slv.gs_color_major_pass = fake_pass
    ms_nosweep = time_k(state, params, cfg)
    bench._log(f"no-sweep: {ms_nosweep:.2f}  (sweeps = "
               f"{ms_full - ms_nosweep:.2f} ms)")

    slv.update_rhs_sorted = fake_rhs
    ms_norhs = time_k(state, params, cfg)
    bench._log(f"no-sweep,no-rhs: {ms_norhs:.2f}  (rhs = "
               f"{ms_nosweep - ms_norhs:.2f} ms)")

    slv.gs_color_major_pass = real_pass
    ms_sweeponly = time_k(state, params, cfg)
    bench._log(f"sweep,no-rhs: {ms_sweeponly:.2f}")
    slv.update_rhs_sorted = real_rhs

    # sweep with 0 solver iterations ≈ pure setup + glue
    p0 = dataclasses.replace(params, num_solver_iterations=0)
    ms_setup = time_k(state, p0, cfg)
    bench._log(f"0 substeps (setup+np+glue): {ms_setup:.2f} ms")


if __name__ == "__main__":
    main()
