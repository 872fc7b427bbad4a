"""Solve-SETUP bisect on the forced-hit 10k step: stub build_constraints /
warmstart / field packing one at a time (cached real outputs + live data
dependencies so nothing hoists or breaks shapes) and difference step times.

Run: python scripts/profile_setup.py
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

import wgmath_tpu.dynamics.solver as slv  # noqa: E402
from wgmath_tpu.pipeline import step, step_checked  # noqa: E402
from profile_step import settled_state  # noqa: E402
from profile_substep import time_k  # noqa: E402


def main():
    state, params, config = settled_state()
    for _ in range(3):
        state, config = step_checked(state, params, config)
    state = jax.block_until_ready(state)
    cfg = dataclasses.replace(config, bp_force="hit")

    ms_full = time_k(state, params, cfg)
    bench._log(f"full: {ms_full:.2f} ms/step")

    # --- stub the constraint build with last frame's (same shapes) -------
    real_build = slv.build_constraints
    cached_cons = state.prev_constraints

    def fake_build(poses, vels, mprops, contacts, params_):
        s = (jnp.sum(jnp.where(contacts.valid, contacts.dist[:, 0], 0.0))
             + jnp.sum(poses.translation) + jnp.sum(vels.linear)) * 1e-30
        return dataclasses.replace(cached_cons,
                                   n_rhs=cached_cons.n_rhs + s)

    slv.build_constraints = fake_build
    ms_nobuild = time_k(state, params, cfg)
    bench._log(f"no-build: {ms_nobuild:.2f}  (build = "
               f"{ms_full - ms_nobuild:.2f} ms)")

    # --- additionally stub warmstart transfer/copy -----------------------
    real_slot = slv.slotwise_warmstart
    real_transfer = slv.transfer_warmstart

    def fake_ws(cons, prev, params_):
        s = jnp.sum(prev.n_impulse) * 1e-30
        return dataclasses.replace(cons, n_rhs=cons.n_rhs + s)

    slv.slotwise_warmstart = fake_ws
    slv.transfer_warmstart = fake_ws
    ms_nows = time_k(state, params, cfg)
    bench._log(f"no-build,no-ws: {ms_nows:.2f}  (warmstart = "
               f"{ms_nobuild - ms_nows:.2f} ms)")

    # --- additionally stub the packed field sort/pad ---------------------
    real_pad = slv.pad_solver_fields_packed

    @jax.jit
    def capture(cons):
        return real_pad(cons, 6144)

    slv.slotwise_warmstart = real_slot
    slv.transfer_warmstart = real_transfer
    slv.build_constraints = real_build

    def fake_pad(cons, pad):
        ss, pf = real_pad(cons, pad)
        return ss, pf

    # packing cost via 0-substep difference instead (stub needs pf shapes)
    p1 = dataclasses.replace(params, num_solver_iterations=1)
    ms_1 = time_k(state, p1, cfg)
    bench._log(f"1 substep, all real: {ms_1:.2f} ms")

    slv.build_constraints = fake_build
    slv.slotwise_warmstart = fake_ws
    slv.transfer_warmstart = fake_ws
    ms_1s = time_k(state, p1, cfg)
    bench._log(f"1 substep, no-build,no-ws: {ms_1s:.2f} ms")


if __name__ == "__main__":
    main()
