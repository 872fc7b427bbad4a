"""Absolute-timed bisect of the forced-hit step: full vs solve-stubbed vs
solve+narrow-phase-stubbed. All stubs keep real data feedback (finite,
valid-masked) so XLA cannot hoist the remaining phases.

Run AFTER a settled checkpoint exists: python scripts/profile_bisect.py
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

import wgmath_tpu.pipeline as pp  # noqa: E402
from wgmath_tpu.dynamics.constraint import Contacts  # noqa: E402
from wgmath_tpu.pipeline import step, step_checked  # noqa: E402

from profile_step import settled_state  # noqa: E402


def main():
    state, params, config = settled_state()
    for _ in range(3):
        state, config = step_checked(state, params, config)
    state = jax.block_until_ready(state)
    cfg = dataclasses.replace(config, bp_force="hit")
    bench._log(f"caps: pair={config.pair_capacity} gs={config.gs_cmax} "
               f"tail={config.gs_tail_window}")

    def consume(s):
        tot = (jnp.sum(s.bodies.poses.translation)
               + jnp.sum(s.bodies.vels.linear)
               + jnp.sum(s.pair_count.astype(jnp.float32)))
        if s.prev_constraints is not None:
            tot += jnp.sum(s.prev_constraints.n_impulse) * 1e-9
        return tot

    K = 50

    def timeit(label):
        @jax.jit
        def f(s0):
            def body(i, carry):
                s, acc = carry
                s = step.__wrapped__(s, params, cfg, warmstart=True)
                return s, acc + consume(s) * 1e-9
            s, acc = jax.lax.fori_loop(0, K, body, (s0, 0.0))
            return acc
        out = jax.block_until_ready(f(state))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(state))
            ts.append(time.perf_counter() - t0)
        bench._log(f"{label}: {min(ts)/K*1e3:.1f} ms/step")

    timeit("A full")

    orig_solve = pp.solve

    def stub_solve(bodies, mprops, contacts, params_, *, warmstart_from=None,
                   colors_in=None, cache_in=None, **kw):
        # finite, valid-masked feedback keeps BP + NP live
        d = jnp.sum(jnp.where(contacts.valid[:, None], contacts.dist,
                              0.0)) * 1e-9
        poses = dataclasses.replace(
            bodies.poses, translation=bodies.poses.translation + d)
        cons = warmstart_from
        colors = (colors_in if colors_in is not None
                  else jnp.zeros_like(cons.body_a))
        return (poses, bodies.vels, cons, jnp.zeros(2, jnp.int32), colors,
                cache_in)

    pp.solve = stub_solve
    try:
        timeit("B no-solve")

        orig_np = pp.narrow_phase

        def stub_np(poses, shapes, pairs, pred, **kw):
            c = pairs.body_a.shape[0]
            p_max = kw.get("p_max", 1) or 1
            dim = poses.translation.shape[-1]
            z = pairs.count.astype(jnp.float32) * 1e-9
            contacts = Contacts(pairs.body_a, pairs.body_b,
                                jnp.zeros((c, dim)) + z,
                                jnp.zeros((c, p_max, dim)),
                                jnp.zeros((c, p_max)),
                                jnp.zeros((c,), jnp.int32),
                                pairs.valid & False)
            if kw.get("with_overflow"):
                return contacts, jnp.zeros(3, jnp.int32)
            return contacts

        pp.narrow_phase = stub_np
        try:
            timeit("C no-solve no-np")
        finally:
            pp.narrow_phase = orig_np
    finally:
        pp.solve = orig_solve


if __name__ == "__main__":
    main()
