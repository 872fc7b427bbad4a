"""Hoist-proof bisect of the forced-hit 10k step under the BENCH steady
config (chained sweep, capless classes, slack cache).

The earlier stub bisects (profile_setup.py) returned loop-INVARIANT stubs
(cached arrays + a scalar on one field), letting XLA hoist everything
downstream of the stub out of the 50-step loop — "build = 5.84 ms" was
really build (0.63 isolated) + every hoisted consumer. Every stub here
perturbs EVERY output field by a loop-variant epsilon, so downstream
structure keeps its per-iteration cost and the difference isolates ONLY
the stubbed phase.

Run: python scripts/profile_fixed.py
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
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import wgmath_tpu.dynamics.constraint as cns  # noqa: E402
import wgmath_tpu.dynamics.solver as slv  # noqa: E402
import wgmath_tpu.pipeline as pl  # noqa: E402
from wgmath_tpu.dynamics import SimParams  # noqa: E402
from wgmath_tpu.pipeline import step, step_checked  # noqa: E402


def bench_steady_state():
    """The bench's exact steady-state setup (bench.physics_steady_setup):
    checkpointed settled ball_pit, chained candidate, 6 checked warmups."""
    state, params, steady_base, ladder = bench.physics_steady_setup()
    cfg = dataclasses.replace(ladder, gs_chained=True, gs_rhs_in_rung=True)
    for _ in range(6):
        state, cfg = step_checked(state, params, cfg)
    state = jax.block_until_ready(state)
    bench._log(f"steady windows={cfg.gs_windows} "
               f"caps pair={cfg.pair_capacity} contact={cfg.contact_capacity}")
    return state, params, cfg


def time_k(state, params, config, K=50, reps=3):
    @jax.jit
    def run_k(s0):
        def body(i, s):
            return step.__wrapped__(s, params, config)

        s = jax.lax.fori_loop(0, K, body, s0)
        return (s.bodies.poses.translation, s.bodies.vels.linear,
                s.pair_count)

    jax.block_until_ready(run_k(state))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run_k(state))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K * 1e3


def _variant(out, s):
    """Perturb every leaf by a loop-variant (runtime-zero for ints/bools)
    epsilon so XLA cannot constant-fold/hoist ANY downstream consumer —
    int ids and valid masks feed compaction/layout work that would
    otherwise leave the timing loop."""
    zi = (s * 1e-10).astype(jnp.int32)  # runtime 0, data-dependent

    def f(x):
        if not hasattr(x, "dtype"):
            return x
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x + s
        if x.dtype == jnp.bool_:
            return jnp.logical_xor(x, zi > 0)
        if jnp.issubdtype(x.dtype, jnp.integer):
            return x + zi.astype(x.dtype)
        return x
    return jax.tree.map(f, out)


def main():
    state, params, config = bench_steady_state()
    cfg = dataclasses.replace(config, bp_force="hit")

    ms_full = time_k(state, params, cfg)
    bench._log(f"full hit: {ms_full:.2f} ms/step")

    # concrete captures of the np contacts and built constraints (ONE jitted
    # step with capture hooks; the tracers are returned as real outputs)
    real_np = pl.narrow_phase
    real_build = slv.build_constraints
    grabbed = {}

    def capturing_np(poses, shapes, pairs, pred, **kw):
        out = real_np(poses, shapes, pairs, pred, **kw)
        grabbed["np"] = out
        return out

    def capturing_build(poses, vels, mprops, contacts, p):
        out = real_build(poses, vels, mprops, contacts, p)
        grabbed["build"] = out
        return out

    def grab(s0):
        pl.narrow_phase = capturing_np
        slv.build_constraints = capturing_build
        try:
            step.__wrapped__(s0, params, cfg)
        finally:
            pl.narrow_phase = real_np
            slv.build_constraints = real_build
        return grabbed["np"], grabbed["build"]

    np_out_c, build_out_c = jax.block_until_ready(jax.jit(grab)(state))

    # ---- narrow phase (constant contacts + loop-variant epsilon) --------
    def fake_np(poses, shapes, pairs, pred, **kw):
        s = (jnp.sum(poses.translation) + jnp.sum(pairs.body_a)) * 1e-30
        return _variant(np_out_c, s)

    pl.narrow_phase = fake_np
    ms = time_k(state, params, cfg)
    bench._log(f"no-narrow-phase: {ms:.2f}  (np = {ms_full - ms:.2f} ms)")
    pl.narrow_phase = real_np

    # ---- constraint build ------------------------------------------------
    def fake_build(poses, vels, mprops, contacts, p):
        s = (jnp.sum(poses.translation) + jnp.sum(vels.linear)
             + jnp.sum(jnp.where(contacts.valid, contacts.dist[:, 0], 0.0))
             ) * 1e-30
        return _variant(build_out_c, s)

    slv.build_constraints = fake_build
    ms = time_k(state, params, cfg)
    bench._log(f"no-build: {ms:.2f}  (build = {ms_full - ms:.2f} ms)")
    slv.build_constraints = real_build

    # ---- packed field pad (the big concat) -------------------------------
    real_pad = slv.pad_solver_fields_packed

    def fake_pad(cons, pad):
        ss, (pf2d, meta) = real_pad(cons, pad)
        return ss, (pf2d, meta)

    # measure by replacing the concat with a single cheap matrix: build ss
    # from one zeros matrix + s (same shapes, one op)
    def fake_pad2(cons, pad):
        from types import SimpleNamespace
        c = cons.body_a.shape[0]
        n = c + pad
        s = jnp.sum(cons.n_rhs) * 1e-30
        cols, meta, at = [], {}, 0
        for f in slv._F32_SORT_FIELDS:
            v = getattr(cons, f)
            tail = v.shape[1:]
            k = int(np.prod(tail)) if tail else 1
            meta[f] = (at, tail)
            at += k
        big = jnp.zeros((n, at), jnp.float32) + s
        fields = {}
        for f, (a0, tail) in meta.items():
            k = int(np.prod(tail)) if tail else 1
            fields[f] = jax.lax.slice_in_dim(big, a0, a0 + k,
                                             axis=1).reshape((n,) + tail)
        zpad_i = jnp.zeros((pad,), jnp.int32)
        fields["body_a"] = jnp.concatenate([cons.body_a, zpad_i])
        fields["body_b"] = jnp.concatenate([cons.body_b, zpad_i])
        fields["num_points"] = jnp.concatenate([cons.num_points, zpad_i])
        fields["valid"] = jnp.concatenate(
            [cons.valid, jnp.zeros((pad,), bool)])
        ss = SimpleNamespace(**fields)
        k_pack = meta[slv._PACK_FIELDS[-1]][0] + max(
            int(np.prod(meta[slv._PACK_FIELDS[-1]][1])), 1)
        packed2d = jax.lax.slice_in_dim(big, 0, k_pack, axis=1)
        pack_meta = {f: meta[f] for f in slv._PACK_FIELDS}
        return ss, (packed2d, pack_meta)

    slv.pad_solver_fields_packed = fake_pad2
    ms = time_k(state, params, cfg)
    bench._log(f"no-pad-concat: {ms:.2f}  (pad = {ms_full - ms:.2f} ms)")
    slv.pad_solver_fields_packed = real_pad

    # ---- slotwise warmstart ----------------------------------------------
    real_slot = slv.slotwise_warmstart
    real_tr = slv.transfer_warmstart

    def fake_ws(cons, prev, p):
        s = jnp.sum(prev.n_impulse) * 1e-30
        return _variant(cons, s)

    slv.slotwise_warmstart = fake_ws
    slv.transfer_warmstart = fake_ws
    ms = time_k(state, params, cfg)
    bench._log(f"no-warmstart: {ms:.2f}  (ws-transfer = "
               f"{ms_full - ms:.2f} ms)")
    slv.slotwise_warmstart = real_slot
    slv.transfer_warmstart = real_tr

    # ---- substep internals ------------------------------------------------
    real_integrate = slv.integrate_velocity

    def fake_integrate(poses, vels, com, dt):
        s = (jnp.sum(vels.linear) + jnp.sum(vels.angular)) * dt * 1e-30
        return dataclasses.replace(
            poses, translation=poses.translation + s,
            rotation=poses.rotation + s)

    slv.integrate_velocity = fake_integrate
    ms = time_k(state, params, cfg)
    bench._log(f"no-integrate: {ms:.2f}  (integrate x4 = "
               f"{ms_full - ms:.2f} ms)")
    slv.integrate_velocity = real_integrate

    real_wsa = slv._ws_apply

    def fake_wsa(vels, packed, sides):
        s = jnp.sum(packed) * 1e-30
        from wgmath_tpu.dynamics.body import Velocity
        return Velocity(vels.linear + s, vels.angular + s)

    slv._ws_apply = fake_wsa
    ms = time_k(state, params, cfg)
    bench._log(f"no-ws-apply: {ms:.2f}  (ws-apply x4 = "
               f"{ms_full - ms:.2f} ms)")
    slv._ws_apply = real_wsa

    # ---- the sweeps themselves --------------------------------------------
    real_pass = slv.gs_color_major_pass

    def fake_pass(sorted_cons, vels, n_imp_s, t_imp_s, layout, num_colors,
                  **kw):
        from wgmath_tpu.dynamics.body import Velocity
        s = (jnp.sum(sorted_cons.n_rhs) + jnp.sum(n_imp_s)
             + jnp.sum(t_imp_s)) * 1e-30
        out = (Velocity(vels.linear + s, vels.angular + s),
               n_imp_s + s, t_imp_s + s)
        if kw.get("rhs_mode") is not None:
            return out + (kw["rhs_store"] + s,)
        return out

    slv.gs_color_major_pass = fake_pass
    ms = time_k(state, params, cfg)
    bench._log(f"no-sweeps: {ms:.2f}  (sweeps x8 = {ms_full - ms:.2f} ms)")
    slv.gs_color_major_pass = real_pass


if __name__ == "__main__":
    main()
