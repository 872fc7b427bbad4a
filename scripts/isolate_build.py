"""Isolate build_constraints on device: capture its real inputs from one
eager pipeline step on the settled 10k state, then abs-time K chained calls
(consuming every output field) and bisect the internal cost.

Run: python scripts/isolate_build.py
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
from wgmath_tpu.pipeline import step, step_checked  # noqa: E402
from profile_step import settled_state  # noqa: E402


def main():
    state, params, config = settled_state()
    for _ in range(3):
        state, config = step_checked(state, params, config)
    state = jax.block_until_ready(state)

    # capture build inputs from ONE eager step
    captured = {}
    real_build = cns.build_constraints

    def capture_build(poses, vels, mprops, contacts, params_):
        captured["args"] = (poses, vels, mprops, contacts, params_)
        return real_build(poses, vels, mprops, contacts, params_)

    cns.build_constraints = capture_build
    slv.build_constraints = capture_build
    cfg = dataclasses.replace(config, bp_force="hit")
    step.__wrapped__(state, params, cfg)
    cns.build_constraints = real_build
    slv.build_constraints = real_build
    poses, vels, mprops, contacts, sub = [
        jax.block_until_ready(x) for x in captured["args"]]
    bench._log(f"captured contacts capacity={contacts.body_a.shape[0]} "
               f"p_max={contacts.points_a.shape[1]}")

    def time_build(fn, label, K=200):
        @jax.jit
        def run_k(tr):
            def body(i, tr):
                p = dataclasses.replace(poses, translation=tr)
                out = fn(p, vels, mprops, contacts, sub)
                # consume EVERY field; feed back into next iteration
                s = sum(jnp.sum(x) for x in jax.tree.leaves(out)
                        if jnp.issubdtype(x.dtype, jnp.floating))
                return tr + s * 1e-30
            return jax.lax.fori_loop(0, K, body, poses.translation)

        out = jax.block_until_ready(run_k(poses.translation))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run_k(poses.translation))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / K * 1e3
        bench._log(f"{label}: {ms:.3f} ms")
        return ms

    time_build(real_build, "build full")

    # gather only
    def build_gather_only(poses, vels, mprops, contacts, params_):
        n_b = poses.rotation.shape[0]
        id1, id2 = contacts.body_a, contacts.body_b
        cols = [poses.rotation, poses.translation, poses.scale,
                vels.linear, vels.angular, mprops.inv_mass,
                mprops.inv_inertia.reshape(n_b, -1), mprops.com]
        cols = [x[:, None] if x.ndim == 1 else x for x in cols]
        packed = jnp.concatenate(cols, axis=1)
        pp = packed[jnp.concatenate([id1, id2])]
        return pp

    time_build(build_gather_only, "gather only")

    # full minus the tangent inner loop (normal parts only)
    import wgmath_tpu.dynamics.constraint as C

    def build_no_tangent(poses, vels, mprops, contacts, params_):
        out = real_build(poses, vels, mprops, contacts, params_)
        return out

    # stub tangent_directions with a constant basis (kills normalize +
    # branch math); measures that function's share
    real_tg = C.tangent_directions

    def const_tangents(n, v1, v2):
        z = jnp.zeros_like(n)
        t1 = jnp.stack([z[:, 0] + 1.0, z[:, 1], z[:, 2]], axis=-1)
        t2 = jnp.stack([z[:, 0], z[:, 1] + 1.0, z[:, 2]], axis=-1)
        return jnp.stack([t1, t2], axis=1)

    C.tangent_directions = const_tangents
    time_build(real_build, "build w/ const tangents")
    C.tangent_directions = real_tg

    # stub ii_mul (inertia matvec) with identity
    real_ii = C.ii_mul
    C.ii_mul = lambda ii, v: v
    time_build(real_build, "build w/ identity ii_mul")
    C.ii_mul = real_ii

    C.tangent_directions = const_tangents
    C.ii_mul = lambda ii, v: v
    time_build(real_build, "build w/ both stubbed")
    C.tangent_directions = real_tg
    C.ii_mul = real_ii


if __name__ == "__main__":
    main()
