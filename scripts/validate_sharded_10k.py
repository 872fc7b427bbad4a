"""Multi-chip validation at honest scale (VERDICT r03 item 8).

Runs the COMMITTED settled 10k ball_pit bench state through the full
sharded pipeline (parallel/sharded_pipeline.py) on a virtual 8-device CPU
mesh, asserts the result matches the single-device ``pipeline.step`` to f32
tolerance frame-by-frame, and substantiates the module docstring's ICI cost
claim ("two pair/contact all-gathers + one psum per color") by parsing the
compiled HLO: every cross-device collective is listed with its shape and
per-step byte volume. Results land in BENCH_NOTES.md.

Usage:  python scripts/validate_sharded_10k.py [n_frames]
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))

import dataclasses

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import bench
from wgmath_tpu.parallel.sharded_pipeline import (
    make_sharded_step,
    replicate_state,
)
from wgmath_tpu.pipeline import step, step_checked

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "f64": 8,
                "s64": 8, "u64": 8, "bf16": 2, "f16": 2, "s8": 1, "u8": 1}


def collective_report(compiled_text: str) -> list[tuple[str, str, int]]:
    """(op, shape, bytes) for every cross-device collective in the HLO."""
    out = []
    for m in re.finditer(
            r"(\w[\w.-]*) = ((?:\([^)]*\)|[\w\[\],{}]+)) "
            r"(all-gather|all-reduce|reduce-scatter|collective-permute|"
            r"all-to-all)\(", compiled_text):
        shape = m.group(2)
        op = m.group(3)
        total = 0
        for sm in re.finditer(r"(\w+)\[([\d,]*)\]", shape):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES.get(dt, 4)
        out.append((op, shape, total))
    return out


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    t0 = time.time()
    state, params, steady_base, ladder = bench.physics_steady_setup()
    # the sharded window splitter rounds per-color windows to the device
    # count; run the plain ladder config (the sharded path's contract)
    cfg = ladder
    # one checked step to materialize BP cache/layout at steady capacities
    st, cfg = step_checked(state, params, cfg)
    for _ in range(2):
        st, cfg = step_checked(st, params, cfg)
    st = jax.block_until_ready(st)
    print(f"[{time.time()-t0:7.1f}s] warmed: pairs="
          f"{int(np.asarray(st.pair_count)[0])} "
          f"contacts={int(np.asarray(st.pair_count)[1])}")

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dev",))
    run = make_sharded_step(mesh, params, cfg, n_steps=1)
    st_rep = replicate_state(st, mesh)

    # --- ICI accounting from the compiled HLO --------------------------
    lowered = jax.jit(lambda s: run(s)).lower(st_rep)
    txt = lowered.compile().as_text()
    cols = collective_report(txt)
    by_op = {}
    for op, shape, nbytes in cols:
        by_op.setdefault(op, [0, 0])
        by_op[op][0] += 1
        by_op[op][1] += nbytes
    print(f"\nICI collectives per sharded step "
          f"(8-dev mesh, pairs cap={cfg.pair_capacity}, "
          f"contacts cap={cfg.contact_capacity}):")
    total = 0
    for op, (cnt, nbytes) in sorted(by_op.items()):
        print(f"  {op:20s} x{cnt:<4d} {nbytes/1e6:8.3f} MB")
        total += nbytes
    print(f"  {'TOTAL':20s}       {total/1e6:8.3f} MB/step")
    big = sorted(cols, key=lambda c: -c[2])[:8]
    print("largest collectives:")
    for op, shape, nbytes in big:
        print(f"  {nbytes/1e6:8.3f} MB  {op}  {shape[:100]}")

    # --- frame-by-frame match vs single device -------------------------
    st_single = st
    st_shard = st_rep
    for f in range(n_frames):
        st_single = jax.block_until_ready(
            step(st_single, params, cfg, warmstart=True))
        st_shard = jax.block_until_ready(run(st_shard))
        dp = float(jnp.max(jnp.abs(
            st_shard.bodies.poses.translation
            - st_single.bodies.poses.translation)))
        dv = float(jnp.max(jnp.abs(
            st_shard.bodies.vels.linear - st_single.bodies.vels.linear)))
        pc_s = np.asarray(st_single.pair_count)
        pc_m = np.asarray(st_shard.pair_count)
        print(f"[{time.time()-t0:7.1f}s] frame {f}: max|dp|={dp:.3g} "
              f"max|dv|={dv:.3g} pairs {int(pc_s[0])}/{int(pc_m[0])} "
              f"contacts {int(pc_s[1])}/{int(pc_m[1])}")
        assert np.isfinite(dp) and dp < 1e-4, f"position divergence {dp}"
        assert int(pc_s[0]) == int(pc_m[0]), "pair count mismatch"
        assert int(pc_s[1]) == int(pc_m[1]), "contact count mismatch"
    print("OK: sharded 10k matches single-device to f32 tolerance")

    # --- wall time, sharded vs single (VERDICT r04 item 3 deliverable) --
    # The sharded solve now runs the per-class WINDOW LADDER (the layout
    # every winning single-chip candidate builds on) — each rung splits
    # across the mesh with one per-rung psum. These are CPU-mesh wall
    # times: they prove the sharded program's structure executes and give
    # a relative number, NOT TPU perf (one host core emulates 8 devices).
    K = 10

    @jax.jit
    def run_k_single(s):
        def body(i, ss):
            return step(ss, params, cfg)
        s = jax.lax.fori_loop(0, K, body, s)
        return s.bodies.poses.translation

    runk_sh = make_sharded_step(mesh, params, cfg, n_steps=K)
    jax.block_until_ready(run_k_single(st))
    t1 = time.time()
    jax.block_until_ready(run_k_single(st))
    t_single = (time.time() - t1) / K
    jax.block_until_ready(runk_sh(st_rep).bodies.poses.translation)
    t1 = time.time()
    jax.block_until_ready(runk_sh(st_rep).bodies.poses.translation)
    t_shard = (time.time() - t1) / K
    print(f"wall (8-dev CPU mesh, solver = window ladder, K={K}): "
          f"single-device {t_single*1e3:.1f} ms/step, sharded "
          f"{t_shard*1e3:.1f} ms/step (ratio {t_shard/t_single:.2f})")


if __name__ == "__main__":
    main()
