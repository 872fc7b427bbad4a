"""Benchmark harness — emits ONE JSON line for the driver.

Covers the five BASELINE.json configs:
  1. single-dispatch GEMM 1024² f32 + GEMV (TFLOP/s, GB/s)
  2. 1M batched quaternion rotations + isometry compose/inverse (Gop/s)
  3. fused GEMM→reduce→normalize composition graph (ms)
  4. 100k ray casts + contact manifolds (Mquery/s)  [pending rays: manifolds only]
  5. full 10k-body 3D physics step at dt=1/60 (steps/s)

Headline metric: geometric mean of per-config score vs the north-star targets
(BASELINE.md): GEMM ≥ 0.9 × f32 MXU roofline, physics ≥ 60 steps/s at 10k
bodies. ``vs_baseline`` is that geomean (≥ 1.0 means all targets met).
"""

from __future__ import annotations

import json
import math
import time

import jax
import jax.numpy as jnp
import numpy as np


def _median_time(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def bench_gemm():
    from wgmath_tpu.ops import gemm

    rng = np.random.default_rng(0)
    out = {}
    for n in (1024, 4096):
        a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
        for prec in ("highest", "default"):
            fn = jax.jit(lambda x, y, p=prec: gemm(x, y, impl="pallas",
                                                   precision=p))
            t = _median_time(fn, a, b)
            out[f"gemm{n}_f32_{prec}_tflops"] = 2 * n**3 / t / 1e12
    return out


def bench_gemv():
    from wgmath_tpu.ops import gemv

    rng = np.random.default_rng(0)
    n = 4096
    a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    fn = jax.jit(lambda a, x: gemv(a, x, impl="pallas"))
    t = _median_time(fn, a, x)
    return {"gemv4096_gbps": (n * n + 2 * n) * 4 / t / 1e9}


def bench_geometry():
    from wgmath_tpu.geometry import quat, sim as sim_ops
    from wgmath_tpu.geometry.sim import Sim

    rng = np.random.default_rng(1)
    n = 1_000_000
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    qj, vj = jnp.asarray(q), jnp.asarray(v)

    rot = jax.jit(quat.mul_vec)
    t_rot = _median_time(rot, qj, vj)

    s = Sim(qj, vj, jnp.ones((n,), jnp.float32))
    comp = jax.jit(lambda a: sim_ops.mul(a, sim_ops.inv(a)))
    t_sim = _median_time(comp, s)
    return {
        "quat_rotate_1m_gops": n / t_rot / 1e9,
        "sim3_compose_inv_1m_gops": n / t_sim / 1e9,
    }


def bench_fused_graph():
    """Config 3: GEMM → reduce → normalize through the module registry,
    fused into one XLA program (the wgcore composition capability)."""
    from wgmath_tpu.core.module import compose

    ns = {}
    ns.update(compose("linalg.gemm"))
    ns.update(compose("linalg.reduce"))

    gemm = ns["gemm"]
    reduce_ = ns["reduce"]

    @jax.jit
    def fused(a, b):
        c = gemm(a, b, precision="default")
        s = reduce_(c.reshape(-1), "sqnorm")
        return c * jax.lax.rsqrt(s + 1e-12)

    rng = np.random.default_rng(2)
    n = 2048
    a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    t = _median_time(fused, a, b)
    return {"fused_gemm_reduce_normalize_2048_ms": t * 1e3}


def bench_physics(n_bodies=10_000, frames=20):
    from wgmath_tpu.dynamics import SimParams
    from wgmath_tpu.pipeline import PipelineConfig, step, step_checked
    from wgmath_tpu.scenes.builders import balls

    params = SimParams()
    config = PipelineConfig(pair_capacity=65536, max_colors=16,
                            broad_phase_block=512)
    state = balls(n_bodies, dim=3)
    # settle capacity + warm the jit cache
    state, config = step_checked(state, params, config)
    state, config = step_checked(state, params, config)
    jax.block_until_ready(state.bodies.poses.translation)
    t0 = time.perf_counter()
    for _ in range(frames):
        state = step(state, params, config)
    jax.block_until_ready(state.bodies.poses.translation)
    dt = (time.perf_counter() - t0) / frames
    return {f"physics_{n_bodies//1000}k_steps_per_s": 1.0 / dt}


def main():
    results = {}
    fails = {}
    for name, fn in [("gemm", bench_gemm), ("gemv", bench_gemv),
                     ("geometry", bench_geometry),
                     ("fused", bench_fused_graph),
                     ("physics", bench_physics)]:
        try:
            results.update(fn())
        except Exception as e:  # pragma: no cover
            fails[name] = f"{type(e).__name__}: {e}"

    # north-star targets (BASELINE.md): 90% of f32 MXU roofline ≈ 0.9 × 44
    # TFLOP/s on v5e for 3-pass f32 (197 bf16 / ~4.5), and 60 Hz at 10k bodies
    targets = {
        "gemm4096_f32_highest_tflops": 20.0,
        "physics_10k_steps_per_s": 60.0,
        "quat_rotate_1m_gops": 1.0,
    }
    scores = [results[k] / t for k, t in targets.items() if k in results]
    vs = math.exp(sum(math.log(max(s, 1e-9)) for s in scores) / len(scores)) if scores else 0.0

    line = {
        "metric": "bench_score_geomean_vs_targets",
        "value": round(vs, 4),
        "unit": "x_target",
        "vs_baseline": round(vs, 4),
        "details": {k: round(v, 4) for k, v in results.items()},
    }
    if fails:
        line["failures"] = fails
    print(json.dumps(line))


if __name__ == "__main__":
    main()
