"""Benchmark harness — emits ONE JSON line for the driver.

Covers the five BASELINE.json configs:
  1. single-dispatch GEMM 1024²/4096² f32 + GEMV (TFLOP/s, GB/s)
  2. 1M batched quaternion rotations + isometry compose/inverse (Gop/s)
  3. fused GEMM→reduce→normalize composition graph (ms)
  4. 100k ray casts (Mray/s)
  5. full 10k-body 3D physics step at dt=1/60 (steps/s)

Timing methodology: the TPU here sits behind a network tunnel with ~30 ms
host↔device round-trip latency and weak ``block_until_ready`` semantics, so
per-call wall timing is useless — and slope timing (two-point K_small vs
K_large difference) proved unreliable mid-round-2 (inconsistent
decompositions, occasional ~0 differences clamped to garbage). Every kernel
is therefore timed ABSOLUTELY: K *chained* iterations inside ONE jitted
fori_loop (each iteration consumes the previous one's output, so XLA can
neither hoist nor dead-code-eliminate the work), synchronized by a scalar
readback, min of 3 runs, report T/K. A pilot run sizes K so the total run
is ≥ ~0.75 s — the fixed ~30 ms dispatch+tunnel cost is then ≤ 4% and is
included honestly rather than cancelled.

Headline: geometric mean of per-config score vs the north-star targets
(BASELINE.md): GEMM ≥ 0.9 × f32 MXU roofline, physics ≥ 60 steps/s at 10k
bodies. ``vs_baseline`` is that geomean (≥ 1.0 ⇒ all targets met); the
per-target ratios are reported alongside so one strong config cannot mask
a weak one.
"""

from __future__ import annotations

import functools
import json
import math
import os
import sys
import time

import jax

# persistent compile cache: repeat bench runs skip the ~30-60 s/kernel remote
# compiles entirely
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# LLVM-JIT'd executables exhaust vm.max_map_count long before RAM (the
# round-1 "segfault after ~120 compiles" root cause — core/hostmem.py);
# mostly a CPU-backend concern, but cheap insurance for any backend.
from wgmath_tpu.core import hostmem

hostmem.raise_map_limit()


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _sync(x):
    """Force full execution: read back one scalar through the tunnel."""
    arr = jax.tree.leaves(x)[0]
    return float(jnp.ravel(arr)[0])


def abs_time(make_fn, args, *, k0=8, target_s=0.75, k_cap=4096, reps=3):
    """Seconds per iteration via absolute timing of K chained iterations.

    ``make_fn(k)`` must return a jitted callable running k *chained*
    iterations of the kernel (so XLA cannot hoist or dedupe them). A pilot
    at ``k0`` estimates the per-iteration cost, then K is sized so the
    measured run lasts ≥ ``target_s`` — the fixed ~30 ms tunnel/dispatch
    overhead is then ≤ ~4% of the reading (included, not cancelled).
    """

    def run(k):
        f = make_fn(k)
        _sync(f(*args))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_pilot = run(k0)
    if t_pilot >= target_s:
        return t_pilot / k0
    est = max(t_pilot / k0, 1e-7)
    k = min(k_cap, max(k0 + 1, int(math.ceil(target_s / est))))
    return run(k) / k


# ---------------------------------------------------------------------------


def bench_gemm():
    from wgmath_tpu.ops import gemm

    rng = np.random.default_rng(0)
    out = {}
    for n in (1024, 4096):
        a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32) / np.sqrt(n))

        for prec in ("highest", "default"):
            def make(k, prec=prec):
                @jax.jit
                def f(a, b):
                    def body(i, c):
                        return gemm(c, b, impl="pallas", precision=prec)
                    return jax.lax.fori_loop(0, k, body, a)
                return f

            t = abs_time(make, (a, b), k0=64 if n == 1024 else 8)
            out[f"gemm{n}_f32_{prec}_tflops"] = 2 * n**3 / t / 1e12

        if n == 4096:
            # device-ceiling cross-check: XLA's own precision=highest dot on
            # the SAME harness. If the Pallas number sits at/above this, the
            # gap to the 30 TF north star is the chip's 6-pass f32 ceiling,
            # not kernel slack (round-3 finding: XLA reads 29.4 here).
            def make_xla(k):
                @jax.jit
                def f(a, b):
                    def body(i, c):
                        return jnp.dot(c, b, precision="highest")
                    return jax.lax.fori_loop(0, k, body, a)
                return f

            t = abs_time(make_xla, (a, b), k0=8)
            out["gemm4096_xla_highest_tflops"] = 2 * n**3 / t / 1e12

            # bf16x3 split accumulation (precision="high"): PASSES the
            # reference's own 1e-3 golden tolerance (gemm.rs:199-202;
            # scripts/exp_gemm_split.py measured rel p99.9 = 6.5e-3 with
            # every entry inside the approx::relative_eq(1e-3) criterion)
            # at ~1.9x the 6-pass speed — the f32 GEMM speed available to
            # any caller who needs the reference's accuracy contract
            # rather than full-f32 reproduction (VERDICT r04 item 1a)
            def make_b3(k):
                @jax.jit
                def f(a, b):
                    def body(i, c):
                        return gemm(c, b, precision="high")
                    return jax.lax.fori_loop(0, k, body, a)
                return f

            t = abs_time(make_b3, (a, b), k0=16)
            out["gemm4096_f32_bf16x3_tflops"] = 2 * n**3 / t / 1e12
    return out


def bench_gemv():
    from wgmath_tpu.ops import gemv

    rng = np.random.default_rng(0)
    n = 4096
    a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32) / 64.0)
    x = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))

    def make(k):
        @jax.jit
        def f(a, x):
            def body(i, v):
                return gemv(a, v, impl="pallas")
            return jax.lax.fori_loop(0, k, body, x)
        return f

    t = abs_time(make, (a, x), k0=64)
    return {"gemv4096_gbps": (n * n + 2 * n) * 4 / t / 1e9}


def bench_geometry():
    from wgmath_tpu.geometry import quat

    rng = np.random.default_rng(1)
    n = 1_000_000
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    qj, vj = jnp.asarray(q), jnp.asarray(v)

    def make_rot(k):
        @jax.jit
        def f(q, v):
            # SoA tuple-of-rows chain (quat.split_soa): every [N, 3/4]
            # stacked-array boundary in a chained pipeline re-materializes
            # a buffer XLA won't fuse through; tuple rows fuse end-to-end
            # (same finding as sim3: 2.3 -> 10.8 Gop/s)
            qs = quat.split_soa(q)

            def body(i, vv):
                return quat.mul_vec_soa(qs, vv)
            out = jax.lax.fori_loop(0, k, body, quat.split_soa(v))
            return quat.merge_soa(out)
        return f

    t_rot = abs_time(make_rot, (qj, vj), k0=128)

    def make_sim(k):
        from wgmath_tpu.geometry import sim as sim_ops
        from wgmath_tpu.geometry.sim import Sim

        @jax.jit
        def f(q, t):
            # component-major storage ([4/3, N]) is the TPU-native layout
            # for flat transform batches: full 128-lane occupancy with NO
            # per-op relayouts (row-major [N, 4] chains measured 2.3 Gop/s
            # — bounded by two [N,4]<->[4,N] transposes per iteration that
            # XLA cannot cancel across the loop-carry boundary)
            s0 = sim_ops.to_cm(Sim(q, t, jnp.ones((n,), jnp.float32)))

            def body(i, s):
                out = sim_ops.mul(s, sim_ops.inv(s0))
                out = sim_ops.normalize_rotation(out)
                return Sim(out.rotation, out.translation,
                           jnp.clip(out.scale, 0.5, 2.0), cm=True)
            return jax.lax.fori_loop(0, k, body, s0).translation
        return f

    t_sim = abs_time(make_sim, (qj, vj), k0=16)
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

    n = 2048
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

    def make(k):
        @jax.jit
        def f(a, b):
            def body(i, c):
                c = gemm(c, b, precision="default")
                s = reduce_(c.reshape(-1), "sqnorm")
                return c * jax.lax.rsqrt(s + 1e-12)
            return jax.lax.fori_loop(0, k, body, a)
        return f

    t = abs_time(make, (a, b), k0=16)
    return {"fused_gemm_reduce_normalize_2048_ms": t * 1e3}


def bench_rays():
    """Config 4: 100k rays vs mixed {ball, cuboid, capsule} colliders."""
    from wgmath_tpu.geometry.sim import Sim
    from wgmath_tpu.queries.ray import cast
    from wgmath_tpu.shapes import ShapeSet

    rng = np.random.default_rng(3)
    n = 100_000
    tags = rng.integers(0, 3, n)
    sets = []
    radii = rng.uniform(0.2, 1.0, n).astype(np.float32)
    shapes = ShapeSet.balls(jnp.asarray(radii))
    params = np.zeros((n, 8), np.float32)
    params[:, 0] = radii
    params[tags == 1, :3] = rng.uniform(0.2, 1.0, (int((tags == 1).sum()), 3))
    params[tags == 2, 1] = 0.3
    import wgmath_tpu.shapes.shape as shp

    tag_arr = np.where(tags == 1, shp.CUBOID,
                       np.where(tags == 2, shp.CAPSULE, shp.BALL))
    shapes = ShapeSet(jnp.asarray(tag_arr, jnp.int32), jnp.asarray(params),
                      shapes.vertices, shapes.indices)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, -1, keepdims=True)
    centers = rng.normal(size=(n, 3)).astype(np.float32) * 2
    poses = Sim(jnp.asarray(q), jnp.asarray(centers), jnp.ones((n,)))
    origins = jnp.asarray(centers + rng.normal(size=(n, 3)).astype(np.float32) * 5)
    dirs0 = rng.normal(size=(n, 3)).astype(np.float32)
    dirs0 /= np.linalg.norm(dirs0, -1, keepdims=True)
    dirs0 = jnp.asarray(dirs0)

    def make(k):
        @jax.jit
        def f(origins, dirs):
            def body(i, o):
                t = cast(shapes, poses, o, dirs)
                t = jnp.where(jnp.isfinite(t), t, 0.0)
                return o + dirs * (t[:, None] * 1e-6)  # chain dependency
            return jax.lax.fori_loop(0, k, body, origins)
        return f

    t = abs_time(make, (origins, dirs0), k0=32)
    return {"raycast_100k_mrays_s": n / t / 1e6}


# bump to invalidate cached settled states after physics-affecting changes
_SETTLE_VERSION = 1


def _settled_ckpt_path(n_bodies, params, calm_vel):
    import hashlib
    key = repr((_SETTLE_VERSION, "ball_pit", n_bodies, params, calm_vel))
    digest = hashlib.sha1(key.encode()).hexdigest()[:12]
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f".settled_bench_{digest}.pkl")


def _save_settled(path, state, config):
    import pickle
    leaves, treedef = jax.tree.flatten(state)
    with open(path, "wb") as f:
        pickle.dump({"treedef": treedef,
                     "leaves": [np.asarray(x) for x in leaves],
                     "config": config}, f)


def _load_settled(path):
    import pickle
    with open(path, "rb") as f:
        blob = pickle.load(f)
    leaves = [jnp.asarray(x) for x in blob["leaves"]]
    return jax.tree.unflatten(blob["treedef"], leaves), blob["config"]


def _fused_pallas_supported():
    """~30 s capability probe: compile ONE tiny multi-vreg lane
    ``dynamic_gather`` Pallas kernel — the exact Mosaic feature the fused
    sweep needs ([8, 256] = 2 source vregs along the gather dim; v5e /
    jax 0.9 rejects it with "Multiple source vregs along gather
    dimension"). Probing first avoids the ~11 min the round-2 bench burned
    compiling the full fused program only to hit the same rejection."""
    from jax.experimental import pallas as pl

    from wgmath_tpu.core.dispatch import pallas_interpret

    if pallas_interpret():  # off-TPU: interpret mode runs anything
        return True

    def kern(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=1,
                                         mode="promise_in_bounds")

    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32))(
                jnp.zeros((8, 256), jnp.float32),
                jnp.zeros((8, 256), jnp.int32))
        jax.block_until_ready(out)
        return True
    except Exception as e:  # pragma: no cover - backend-dependent
        _log(f"fused-pallas probe: unsupported on this backend "
             f"({type(e).__name__}: {str(e)[:160]})")
        return False


def physics_steady_setup(n_bodies=10_000, settle_frames=900, calm_vel=0.05):
    """Settle (or load) the bench pile and derive the steady configs.

    Returns ``(state, params, steady_base, ladder)`` — shared by
    ``bench_physics`` and the profiling scripts (scripts/profile_*.py) so
    the profiled configuration can never drift from the benched one."""
    from wgmath_tpu.dynamics import SimParams
    from wgmath_tpu.pipeline import (
        PipelineConfig,
        auto_manifold_points,
        step_checked,
    )
    from wgmath_tpu.scenes.builders import ball_pit

    import dataclasses as _dc

    params = SimParams()
    ckpt = _settled_ckpt_path(n_bodies, params, calm_vel)
    if os.path.exists(ckpt):
        state, settle_cfg = _load_settled(ckpt)
        # drop the checkpointed BP cache: its coloring dates from the churny
        # settle phase (24 occupied classes); a fresh steady-state recolor
        # occupies ~17 fuller classes → a shorter, cheaper sweep ladder
        # (measured 23.4 -> 22.3 ms/step chained). One full BP per candidate
        # warmup pays for it.
        state = _dc.replace(state, bp_pairs=None, bp_ref=None,
                            bp_colors=None, solve_cache=None,
                            # the steady config re-seeds (smaller, fine)
                            # capacities; the checkpointed warmstart buffers
                            # carry the settle-time shapes — drop them and
                            # let the warmups re-establish warmstart
                            prev_constraints=None, prev_colors=None)
        maxv = float(jnp.max(jnp.abs(state.bodies.vels.linear)))
        _log(f"physics settled state loaded from {os.path.basename(ckpt)} "
             f"(pairs={int(np.asarray(state.pair_count)[0])}, "
             f"maxvel={maxv:.3f})")
        # slack 0.035: the repair-frequency sweet spot (exp_repair_sweep,
        # 2026-08-19: hit=178/200 vs 102/200 at 0.02; 19.16 vs 21.93
        # ms/step natural — the extra pairs cost less than the repairs)
        config = _dc.replace(settle_cfg, bp_slack=0.035)
    else:
        # walled pit: reaches a genuinely quiescent jammed state (the open
        # `balls` scene scatters and rolls forever — no rolling resistance).
        # Capacities are seeded at the KNOWN settled values for this scene
        # (pair=49152 / contact=32768 / gs_cmax=4096 / tail=1536 / bc=4096,
        # BENCH_NOTES round-2): every capacity regrow during settle is a
        # fresh multi-minute remote compile over the 30 ms tunnel — the
        # round-3 driver run died in exactly that loop (25 min, killed at
        # frame ~195/900, BENCH_r03.json rc=124). Seeding steady makes the
        # cold path one compile + cheap steps.
        state = ball_pit(n_bodies)
        config = PipelineConfig(
            pair_capacity=49152, contact_capacity=32768, max_colors=24,
            broad_phase_block=512, gs_cmax=4096, bp_slack=0.035,
            bc_pair_capacity=4096, gs_tail_window=1536,
            manifold_points=auto_manifold_points(
                state.shapes, 3,
                dynamic=np.asarray(state.bodies.is_dynamic())))
        # settle WITHOUT the slack cache (see profile_step.settled_state):
        # the churn-phase velocity inflation overflows grid budgets and
        # bloats pair capacity; plain per-frame BP settles cleanly, then
        # the cached-BP config takes over for the timed steady state.
        settle_cfg = _dc.replace(config, bp_slack=0.0)
        for f in range(settle_frames):
            state, settle_cfg = step_checked(state, params, settle_cfg)
            if f % 15 == 0:
                maxv = float(jnp.max(jnp.abs(state.bodies.vels.linear)))
                _log(f"physics settle frame {f}, "
                     f"pairs={int(np.asarray(state.pair_count)[0])}, "
                     f"cap={settle_cfg.pair_capacity}, maxvel={maxv:.2f}")
                if f >= 120 and maxv < calm_vel:
                    break
        _save_settled(ckpt, jax.block_until_ready(state), settle_cfg)
        _log(f"physics settled state saved to {os.path.basename(ckpt)}")

    # Steady-state candidates. The per-color window ladder seeds small HERE
    # (not during settle — churn-phase class growth would thrash rung
    # recompiles); each candidate's checked warmup grows its rungs to the
    # settled class sizes (+15%). Ladder FIRST: it is the correctness
    # reference the other candidates are gated against.
    # gs_cmax 8192 ≈ uncapped class sizes for this scene: balancing classes
    # only helped the retired uniform-window sweep; per-class rungs want
    # FEW, FULL classes (capless Luby colors the settled graph in 12
    # classes vs 17-24 capped — exp_degree_priority.py), and each rung
    # costs ~55 us of dispatch per sweep pass. Residue/overflow contracts
    # are unchanged (the cap stays nonzero).
    from wgmath_tpu.pipeline import fine_bucket

    # fine capacities + tight rungs: the solve is gather-ROW bound, so the
    # 1.5x bucket overshoot (contact 26.2k→32768, pairs 33.9k→49152) costs
    # ~1 ms/step of padding rows in the np/warmstart/rhs/sweep gathers.
    # Caps re-seed from the checkpoint's own counts (regrow only grows).
    cnt0 = np.asarray(state.pair_count)
    steady_base = _dc.replace(
        settle_cfg, bp_slack=config.bp_slack, gs_cmax=8192,
        fine_capacities=True, gs_rung_quantum=128, gs_rung_headroom=1.08,
        pair_capacity=fine_bucket(int(cnt0[0]) * 13 // 10),  # slack inflates
        contact_capacity=fine_bucket(int(cnt0[1])))
    ladder = _dc.replace(steady_base,
                         gs_windows=(128,) * steady_base.max_colors)
    return state, params, steady_base, ladder


def _phys_envelopes(out, n_static=5, radius=0.5):
    """(kinetic-energy proxy, max ball-ball penetration) from a run_k
    result — the long-horizon sanity aggregates for the candidate gate.
    KE proxy is Σ|v|² (bench balls share one mass); penetration comes from
    the cached pair list (bodies ≥ n_static are the pit's r=0.5 balls)."""
    trans = np.asarray(out[0])
    vel = np.asarray(out[2])
    ke = float(np.sum(vel * vel))
    pen = 0.0
    if out[3] is not None:
        a, b, v = (np.asarray(x) for x in out[3])
        both = v & (a >= n_static) & (b >= n_static)
        d = np.linalg.norm(trans[a] - trans[b], axis=-1)
        pen = float(np.max(np.where(both, 2.0 * radius - d, 0.0),
                           initial=0.0))
    return ke, pen


def bench_physics(n_bodies=10_000, settle_frames=900, calm_vel=0.05,
                  deadline=None, all_candidates=False, emit=None):
    """Times the *settled* contact-rich regime — the honest hot path for
    benchmark config 5.

    The pile is stepped until it rests (capacity re-buckets as contacts
    appear; a 23-body-tall lattice needs ~2.2 s of fall + relaxation, so
    settle runs until max |v| drops under ``calm_vel``) — ONCE: the settled
    state + grown config are checkpointed next to the compile cache, keyed
    by (scene, n, params, version), so repeat runs skip the ~15 min settle.

    Steady state then times EVERY solver candidate that compiles (K chained
    steps inside one jit, min of 3), gates each on positional agreement
    with the ladder reference (catches silent Mosaic miscomputes — round-2
    finding: kernels can compile AND miscompute), and reports the fastest.
    Candidate preference alone is never trusted: round 2 recorded 274.7
    ms/step from a first-that-runs fused_xla while the ladder did ~23 ms.
    Reference analog: the reference's fallback is correctness-triggered
    (/root/reference/crates/wgrapier/src/pipeline.rs:646-655)."""
    from wgmath_tpu.pipeline import step, step_checked

    import dataclasses as _dc

    state, params, steady_base, ladder = physics_steady_setup(
        n_bodies, settle_frames, calm_vel)
    # Default candidate list is pruned to the correctness reference (ladder)
    # + the round-3 winner (chained_rr) + the probed fused-Pallas path: each
    # extra candidate costs 4 remote compiles + 4 timed K=50 runs of tunnel
    # time, and uniform/chained/fused_xla never won a round
    # (--all-candidates restores them for solver-path studies).
    candidates = [
        # WINNER FIRST (cold-run resilience): pair-slot layout — contacts
        # stay at their color-major BP-cached pair slots, so the layout/
        # chain bundle and slotwise warmstart ride a bp-hit cond (round 4:
        # 9.9 ms/step = 101 steps/s vs 13.5 chained_rr). Its warmstart
        # decisions differ from the ladder's on flicker frames, so K-step
        # trajectories diverge CHAOTICALLY (x1.3/frame from 1e-4 seeds —
        # BENCH_NOTES round-3: GS depends on sweep order; only short
        # horizons are comparable) => gated on a 3-step ladder comparison
        # (vs the `ladder` config directly, no prior K-run needed), so a
        # cold driver run records the headline number after ~4 compiles
        # instead of after the full ladder pass.
        ("chained_ps", _dc.replace(ladder, gs_chained=True,
                                   gs_rhs_in_rung=True,
                                   gs_pair_slots=True), "short"),
        ("ladder", ladder, "k"),
        # chained sweep + in-kernel rhs relinearization (poses ride the
        # stream; the per-substep update_rhs_sorted phase disappears) —
        # bitwise-exact vs the ladder on device, 77.6 steps/s (2026-08-19)
        ("chained_rr", _dc.replace(ladder, gs_chained=True,
                                   gs_rhs_in_rung=True), "k"),
        # FUSED solver (whole sweep / build / warmstart+rhs / integration
        # as Pallas kernels) — needs multi-vreg tpu.dynamic_gather (probed)
        ("fused", _dc.replace(ladder, gs_fused=True, gs_rung0=256,
                              gs_fused_pallas=True), "k"),
    ]
    if all_candidates:
        candidates[3:3] = [
            # scatter-free chained sweep without rhs-in-rung
            ("chained", _dc.replace(ladder, gs_chained=True), "k"),
            # chained_ss = pair slots at STATIC rung offsets
            # (gs_static_slots): every per-rung slice compile-time
            # addressed (microbench: kills the ~2.1 ms/step of async
            # dynamic-slice starts). DEMOTED from the default list in
            # round 5: it diverges from chained_ps by ~2e-3/frame from the
            # FIRST frame at 10k bench scale (device gate read 0.0162 —
            # too close to the 1e-2 rejection line to trust a lucky draw),
            # while the 256-ball A/B (test_gs_chained) matches to 1e-5.
            # Root cause not yet isolated; keep behind --all-candidates
            # until the 10k A/B is bitwise-understood.
            ("chained_ss", _dc.replace(ladder, gs_chained=True,
                                       gs_rhs_in_rung=True,
                                       gs_pair_slots=True,
                                       gs_static_slots=True), "short"),
        ]
        candidates += [
            # the fused formulation lowered by XLA (wide lane gathers +
            # inverse-permutation scatter)
            ("fused_xla", _dc.replace(ladder, gs_fused=True, gs_rung0=256,
                                      gs_fused_pallas=False), "k"),
            ("uniform", steady_base, "k"),
        ]
    K = 50
    ref_pos = None  # ladder's end-of-run positions (correctness gate)
    timed = {}  # name -> (t_per_step, out, cfg)
    # the ladder's EVOLVED config (rung windows grown by checked steps to
    # the real class sizes) is needed up front: the short gate runs the
    # ladder reference with plain step(), and the pristine seed windows
    # (128) would overflow into the residue fallback = different physics
    # (observed: 0.111 m fake divergence). The ladder candidate reuses
    # this warmed state instead of re-warming.
    lad_st, lad_cfg = state, ladder
    try:
        for _ in range(6):
            lad_st, lad_cfg = step_checked(lad_st, params, lad_cfg)
        lad_st = jax.block_until_ready(lad_st)
    except Exception as e:  # pragma: no cover - backend-dependent
        # degrade, don't abort: without a warmed ladder the short-gated
        # candidates can't be verified (skipped below) but K-gated ones can
        # still warm themselves and gate against the ladder candidate's own
        # (per-candidate-try) run — a ladder warmup failure must not zero
        # the whole physics bench (ADVICE r04)
        _log(f"physics ladder warmup FAILED ({type(e).__name__}: "
             f"{str(e)[:200]}); short-gated candidates will be skipped")
        lad_st = None
    lad_env_cache = None  # ladder K-run envelopes, shared across candidates
    for name, cand, gate in candidates:
        if timed and deadline is not None and time.time() > deadline:
            _log(f"physics candidate {name} skipped: wall budget exhausted")
            continue
        if name == "fused" and not _fused_pallas_supported():
            _log("physics fused[pallas] skipped (probe: Mosaic lacks "
                 "multi-vreg dynamic_gather)")
            continue
        if gate == "short" and lad_st is None:
            _log(f"physics {name} skipped: no warmed ladder for the "
                 "short gate")
            continue
        try:
            if name == "ladder" and lad_st is not None:
                st, cfg = lad_st, lad_cfg
            else:
                st, cfg = state, cand
                # the slack-inflated pair list overruns the no-slack
                # settle capacity; checked steps re-bucket and materialize
                # the BP cache (and the fused layout's rungs) BEFORE timing
                for _ in range(6):
                    st, cfg = step_checked(st, params, cfg)
                st = jax.block_until_ready(st)

            # absolute timing of K chained steps inside ONE jit: slope
            # timing is unreliable on the tunnel; one dispatch amortizes
            # the ~30 ms latency to ~0.6 ms/step (included, honestly).
            # Besides positions/counts the run returns the end-state
            # velocities and cached pair list — the long-horizon
            # energy/penetration envelope gate below reads them.
            def make_run_k(cfg):
                @jax.jit
                def run_k(state):
                    def body(i, s):
                        return step(s, params, cfg)
                    s = jax.lax.fori_loop(0, K, body, state)
                    return (s.bodies.poses.translation, s.pair_count,
                            s.bodies.vels.linear,
                            None if s.bp_pairs is None else
                            (s.bp_pairs.body_a, s.bp_pairs.body_b,
                             s.bp_pairs.valid))
                return run_k

            run_k = make_run_k(cfg)

            out = jax.block_until_ready(run_k(st))  # compile + warm

            # correctness gate: all candidates advance the same physics
            # from the same settled state (6 warmup + K timed steps), so
            # end positions must agree with the ladder's to fp noise
            # (~1e-3 m over 56 steps from reordered reductions). Catches
            # compiles-but-miscomputes kernels (divergence → 1e13 / NaN)
            # long before the 5e-2 m tolerance.
            pos = np.asarray(out[0])
            if not np.all(np.isfinite(pos)):
                _log(f"physics {name} REJECTED: non-finite positions")
                continue
            if name == "ladder":
                ref_pos = pos
            elif gate == "short":
                # warmstart decisions legitimately differ from the
                # ladder's (e.g. pair-slot slotwise vs by-key on flicker
                # frames), so K-step trajectories diverge chaotically.
                # Gate on a 3-step ladder run from the SAME warmed state:
                # a miscompute (1e13/NaN) still screams, chaos gets no
                # time to grow past ~1e-3.
                def run3_host(c, s):
                    # host loop, not fori_loop: running the reference
                    # config on the candidate's state mutates the cache
                    # pytree STRUCTURE on the first step (e.g. a 6- vs
                    # 8-tuple solve bundle), which a scan carry cannot
                    # absorb; jit retraces per structure instead
                    f = jax.jit(lambda ss: step(ss, params, c))
                    for _ in range(3):
                        s = f(s)
                    return np.asarray(jax.block_until_ready(
                        s).bodies.poses.translation)

                p_cand = run3_host(cfg, st)
                p_lad = run3_host(lad_cfg, st)
                err = float(np.max(np.abs(p_cand - p_lad)))
                if not np.isfinite(err) or err > 1e-2:
                    _log(f"physics {name} REJECTED: 3-step divergence "
                         f"{err:.3g} m vs ladder from the same state")
                    continue
                _log(f"physics {name} matches ladder over 3 steps "
                     f"(max |dp| = {err:.2g})")
                # long-horizon envelope gate (VERDICT r04 #8): 3 steps
                # cannot see slow drift, so additionally bound the
                # candidate's K-step kinetic energy and max ball-ball
                # penetration against a ladder K-run (one extra compile,
                # shared by all short-gated candidates; trajectories
                # diverge chaotically but the settled pile's AGGREGATES
                # must not). The ladder run starts from the LADDER-warmed
                # state, not the candidate's: running lad_cfg on the
                # candidate's state flips the cache pytree STRUCTURE on
                # the first step (6- vs 8-tuple solve bundle), which a
                # fori_loop carry cannot absorb — that TypeError silently
                # ate the chained_ps candidate in the round-5 first run.
                # Both states are 6 warm steps from the same settled pile,
                # so the aggregates are comparable.
                if lad_env_cache is None:
                    lad_env_cache = jax.block_until_ready(
                        make_run_k(lad_cfg)(lad_st))
                lad_env = lad_env_cache
                ke_c, pen_c = _phys_envelopes(out)
                ke_l, pen_l = _phys_envelopes(lad_env)
                _log(f"physics {name} envelopes: KE {ke_c:.4g} vs ladder "
                     f"{ke_l:.4g}, max pen {pen_c:.4g} vs {pen_l:.4g}")
                if pen_c > pen_l + 5e-3 or ke_c > 2.0 * ke_l + 0.1:
                    _log(f"physics {name} REJECTED: K-step envelope "
                         "exceeds the ladder's (drift regression)")
                    continue
            else:
                if ref_pos is None:
                    _log(f"physics {name} skipped: no ladder reference "
                         "for the K-step gate")
                    continue
                err = float(np.max(np.abs(pos - ref_pos)))
                if err > 5e-2:
                    _log(f"physics {name} REJECTED: diverges from ladder "
                         f"by {err:.3g} m after {K} steps")
                    continue
                _log(f"physics {name} matches ladder (max |dp| = {err:.2g})")

            ts = []
            for r in range(3):
                t0 = time.time()
                out = jax.block_until_ready(run_k(st))
                ts.append(time.time() - t0)
                # don't burn tunnel time on a clear loser
                if r == 0 and timed and ts[0] / K > 3 * min(
                        v[0] for v in timed.values()):
                    break
            t = min(ts) / K
            timed[name] = (t, out, cfg)
            _log(f"physics candidate {name}: {t * 1e3:.2f} ms/step")
            if emit is not None:
                # bank the winner-so-far on stdout: a driver kill between
                # candidates still records a physics number
                emit(_physics_results(timed, n_bodies))
        except Exception as e:  # pragma: no cover - backend-dependent
            _log(f"physics {name} path failed ({type(e).__name__}: "
                 f"{str(e)[:200]})")
    assert timed, "every physics steady-state candidate failed"
    winner = min(timed, key=lambda k: timed[k][0])
    t = timed[winner][0]
    _log(f"physics winner = {winner}: {t * 1e3:.2f} ms/step "
         f"({1.0 / t:.1f} steps/s)")
    return _physics_results(timed, n_bodies)


def _physics_results(timed, n_bodies):
    winner = min(timed, key=lambda k: timed[k][0])
    t, out, config = timed[winner]
    counts = np.asarray(out[1])
    res = {f"physics_{n_bodies//1000}k_steps_per_s": 1.0 / t,
           "physics_pair_capacity": float(config.pair_capacity),
           "physics_pairs": float(counts[0]),
           "physics_contacts": float(counts[1]),
           "physics_winner": winner}
    for name, (tc, _, _) in timed.items():
        res[f"physics_ms_{name}"] = tc * 1e3
    return res


# north-star targets (BASELINE.md): 90% of f32 MXU roofline on v5e
# (≈ 197 bf16-TF/s ÷ 6 passes ≈ 33 TF → target 0.9×33 ≈ 30 for
# precision=highest) and 60 Hz at 10k bodies.
TARGETS = {
    "gemm4096_f32_highest_tflops": 30.0,
    "physics_10k_steps_per_s": 60.0,
    "quat_rotate_1m_gops": 10.0,
    "raycast_100k_mrays_s": 100.0,
}


def _score_line(results, fails, partial):
    ratios = {k: results[k] / t for k, t in TARGETS.items() if k in results}
    scores = list(ratios.values())
    vs = (math.exp(sum(math.log(max(s, 1e-9)) for s in scores) / len(scores))
          if scores else 0.0)
    line = {
        "metric": "bench_score_geomean_vs_targets",
        "value": round(vs, 4),
        "unit": "x_target",
        "vs_baseline": round(vs, 4),
        # per-target ratios alongside the geomean: a 10x raycast must not
        # mask a sub-1x physics number
        "ratios_vs_target": {k: round(v, 3) for k, v in ratios.items()},
        "details": {k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in results.items()},
    }
    if partial:
        line["partial"] = True
    if fails:
        line["failures"] = fails
    return line


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", default=None,
                    help="comma-separated bench subset (gemm,gemv,geometry,"
                         "fused,rays,physics); default = all")
    ap.add_argument("--all-candidates", action="store_true",
                    help="physics: time the historical solver paths too "
                         "(chained, fused_xla, uniform) — costs ~4 remote "
                         "compiles + 4 timed runs each")
    ap.add_argument("--budget-s", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 1500)),
                    help="wall-clock budget: once exceeded, remaining "
                         "benches/candidates are skipped and the current "
                         "consolidated score line is the final one "
                         "(default env BENCH_BUDGET_S or 1500)")
    ns = ap.parse_args(argv)
    only = set(ns.only.split(",")) if ns.only else None
    deadline = time.time() + ns.budget_s

    results = {}
    fails = {}

    def emit_partial(interim):
        """Incremental consolidated line (LAST one wins) — called between
        sections AND after every physics candidate, so a driver kill at any
        point still leaves the best-so-far numbers on stdout."""
        print(json.dumps(_score_line({**results, **interim}, fails,
                                     partial=True)), flush=True)

    # cheap target-bearing benches FIRST (~90 s warm banks the quat + ray
    # ratios), then physics (the headline the round is judged on), then
    # gemm (biggest wall cost per ratio). A cold driver run killed mid-
    # physics keeps 4 sections + the per-candidate physics lines; round 3
    # lost everything to exactly this (BENCH_r03.json rc=124).
    benches = [
        ("geometry", bench_geometry),
        ("rays", bench_rays),
        ("gemv", bench_gemv),
        ("fused", bench_fused_graph),
        ("physics", functools.partial(
            bench_physics, deadline=deadline,
            all_candidates=ns.all_candidates, emit=emit_partial)),
        ("gemm", bench_gemm),
    ]
    if only:
        benches = [(n, f) for n, f in benches if n in only]
    # volatile small benches (tunnel variance ±20-35% across runs,
    # BENCH_NOTES r04): rerun the whole section N times and keep the max
    # per metric (throughputs — max ≙ min time). Costs ~10 s/section warm.
    section_reruns = {"geometry": 3, "rays": 3}
    for i, (name, fn) in enumerate(benches):
        if i and time.time() > deadline:
            fails[name] = "skipped: wall budget exhausted"
            _log(f"skip {name}: wall budget exhausted")
            continue
        try:
            t0 = time.time()
            _log(f"start {name}")
            out = fn()
            for r in range(1, section_reruns.get(name, 1)):
                if time.time() > deadline:
                    break
                out2 = fn()
                out = {k: max(out[k], out2[k]) for k in out}
                _log(f"rerun {r} {name}: {out2}")
            results.update(out)
            results[f"_{name}_bench_wall_s"] = round(time.time() - t0, 1)
            _log(f"done {name}: {out}")
        except Exception as e:  # pragma: no cover
            fails[name] = f"{type(e).__name__}: {e}"
            _log(f"FAIL {name}: {e}")
        # emit the consolidated line incrementally (LAST one wins): if the
        # driver's timeout kills this process mid-bench, the numbers done so
        # far are still on stdout — round 3 lost a finished GEMM/ray suite
        # to a physics-settle timeout (BENCH_r03.json rc=124, parsed null)
        if i < len(benches) - 1:
            print(json.dumps(_score_line(results, fails, partial=True)),
                  flush=True)
    # a truncated run that dropped a target-bearing bench (e.g. gemm, the
    # lowest-ratio target) must not present an inflated geomean as final
    # (ADVICE r04): mark it partial so the recorded line is honest
    missing = [k for k in TARGETS if k not in results]
    if missing:
        _log(f"final line marked partial: missing target metrics {missing}")
    print(json.dumps(_score_line(results, fails, partial=bool(missing))),
          flush=True)


if __name__ == "__main__":
    main()
