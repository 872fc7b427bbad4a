"""Testbed: scene runner + backend switch + stats (≙ wgrapier src_testbed:
Testbed::run lib.rs:42-71, SimulationBackend trait backend/mod.rs:24,
CPU/GPU backend switch, ui.rs stats overlay; examples CLI
all_examples3.rs:27-38 --example/--list).

Headless TPU rendition: the kiss3d window + egui UI becomes a terminal/CSV
frontend (optional matplotlib scatter snapshots); the CPU(rapier) oracle
backend becomes the same pipeline jitted on the CPU backend — bit-identical
math, which is a *stronger* oracle than the reference's behavioral
comparison.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

from wgmath_tpu.core.profiling import PhaseTimer, RunStats
from wgmath_tpu.dynamics import SimParams
from wgmath_tpu.pipeline import PipelineConfig, step_checked
from wgmath_tpu.scenes.builders import SCENES


@dataclasses.dataclass
class BackendConfig:
    """≙ the testbed's backend selector (CPU / GPU × {TGS, Jacobi})."""

    solver: str = "tgs"  # "tgs" | "jacobi"
    bp_slack: float = 0.0  # temporal-coherence broad phase (0 = off)
    gs_chained: bool = False  # scatter-free chained GS sweep

    def pipeline_config(self, pair_capacity=16384,
                        manifold_points=0) -> PipelineConfig:
        extra = {}
        if self.gs_chained:
            # the chained sweep needs the per-color window ladder; seed
            # small rungs and let step_checked re-bucket them
            extra = dict(gs_chained=True, max_colors=16,
                         gs_windows=(256,) * 16, gs_cmax=1024)
        return PipelineConfig(pair_capacity=pair_capacity,
                              use_jacobi=self.solver == "jacobi",
                              bp_slack=self.bp_slack,
                              manifold_points=manifold_points, **extra)


def run_scene(name: str, *, frames: int = 300, solver: str = "tgs",
              dump_every: int = 0, verify: bool = False,
              bp_slack: float = 0.0, record: str | None = None,
              record_every: int = 1, gs_chained: bool = False,
              backend: str = "jax") -> RunStats:
    """Step a demo scene, printing per-phase stats (≙ Testbed::run loop +
    RunStats overlay). ``record`` writes a pose-trajectory npz for
    ``testbed.viewer`` (≙ the reference's graphics backend, rendered
    offline instead of live).

    ``backend="oracle"`` switches to the INDEPENDENT f64 numpy engine
    (testbed/oracle.py) — the analog of the reference testbed's live
    rapier-CPU backend switch (src_testbed/backend/cpu.rs:27,
    backend/mod.rs:24): a structurally unrelated solver running the same
    scene, for live cross-checks. Ball/cuboid scenes, 3D, no joint
    pytree."""
    import jax

    from wgmath_tpu.pipeline import auto_manifold_points

    state = SCENES[name]()
    if backend == "oracle":
        import dataclasses as _dc

        from wgmath_tpu.testbed.oracle import run_oracle_backend

        stats = RunStats()
        recorder = None
        if record:
            from wgmath_tpu.testbed.viewer import Recorder

            recorder = Recorder(state)
            recorder.record(state)

        def on_frame(f, bodies):
            pos = np.stack([b.pos for b in bodies])
            if verify and not np.all(np.isfinite(pos)):
                raise AssertionError(f"oracle NaN/Inf at frame {f}")
            if recorder is not None and f % max(record_every, 1) == 0:
                import jax.numpy as jnp

                ps = state.bodies.poses
                new_poses = _dc.replace(
                    ps, translation=jnp.asarray(pos, jnp.float32),
                    rotation=jnp.asarray(
                        np.stack([b.rot for b in bodies]), jnp.float32))
                recorder.record(_dc.replace(
                    state, bodies=_dc.replace(state.bodies,
                                              poses=new_poses)))
            if dump_every and f % dump_every == 0:
                print(f"frame {f}: y[min/mean/max] = "
                      f"{pos[:, 1].min():.3f}/{pos[:, 1].mean():.3f}/"
                      f"{pos[:, 1].max():.3f}", flush=True)

        t0 = time.perf_counter()
        run_oracle_backend(state, frames, on_frame=on_frame)
        stats.add_phase("step", (time.perf_counter() - t0) * 1e3)
        stats.counters["steps"] = frames
        per_step = stats.phase_ms["step"] / max(frames, 1)
        stats.counters["steps_per_second"] = int(1000.0 / max(per_step,
                                                              1e-9))
        if recorder is not None:
            recorder.save(record)
            print(f"recorded {len(recorder.frames)} frames -> {record}")
        return stats
    params = SimParams.jacobi() if solver == "jacobi" else SimParams.tgs_soft()
    dim = state.bodies.poses.translation.shape[-1]
    config = BackendConfig(solver, bp_slack, gs_chained).pipeline_config(
        manifold_points=auto_manifold_points(state.shapes, dim))
    stats = RunStats()
    timer = PhaseTimer(stats)
    recorder = None
    if record:
        from wgmath_tpu.testbed.viewer import Recorder

        recorder = Recorder(state)
        recorder.record(state)

    t_compile = time.perf_counter()
    state, config = step_checked(state, params, config, stats)
    jax.block_until_ready(state.bodies.poses.translation)
    stats.add_phase("compile+first_step", (time.perf_counter() - t_compile) * 1e3)

    for frame in range(1, frames):
        with timer.phase("step") as h:
            state, config = step_checked(state, params, config, stats)
            h.append(state.bodies.poses.translation)
        if verify:
            debug_validate(state)
        if recorder is not None and frame % max(record_every, 1) == 0:
            recorder.record(state)
        if dump_every and frame % dump_every == 0:
            pos = np.asarray(state.bodies.poses.translation)
            print(f"frame {frame}: y[min/mean/max] = "
                  f"{pos[:, 1].min():.3f}/{pos[:, 1].mean():.3f}/{pos[:, 1].max():.3f}",
                  flush=True)
    if recorder is not None:
        recorder.save(record)
        print(f"recorded {len(recorder.frames)} frames -> {record}")
    per_step = stats.phase_ms.get("step", 0.0) / max(frames - 1, 1)
    stats.counters["steps_per_second"] = int(1000.0 / max(per_step, 1e-9))
    return stats


def debug_validate(state) -> None:
    """NaN scan + pair-list sanity (≙ slow_verify_collision_pair_lists,
    pipeline.rs:701-771 — the reference's debug-only race/NaN validator)."""
    pos = np.asarray(state.bodies.poses.translation)
    if not np.all(np.isfinite(pos)):
        raise AssertionError("NaN/Inf in body poses")
    if state.prev_constraints is not None:
        cons = state.prev_constraints
        valid = np.asarray(cons.valid)
        a = np.asarray(cons.body_a)[valid]
        b = np.asarray(cons.body_b)[valid]
        n = pos.shape[0]
        if valid.any() and (a.max(initial=0) >= n or b.max(initial=0) >= n):
            raise AssertionError("constraint body index out of range")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="wgmath_tpu testbed (≙ wgrapier demo runner)")
    ap.add_argument("--example", default=None, help="scene name")
    ap.add_argument("--list", action="store_true", help="list scenes")
    ap.add_argument("--run-all", action="store_true")
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--solver", choices=["tgs", "jacobi"], default="tgs")
    ap.add_argument("--dump-every", type=int, default=0)
    ap.add_argument("--verify", action="store_true",
                    help="per-frame NaN/constraint validation")
    ap.add_argument("--record", default=None, metavar="PATH.npz",
                    help="record the pose trajectory for testbed.viewer "
                         "(render: python -m wgmath_tpu.testbed.viewer "
                         "PATH.npz --out-dir frames --gif out.gif)")
    ap.add_argument("--record-every", type=int, default=1)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--live", action="store_true",
                    help="interactive matplotlib window (≙ the reference's "
                         "kiss3d+egui testbed): live scatter, runtime "
                         "solver/backend switch on 't'/'c', pause on space")
    ap.add_argument("--gs-chained", action="store_true",
                    help="scatter-free chained GS sweep (window-ladder "
                         "layout; solver runtime switch)")
    ap.add_argument("--bp-slack", type=float, default=0.0,
                    help="broad-phase temporal-coherence slack (0 = off; "
                         "pairs are cached until a body's AABB drifts past "
                         "the slack — exact, narrow phase re-tests)")
    ap.add_argument("--backend", choices=["jax", "oracle"], default="jax",
                    help="engine switch (≙ the reference testbed's "
                         "rapier-CPU backend, backend/cpu.rs:27): 'oracle' "
                         "runs the scene on the INDEPENDENT f64 numpy "
                         "engine (ball/cuboid scenes, 3D, no joints)")
    ap.add_argument("--device", choices=["default", "cpu"], default="default",
                    help="backend switch (≙ the reference testbed's CPU/GPU "
                         "toggle): 'cpu' forces the CPU oracle backend even "
                         "when an accelerator is attached")
    args = ap.parse_args(argv)

    if args.device == "cpu":
        import jax

        # env vars are overridden by the axon sitecustomize; the config call
        # after import is authoritative (must run before backend init)
        jax.config.update("jax_platforms", "cpu")

    if args.list:
        for name in SCENES:
            print(name)
        return 0

    if args.bp_slack < 0:
        ap.error(f"--bp-slack must be >= 0 (got {args.bp_slack}); negative "
                 "slack would deflate the cached AABBs and miss pairs")
    names = list(SCENES) if args.run_all else [args.example or "balls3"]
    unknown = [n for n in names if n not in SCENES]
    if unknown:
        print(f"unknown scene(s): {', '.join(unknown)}", file=sys.stderr)
        print(f"available: {', '.join(SCENES)}", file=sys.stderr)
        return 2
    if args.live:
        from wgmath_tpu.testbed.live import LiveViewer

        stats = LiveViewer(names[0], solver=args.solver,
                           bp_slack=args.bp_slack,
                           gs_chained=args.gs_chained,
                           frames=args.frames).run()
        print(stats.summary())
        return 0
    for name in names:
        stats = run_scene(name, frames=args.frames, solver=args.solver,
                          dump_every=args.dump_every, verify=args.verify,
                          bp_slack=args.bp_slack, record=args.record,
                          record_every=args.record_every,
                          gs_chained=args.gs_chained, backend=args.backend)
        if args.json:
            print(json.dumps({"scene": name, "phase_ms": stats.phase_ms,
                              "counters": stats.counters}))
        else:
            print(f"=== {name} ===")
            print(stats.summary())
    return 0


if __name__ == "__main__":
    sys.exit(main())
