"""Per-fusion device profile of the steady-state physics step.

The jax.profiler trace works through the tunnel: device-side op timings
land in the xplane proto, immune to the ~30 ms dispatch latency that makes
host wall-timing of single calls worthless here (CLAUDE.md measurement
doctrine). This script traces K chained steps of a chosen candidate config
in ONE dispatch and prints device time aggregated per op/fusion, both raw
and per step — the tool that found the pair-slot win (layout/sides/chain
conds taking their expensive branch every settled frame).

Run on the TPU (one measurement process at a time):
    python scripts/profile_device.py [ps|rr|ladder] [K]
"""

import dataclasses
import glob
import gzip
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

import bench
from wgmath_tpu.pipeline import step, step_checked


def trace_run(state, params, cfg, k, logdir):
    @jax.jit
    def run_k(s):
        def body(i, ss):
            return step(ss, params, cfg)
        out = jax.lax.fori_loop(0, k, body, s)
        return out.bodies.poses.translation, out.pair_count

    out = jax.block_until_ready(run_k(state))  # compile + warm
    with jax.profiler.trace(logdir):
        out = jax.block_until_ready(run_k(state))
    return out


def parse_xplane(logdir, k):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {logdir}"
    path = max(paths, key=os.path.getmtime)
    raw = open(path, "rb").read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    space = xplane_pb2.XSpace()
    space.ParseFromString(raw)

    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        # "XLA Ops" is the authoritative per-fusion line; TraceMe annotations
        # WRAP op events, so summing both double-counts device time
        # (ADVICE r04). Fall back to TraceMe only when no op line exists.
        op_lines = [ln for ln in plane.lines if "XLA Ops" in ln.name]
        if not op_lines:
            op_lines = [ln for ln in plane.lines if "XLA TraceMe" in ln.name]
        per_op = defaultdict(float)
        total = 0.0
        for line in op_lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                ms = ev.duration_ps / 1e9
                per_op[name] += ms
                total += ms
        if not per_op:
            continue
        print(f"\n=== plane: {plane.name}  (device total {total:.2f} ms, "
              f"{total / k:.3f} ms/step over K={k}) ===")
        width = max(len(n) for n in per_op)
        for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:45]:
            print(f"  {ms:9.3f} ms  {ms / k * 1e3:8.1f} us/step  "
                  f"{name[:110]}")
    return None


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "ps"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    state, params, steady_base, ladder = bench.physics_steady_setup()
    ps = dataclasses.replace(ladder, gs_chained=True,
                             gs_rhs_in_rung=True, gs_pair_slots=True)
    cfg = {
        "ladder": ladder,
        "rr": dataclasses.replace(ladder, gs_chained=True,
                                  gs_rhs_in_rung=True),
        "ps": ps,
        # forced-hit: separates repair/refresh CADENCE (vanishes here)
        # from constant conditional overhead (persists here)
        "ps_hit": dataclasses.replace(ps, bp_force="hit"),
    }[mode]
    st = state
    for _ in range(6):
        st, cfg = step_checked(st, params, cfg)
    st = jax.block_until_ready(st)
    logdir = f"/tmp/devtrace_{mode}"
    out = trace_run(st, params, cfg, k, logdir)
    print(f"{mode}: traced K={k} steps, contacts="
          f"{int(np.asarray(out[1])[1])}")
    parse_xplane(logdir, k)


if __name__ == "__main__":
    main()
