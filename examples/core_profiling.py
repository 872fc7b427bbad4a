"""Phase timing + buffer readback (≙ wgcore examples/timestamp_queries.rs
and buffer_readback.rs): run a pipeline step under PhaseTimer, read device
arrays back to host, and print the per-phase summary."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import numpy as np

from wgmath_tpu.core.profiling import RunStats, PhaseTimer
from wgmath_tpu.dynamics import SimParams
from wgmath_tpu.pipeline import PipelineConfig, step_checked
from wgmath_tpu.scenes.builders import SCENES

stats = RunStats()
timer = PhaseTimer(stats)
state = SCENES["balls2"]()
params, config = SimParams(), PipelineConfig(pair_capacity=2048)
with timer.phase("warmup+compile"):
    state, config = step_checked(state, params, config, stats)
for _ in range(5):
    with timer.phase("step"):
        state, config = step_checked(state, params, config, stats)
pos = np.asarray(state.bodies.poses.translation)  # buffer readback
print("readback: first body at", pos[1].round(3))
print(stats.summary())
