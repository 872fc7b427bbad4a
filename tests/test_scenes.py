"""Scene-suite smoke tests (≙ the reference's run-all demo validation):
representative scenes step a few frames through the testbed runner without
NaN or validation failures.

Each scene runs in a SUBPROCESS: XLA CPU has twice segfaulted inside
backend_compile_and_load when these compiles land after ~130 in-process
tests (every scene passes standalone — see CLAUDE.md round-1 notes), and the
suite must stay green for `pytest tests/ -x`. The compile cache keeps the
subprocess cost low.
"""

import os
import subprocess
import sys

import pytest

_SNIPPET = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", {cache!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from wgmath_tpu.testbed.runner import run_scene
stats = run_scene({scene!r}, frames=10, solver="tgs", verify=True)
assert stats.counters["steps"] == 10, stats.counters
print("SCENE_OK")
"""


@pytest.mark.parametrize("scene", ["joint_revolute3", "primitives3",
                                   "conveyor3",
                                   "polyline2", "boxes_and_balls2",
                                   "joint_prismatic3", "joint_ball2",
                                   "joint_prismatic2"])
def test_scene_smoke(scene):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(root, ".jax_cache_cpu")
    code = _SNIPPET.format(scene=scene, cache=cache)
    r = subprocess.run([sys.executable, "-c", code], cwd=root,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0 and "SCENE_OK" in r.stdout, (
        r.returncode, r.stdout[-500:], r.stderr[-2000:])
