"""Scene-suite smoke tests (≙ the reference's run-all demo validation):
representative scenes step a few frames through the testbed runner without
NaN or validation failures."""

import numpy as np
import pytest

from wgmath_tpu.testbed.runner import run_scene


@pytest.mark.parametrize("scene", ["joint_revolute3", "primitives3", "polyline2", "boxes_and_balls2", "joint_prismatic3"])
def test_scene_smoke(scene):
    stats = run_scene(scene, frames=10, solver="tgs", verify=True)
    assert stats.counters["steps"] == 10
