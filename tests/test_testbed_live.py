"""Live-viewer tests (headless): the interactive loop's state machine —
advance, pause, runtime solver/backend switch, reset — without a display
(≙ the reference testbed's ui.rs backend picker semantics)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np

from wgmath_tpu.testbed.live import LiveViewer


def _finite(v):
    return np.all(np.isfinite(np.asarray(v.state.bodies.poses.translation)))


def test_live_viewer_switches_backends():
    v = LiveViewer("balls2", pair_capacity=4096)
    for _ in range(3):
        v.advance()
    assert v.frame == 3 and _finite(v)
    assert v.backend.solver == "tgs"

    # runtime solver switch (≙ ui.rs TGS <-> Jacobi): same state, new config
    v.on_key("t")
    assert v.backend.solver == "jacobi"
    v.advance()
    assert v.frame == 4 and _finite(v)

    # chained-sweep backend variant (forces solver back to tgs)
    v.on_key("c")
    assert v.backend.gs_chained and v.backend.solver == "tgs"
    v.advance()
    assert _finite(v)

    # pause gates advance via the key handler; 'n' single-steps
    v.on_key(" ")
    assert v.paused
    f = v.frame
    v.on_key("n")
    assert v.frame == f + 1
    v.on_key(" ")
    assert not v.paused

    # reset rebuilds the scene at frame 0
    v.on_key("r")
    assert v.frame == 0 and _finite(v)

    # status line carries the overlay facts (mode, frame, pair count)
    v.advance()
    s = v.status()
    assert "tgs+chained" in s and "frame 1" in s and "pairs" in s

    v.on_key("q")
    assert v.closed


def test_live_viewer_draws_headless():
    import matplotlib.pyplot as plt

    v = LiveViewer("balls2", pair_capacity=4096, frames=2)
    v.advance()
    fig = plt.figure()
    ax = fig.add_subplot(111)
    v.draw(fig, ax)  # Agg canvas: draw must not require a window
    assert "balls2" in ax.get_title(loc="left")
    plt.close(fig)


def test_live_viewer_instanced_mesh_mode_and_picker():
    """'m' toggles instanced 3D mesh rendering (≙ graphics.rs:30-41) and
    '[' / ']' cycle demo scenes live (≙ the egui demo picker, ui.rs)."""
    import matplotlib.pyplot as plt
    import numpy as np

    from wgmath_tpu.scenes.builders import SCENES

    v = LiveViewer("boxes3", pair_capacity=8192, frames=2)
    assert v.dim == 3 and not v.mesh_mode
    v.on_key("m")
    assert v.mesh_mode
    v.advance()
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    v.draw(fig, ax)  # instanced Poly3DCollection path, headless
    assert len(ax.collections) >= 1
    plt.close(fig)

    # every body contributed oriented faces (boxes: 12 tris each)
    pos = np.asarray(v.state.bodies.poses.translation)
    rot = np.asarray(v.state.bodies.poses.rotation)
    tris, cols = v._inst.world_polys(rot, pos, v.dynamic)
    assert len(tris) == 12 * len(pos)
    assert np.isfinite(tris).all()

    # demo picker: ']' moves to the next scene name, state reloads
    names = sorted(SCENES)
    i = names.index("boxes3")
    v.on_key("]")
    assert v.scene == names[(i + 1) % len(names)] and v.frame == 0
    v.on_key("[")
    assert v.scene == "boxes3"


def test_oracle_backend_runs_conveyor():
    """The independent-engine switch (≙ the reference's rapier CPU
    backend, backend/cpu.rs:27): the f64 numpy oracle drives a scene
    end-to-end through the runner surface, and its conveyor physics
    matches the engine's semantics (platform rides its prescribed
    velocity)."""
    import numpy as np

    from wgmath_tpu.scenes.builders import conveyor
    from wgmath_tpu.testbed.oracle import run_oracle_backend
    from wgmath_tpu.testbed.runner import run_scene

    stats = run_scene("conveyor3", frames=5, backend="oracle", verify=True)
    assert stats.counters["steps"] == 5

    pos, rot = run_oracle_backend(conveyor(n_balls=4), 30)
    assert pos[1, 0] == np.float64(30.0 / 60.0) or abs(
        pos[1, 0] - 0.5) < 1e-9  # kinematic platform: x = v t exactly
    assert np.isfinite(pos).all()
