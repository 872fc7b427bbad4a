"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests use
``xla_force_host_platform_device_count`` (the TPU-build analog of the
reference's "tests need a live GPU" constraint, which CPU-JAX removes —
SURVEY §4 implications). Must run before the first ``import jax``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend at interpreter start and
# sets jax_platforms="axon,cpu"; force CPU *after* import but before backend
# init so tests never contend for the single tunneled TPU chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: CPU-XLA compiles dominate suite wall time; repeat
# runs (and xdist workers) reuse compiled executables across processes
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# XLA CPU (jax 0.9) reliably SEGFAULTs/aborts when loading roughly the
# ~118th compiled executable of a process — reproduced at whatever test hits
# that count regardless of collection order, compile-vs-cache-read path, or
# which test it is (each crasher passes standalone; a fresh same-host
# compile cache does not help, so it is executable COUNT, not staleness).
# Until the upstream bug is fixed, any invocation transparently splits
# itself: tests run in this process up to a compile-weighted budget, the
# rest re-exec as a child pytest (which recursively splits again). Weights
# approximate compiled-executables-per-test so compile-heavy pipeline
# suites split earlier (test_physics alone crashed at ~25 tests).
_BUDGET = 80
# executables-per-test estimates by file (default 1)
_WEIGHT = {"test_physics": 4, "test_scenes": 4, "test_parallel": 4,
           "test_oracle": 3, "test_mesh_accel": 3, "test_gs_fused": 3,
           "test_standalone_shapes": 3, "test_joints": 2, "test_queries": 2}


def _fname(it):
    return it.nodeid.split("::")[0].rsplit("/", 1)[-1].removesuffix(".py")


def pytest_collection_modifyitems(config, items):
    # heavyweight pipeline suites first (best -x fail-fast signal)
    order = {"test_physics": 0, "test_scenes": 1, "test_parallel": 2,
             "test_queries": 3, "test_joints": 4, "test_lbvh": 5}
    items.sort(key=lambda it: order.get(_fname(it), 10))
    spent = 0
    for i, it in enumerate(items):
        spent += _WEIGHT.get(_fname(it), 1)
        if spent > _BUDGET and i + 1 < len(items):
            config._wgmath_rest = [x.nodeid for x in items[i + 1:]]
            del items[i + 1:]
            break


def pytest_sessionfinish(session, exitstatus):
    rest = getattr(session.config, "_wgmath_rest", None)
    if not rest or exitstatus != 0:
        return
    import subprocess
    import sys

    args = [sys.executable, "-m", "pytest", "-q"]
    for flag in ("-x",):
        if session.config.getoption("exitfirst", False):
            args.append(flag)
    r = subprocess.run(args + rest,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    if r.returncode != 0:
        session.exitstatus = r.returncode
