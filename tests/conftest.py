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


# The round-1 "XLA CPU segfaults after ~120 cold compiles" flake was
# root-caused (2026-08-20, /proc poller: crash at maps=64209) to
# vm.max_map_count exhaustion — every LLVM-JIT'd executable holds many mmap
# regions; big pipeline programs hold thousands. Raise the kernel cap
# up front and, as a fallback for environments where that write fails,
# drop JAX's executable caches between tests when map pressure nears the
# cap (the persistent compile cache makes reloads cheap).
from wgmath_tpu.core import hostmem  # noqa: E402

if not hostmem.raise_map_limit():
    import warnings

    warnings.warn("could not raise vm.max_map_count; relying on the "
                  "map-pressure guard (cache clears between tests)")


def pytest_runtest_teardown(item, nextitem):
    if hostmem.map_pressure_guard():
        print(f"\n[conftest] map pressure: cleared jax caches "
              f"(now {hostmem.current_map_count()} maps)")


def pytest_collection_modifyitems(config, items):
    # heavyweight pipeline suites first (best -x fail-fast signal)
    order = {"test_physics": 0, "test_scenes": 1, "test_parallel": 2,
             "test_queries": 3, "test_joints": 4, "test_lbvh": 5}

    def fname(it):
        return it.nodeid.split("::")[0].rsplit("/", 1)[-1].removesuffix(".py")

    items.sort(key=lambda it: order.get(fname(it), 10))
