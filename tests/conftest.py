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
