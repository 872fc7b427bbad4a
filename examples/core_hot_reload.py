"""Hot reload + registry override (≙ wgcore examples/hot_reloading.rs and
overwrite.rs): watch module sources, report stale modules after an edit,
and reload them in place."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from wgmath_tpu.core import module as m
import wgmath_tpu.ops.gemm  # noqa: F401

stamps = m.watch_sources(["linalg.gemm"])
print("watching:", {os.path.basename(k): round(v) for k, v in stamps.items()})
src = m.get_module("linalg.gemm")
path = sys.modules[src.provides["gemm"].__module__].__file__
os.utime(path)  # simulate an edit
stale = m.needs_reload(stamps)
print("stale after edit:", stale)
for name in stale:
    m.reload(name)
print("reloaded ok:", bool(m.get_module("linalg.gemm")))
