"""Multi-chip scale-out over ICI meshes (additive to the single-device
reference; see parallel/sharded.py)."""

from wgmath_tpu.parallel.sharded import (  # noqa: F401
    body_mesh,
    make_sharded_step,
    shard_state,
)
