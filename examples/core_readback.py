"""Device buffer readback (≙ wgcore examples/buffer_readback.rs).

The reference copies a STORAGE buffer into a MAP_READ staging buffer and
maps it to the host. On TPU the same contract is: device-commit the array
(`jax.device_put` + `block_until_ready` ≙ queue submit), then read it back
(`jax.device_get` ≙ staging map) and compare against the host original.
The View machinery (core/tensor.py) plays the GpuVector role — the readback
of a strided view is also exercised, which the reference's contiguous copy
cannot express.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

# the axon sitecustomize forces jax_platforms="axon,cpu"; the config update
# (not the env var) is what actually keeps this demo off the shared TPU
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from wgmath_tpu.core.tensor import View

LEN = 10
host = np.arange(LEN, dtype=np.uint32)

# GpuVector::init(..., STORAGE | COPY_SRC) ≙ device_put + commit
buffer = jax.block_until_ready(jax.device_put(jnp.asarray(host)))
print("device:", buffer.devices())

# staging.copy_from + staging.read ≙ device_get
read = np.asarray(jax.device_get(buffer))
assert np.array_equal(host, read)
print("Buffer copy & read succeeded!")
print("Original:", host.tolist())
print("Readback:", read.tolist())

# strided-view readback: a column view of a matrix buffer round-trips too
# (column-major flat storage, ≙ GpuMatrix + shape.wgsl iv indexing)
mat = np.arange(12, dtype=np.float32).reshape(3, 4)
buf = jax.device_put(jnp.asarray(mat.T.flatten()))
col = View(buf, (3, 4, 1), 3, 12, 0).column(2)
col_read = np.asarray(jax.device_get(col.to_vector()))
assert np.array_equal(col_read, mat[:, 2])
print("View column readback:", col_read.tolist())
