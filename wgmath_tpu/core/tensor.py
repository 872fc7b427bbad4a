"""Strided views over flat buffers (≙ wgcore GpuTensor views / ViewShape).

The reference passes every linalg kernel a ``ViewShape {size[3], stride,
stride_mat, offset}`` uniform describing a strided window into a flat storage
buffer (wgcore/src/shapes.rs:12, tensor.rs:416-637): ``column``, ``columns``,
``rows``, ``matrix``, ``reshape``, embedded views. On TPU the idiomatic data
type is a plain ``jax.Array`` with static shape; views become
``lax.dynamic_slice``/strided gathers that XLA fuses into consumers. This
module provides the same view vocabulary as a thin pytree so user code keeps
the reference's expressiveness without copies escaping fusion.

Convention: like the reference, matrices are column-major *logically* —
``size = (nrows, ncols, nmats)``, a column is contiguous along ``stride=1``.
Internally we store buffers as jnp arrays indexed ``[mat, col, row]`` so the
fastest-varying (row) axis is the TPU lane axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax import tree_util


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class View:
    """A strided rank-<=3 window into a flat f32/i32 buffer.

    ``shape = (nrows, ncols, nmats)``; element (i, j, k) lives at flat index
    ``offset + i + j*stride + k*stride_mat`` — exactly the reference's
    ``iv/im/it`` indexing (wgebra linalg/shape.wgsl:10-67).
    """

    buffer: jax.Array  # flat 1-D storage
    shape: tuple[int, int, int]  # static
    stride: int
    stride_mat: int
    offset: int

    def tree_flatten(self):
        return (self.buffer,), (self.shape, self.stride, self.stride_mat, self.offset)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (buffer,) = children
        shape, stride, stride_mat, offset = aux
        return cls(buffer, shape, stride, stride_mat, offset)

    # -- view algebra (≙ tensor.rs:437-637) ---------------------------------
    def column(self, j: int) -> "View":
        return View(self.buffer, (self.shape[0], 1, 1), self.stride, self.stride_mat,
                    self.offset + j * self.stride)

    def columns(self, j: int, n: int) -> "View":
        return View(self.buffer, (self.shape[0], n, self.shape[2]), self.stride,
                    self.stride_mat, self.offset + j * self.stride)

    def rows(self, i: int, n: int) -> "View":
        return View(self.buffer, (n, self.shape[1], self.shape[2]), self.stride,
                    self.stride_mat, self.offset + i)

    def matrix(self, k: int) -> "View":
        return View(self.buffer, (self.shape[0], self.shape[1], 1), self.stride,
                    self.stride_mat, self.offset + k * self.stride_mat)

    def reshape(self, nrows: int, ncols: int, nmats: int = 1) -> "View":
        if nrows * ncols * nmats != self.shape[0] * self.shape[1] * self.shape[2]:
            raise ValueError("reshape must preserve element count")
        if not self.is_contiguous():
            raise ValueError("reshape requires a contiguous view")
        return View(self.buffer, (nrows, ncols, nmats), nrows, nrows * ncols, self.offset)

    def is_contiguous(self) -> bool:
        return self.stride == self.shape[0] and self.stride_mat == self.shape[0] * self.shape[1]

    # -- materialization ------------------------------------------------------
    def to_array(self) -> jax.Array:
        """Materialize as a dense ``[nmats, ncols, nrows]`` array (fusable)."""
        nrows, ncols, nmats = self.shape
        i = jnp.arange(nrows)
        j = jnp.arange(ncols) * self.stride
        k = jnp.arange(nmats) * self.stride_mat
        idx = self.offset + k[:, None, None] + j[None, :, None] + i[None, None, :]
        return self.buffer[idx]

    def to_matrix(self) -> jax.Array:
        """Materialize as ``[nrows, ncols]`` (rank<=2 views only)."""
        if self.shape[2] != 1:
            raise ValueError("to_matrix requires nmats == 1")
        return self.to_array()[0].T

    def to_vector(self) -> jax.Array:
        if self.shape[1] != 1 or self.shape[2] != 1:
            raise ValueError("to_vector requires ncols == nmats == 1")
        return self.to_array()[0, 0]


def view_of(x: Any) -> View:
    """Wrap a dense array (vector [n], matrix [r,c], cube [m,c,r] batched) as a
    contiguous column-major View (≙ TensorBuilder defaults, tensor.rs:65)."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        n = x.shape[0]
        return View(x, (n, 1, 1), n, n, 0)
    if x.ndim == 2:
        r, c = x.shape
        # store column-major: buffer index = i + j*r → flatten x.T
        return View(x.T.reshape(-1), (r, c, 1), r, r * c, 0)
    if x.ndim == 3:
        m, c, r = x.shape  # batched: [mat, col, row]
        return View(x.reshape(-1), (r, c, m), r, r * c, 0)
    raise ValueError(f"rank {x.ndim} > 3 unsupported")
