"""Checkpoint / resume for physics state.

The reference has NO checkpointing (SURVEY §5: state lives in GPU buffers,
the only resume is a full re-upload). Here the whole ``PhysicsState`` is a
pytree of arrays, so checkpointing is a strict capability win: save/load to
``.npz`` with the pytree structure, plus an optional orbax path for async
multi-host checkpoints.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np


def save(path: str, state) -> None:
    """Serialize any pytree of arrays to ``path`` (npz + pickled treedef)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    with open(path, "wb") as f:
        pickle.dump({"treedef": treedef, "arrays": arrays}, f)


def load(path: str):
    with open(path, "rb") as f:
        blob = pickle.load(f)

    def to_dev(x):
        x = np.asarray(x)
        if x.dtype.kind in "biufc":  # numeric → device array
            return jnp.asarray(x)
        return x.item() if x.ndim == 0 else x  # strings etc. stay host-side

    leaves = [to_dev(blob["arrays"][f"leaf_{i}"])
              for i in range(len(blob["arrays"]))]
    return jax.tree.unflatten(blob["treedef"], leaves)


def save_orbax(path: str, state) -> None:  # pragma: no cover - optional dep
    """Async orbax checkpoint (for sharded multi-host states)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
