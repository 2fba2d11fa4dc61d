"""Checkpoint / resume for fit state and precomputed query volumes.

The reference has no checkpointing (nearest analogue: the commented-out
per-block stats dump at volumeRender_kernel.cu:1624-1635). Here any pytree
(TF-LUT params, optimizer state, stats volumes, step counters) round-trips
through a single ``.npz`` file: leaves as arrays, treedef pickled alongside.
"""

from __future__ import annotations

import io
import os
import pickle
from typing import Any

import jax
import numpy as np

_VERSION = 1


def save_checkpoint(path: str, tree: Any) -> None:
    """Atomically write a pytree checkpoint to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    payload = {f"leaf_{i:05d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    payload["__treedef__"] = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    payload["__version__"] = np.asarray(_VERSION)
    buf = io.BytesIO()
    np.savez(buf, **payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fp:
        fp.write(buf.getvalue())
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Any:
    """Restore the pytree saved by :func:`save_checkpoint`."""
    with np.load(path, allow_pickle=False) as data:
        version = int(data["__version__"])
        if version != _VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        treedef = pickle.loads(data["__treedef__"].tobytes())
        keys = sorted(k for k in data.files if k.startswith("leaf_"))
        leaves = [data[k] for k in keys]
    return jax.tree_util.tree_unflatten(treedef, leaves)
