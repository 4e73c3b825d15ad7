"""Pytree checkpointing: portable .npz snapshots of (params, opt_state).

The reference saves a ``tf.train.Checkpoint(optimizer, model)`` every epoch
and restores the best one for final evaluation (reference:
h2gcn/modules/logger.py:58-79). Here a checkpoint is a flat ``.npz`` of the
pytree leaves keyed by their tree paths — fast, dependency-free, and
structure-checked on restore.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def _flatten(tree):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): leaf for path, leaf in leaves_with_paths}


def save_pytree(path, tree) -> str:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = {k: np.asarray(v) for k, v in _flatten(tree).items()}
    np.savez(path, **flat)
    return str(path)


def load_pytree(path, like):
    """Load arrays saved by :func:`save_pytree` into the structure of ``like``."""
    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_suffix(path.suffix + ".npz")
    with np.load(str(path)) as data:
        stored = dict(data)
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for keypath, old_leaf in paths:
        key = jax.tree_util.keystr(keypath)
        if key not in stored:
            raise KeyError(f"checkpoint {path} is missing leaf {key}")
        new_leaf = stored[key]
        if np.shape(new_leaf) != np.shape(old_leaf):
            raise ValueError(
                f"leaf {key} shape {np.shape(new_leaf)} != {np.shape(old_leaf)}"
            )
        leaves.append(jax.numpy.asarray(new_leaf))
    return jax.tree_util.tree_unflatten(treedef, leaves)
