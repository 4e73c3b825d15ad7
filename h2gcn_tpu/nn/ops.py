"""Shared functional layer ops."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(v, rate, key, salt: int, training: bool = True):
    """Inverted dropout with a salted key (identity in eval / keyless mode).

    Element-wise on dense arrays — mathematically identical to the
    reference's sparse-value dropout (h2gcn/models/_layers.py:12-19): keeping
    a structural zero rescales 0 → 0. A :class:`SparseMatrix` input gets the
    reference's SparseDropout semantics directly (mask on stored values,
    rescale by 1/keep — padding values are zero and stay zero).
    """
    if not training or key is None or rate <= 0:
        return v
    from ..sparse.matrix import SparseMatrix

    k = jax.random.fold_in(key, salt)
    keep = 1.0 - rate
    if isinstance(v, SparseMatrix):
        if v.backend != "segment":
            raise ValueError(
                "sparse dropout needs the segment backend (dense/bsr payload "
                "caches would go stale) — export features with "
                "backend='segment'")
        mask = jax.random.bernoulli(k, keep, v.vals.shape)
        return v.replace(vals=jnp.where(mask, v.vals / keep, 0.0))
    mask = jax.random.bernoulli(k, keep, v.shape)
    return jnp.where(mask, v / keep, 0.0)
