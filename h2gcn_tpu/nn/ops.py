"""Shared functional layer ops."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(v, rate, key, salt: int, training: bool = True):
    """Inverted dropout with a salted key (identity in eval / keyless mode).

    Element-wise on dense arrays — mathematically identical to the
    reference's sparse-value dropout (h2gcn/models/_layers.py:12-19): keeping
    a structural zero rescales 0 → 0.
    """
    if not training or key is None or rate <= 0:
        return v
    k = jax.random.fold_in(key, salt)
    keep = 1.0 - rate
    mask = jax.random.bernoulli(k, keep, v.shape)
    return jnp.where(mask, v / keep, 0.0)
