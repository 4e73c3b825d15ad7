"""Masked loss / accuracy — semantics of the reference metrics.

Reference: h2gcn/models/_metrics.py:8-25 (mask normalized to sum 1, then an
elementwise product and a global reduce-sum).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalized_mask(mask: jax.Array) -> jax.Array:
    m = mask.astype(jnp.float32)
    return m / jnp.sum(m)


def softmax_ce_rows(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-row softmax cross-entropy for (possibly all-zero) one-hot labels.

    ``(Σ_c labels_c)·logZ − Σ_c labels_c·logits_c``: equals the softmax CE
    for one-hot rows and exactly 0 for all-zero label rows (unmasked nodes).
    """
    logz = jax.nn.logsumexp(logits, axis=-1)
    return jnp.sum(labels, axis=-1) * logz - jnp.sum(labels * logits, axis=-1)


def masked_softmax_cross_entropy(
    logits: jax.Array, labels: jax.Array, mask: jax.Array
) -> jax.Array:
    """Mean softmax cross-entropy over the masked nodes (one-hot labels)."""
    return jnp.sum(softmax_ce_rows(logits, labels) * _normalized_mask(mask))


def masked_accuracy(
    logits: jax.Array, labels: jax.Array, mask: jax.Array
) -> jax.Array:
    """Mean argmax accuracy over the masked nodes."""
    correct = (jnp.argmax(logits, axis=1) == jnp.argmax(labels, axis=1)).astype(
        jnp.float32
    )
    return jnp.sum(correct * _normalized_mask(mask))
