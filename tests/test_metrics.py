"""Masked metrics vs explicit numpy oracles (reference _metrics.py semantics)."""

import jax.numpy as jnp
import numpy as np
from scipy.special import log_softmax

from h2gcn_tpu.nn import masked_accuracy, masked_softmax_cross_entropy


def test_masked_ce():
    rng = np.random.default_rng(0)
    n, c = 40, 5
    logits = rng.standard_normal((n, c)).astype(np.float32)
    labels = np.zeros((n, c), np.float32)
    lab = rng.integers(0, c, n)
    mask = rng.random(n) < 0.4
    labels[np.arange(n)[mask], lab[mask]] = 1  # unmasked rows stay all-zero

    got = float(
        masked_softmax_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)
        )
    )
    per = -log_softmax(logits, axis=1)[np.arange(n), lab]
    want = per[mask].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_ce_zero_label_rows_contribute_zero():
    logits = np.array([[5.0, -2.0], [1.0, 1.0]], np.float32)
    labels = np.array([[1.0, 0.0], [0.0, 0.0]], np.float32)
    mask = np.array([True, True])
    got = float(
        masked_softmax_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)
        )
    )
    per0 = -log_softmax(logits[0])[0]
    np.testing.assert_allclose(got, per0 / 2, rtol=1e-3, atol=1e-6)


def test_masked_accuracy():
    logits = np.array([[2.0, 1.0], [0.0, 3.0], [1.0, 0.0]], np.float32)
    labels = np.array([[1, 0], [1, 0], [0, 1]], np.float32)
    mask = np.array([True, True, False])
    got = float(
        masked_accuracy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, 0.5)
