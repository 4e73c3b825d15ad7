"""Golden parity against the EXECUTED reference TF1 SpGAT baseline.

tests/golden/ref_gatbase_cora.npz was produced by building the reference
SpGAT (baselines/GAT/models/sp_gat.py over utils/layers.py:53-100 sparse
attention heads) under tf.compat.v1 with seeded init and one eval-mode
forward — workbench/golden_baselines/dump_gat_baseline.py.

Asserts: the reference's initialized conv1d kernels/biases loaded into our
GATNetwork (h2gcn_tpu/models/GAT.py — SDDMM + segment-softmax heads)
reproduce the logits of the full 8+1-head stack, the masked train loss,
the L2 term (l2_coef·Σ½‖θ‖² over all vars), and test accuracy at ~1e-5,
over the same transposed self-looped support the reference feeds
(preprocess_adj_bias, utils/process.py:122-131).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from h2gcn_tpu.models.GAT import GATNetwork
from h2gcn_tpu.nn.metrics import masked_accuracy, masked_softmax_cross_entropy
from h2gcn_tpu.sparse import SparseMatrix

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "ref_gatbase_cora.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip(f"{GOLDEN} not present")
    return np.load(GOLDEN)


def _build(npz):
    hid_units = [int(h) for h in npz["meta/hid_units"]]
    n_heads = [int(h) for h in npz["meta/n_heads"]]
    num_classes = npz["tensors/y_train"].shape[1]
    model = GATNetwork(num_classes, hid_units=hid_units, n_heads=n_heads,
                       in_drop=0.6, attn_drop=0.6,
                       l2_coef=float(npz["meta/l2_coef"]))
    x = jnp.asarray(npz["inputs/features"])
    params = model.init(jax.random.PRNGKey(0), x.shape[1], 1)

    def conv_name(i):
        return "conv1d/kernel:0" if i == 0 else f"conv1d_{i}/kernel:0"

    def conv_bias(i):
        return f"conv1d_{i}/bias:0"

    k = 0  # global head counter: 3 conv1d + 1 BiasAdd per head, in order
    for li, heads in enumerate(params["layers"]):
        for hi, p in enumerate(heads):
            w = npz[f"weights/{conv_name(3 * k)}"][0]  # [1,din,dout]→[din,dout]
            assert p["W"].shape == w.shape, (li, hi, p["W"].shape, w.shape)
            p["W"] = jnp.asarray(w)
            p["a1"] = jnp.asarray(npz[f"weights/{conv_name(3 * k + 1)}"][0][:, 0])
            p["b1"] = jnp.asarray(npz[f"weights/{conv_bias(3 * k + 1)}"][0])
            p["a2"] = jnp.asarray(npz[f"weights/{conv_name(3 * k + 2)}"][0][:, 0])
            p["b2"] = jnp.asarray(npz[f"weights/{conv_bias(3 * k + 2)}"][0])
            bias_name = ("BiasAdd/biases:0" if k == 0
                         else f"BiasAdd_{k}/biases:0")
            p["bias"] = jnp.asarray(npz[f"weights/{bias_name}"])
            k += 1

    idx = npz["inputs/bias/indices"]
    vals = npz["inputs/bias/values"]
    shape = tuple(int(s) for s in npz["inputs/bias/dense_shape"])
    support = sp.coo_matrix((vals, (idx[:, 0], idx[:, 1])),
                            shape=shape).tocsr()
    adj = SparseMatrix.from_scipy(support, backend="segment")
    return model, params, x, adj


def test_forward_matches_reference_tf1(golden):
    model, params, x, adj = _build(golden)
    logits = model.apply(params, adj, x, [], training=False)
    np.testing.assert_allclose(np.asarray(logits), golden["predictions"],
                               rtol=1e-4, atol=1e-5)


def test_loss_l2_accuracy_match_reference_tf1(golden):
    model, params, x, adj = _build(golden)
    logits = model.apply(params, adj, x, [], training=False)

    l2 = model.l2_loss(params)
    np.testing.assert_allclose(np.asarray(l2), golden["golden/l2_loss"],
                               rtol=1e-5)
    train_loss = masked_softmax_cross_entropy(
        logits, jnp.asarray(golden["tensors/y_train"]),
        jnp.asarray(golden["tensors/train_mask"]))
    np.testing.assert_allclose(np.asarray(train_loss),
                               golden["golden/train_loss"], rtol=1e-5)
    acc = masked_accuracy(logits, jnp.asarray(golden["tensors/y_test"]),
                          jnp.asarray(golden["tensors/test_mask"]))
    np.testing.assert_allclose(np.asarray(acc), golden["golden/test_acc"],
                               rtol=0, atol=1e-6)


def test_support_pipeline_matches_reference(golden):
    """Our build_attention_support(nhood=1) reproduces preprocess_adj_bias's
    pattern (self-looped binarized adjacency; the reference feeds its
    transpose, identical for the symmetric planetoid graphs)."""
    from h2gcn_tpu.datasets._dataset import PlanetoidData
    from h2gcn_tpu.models.GAT import build_attention_support

    data_path = "/root/reference/baselines/mixhop/data/planetoid/data"
    if not os.path.exists(os.path.join(data_path, "ind.cora.allx")):
        pytest.skip("planetoid data not present")
    ds = PlanetoidData("ind.cora", data_path, val_size=500)
    ours = build_attention_support(ds, 1).tocsr()
    ours = (ours > 0).astype(np.float32)

    idx = golden["inputs/bias/indices"]
    vals = golden["inputs/bias/values"]
    shape = tuple(int(s) for s in golden["inputs/bias/dense_shape"])
    ref = sp.coo_matrix((vals, (idx[:, 0], idx[:, 1])), shape=shape).tocsr()
    assert abs(ours - ref.T).max() == 0
