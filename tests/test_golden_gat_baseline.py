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


def _weight_map(params):
    """(param_path, reference variable name) pairs in reference var order:
    3 conv1d + 1 BiasAdd per attention head."""
    def conv_name(i):
        return "conv1d/kernel:0" if i == 0 else f"conv1d_{i}/kernel:0"

    def conv_bias(i):
        return f"conv1d_{i}/bias:0"

    pairs = []
    k = 0  # global head counter
    for li, heads in enumerate(params["layers"]):
        for hi, _ in enumerate(heads):
            pairs.append(((li, hi, "W"), conv_name(3 * k), "kernel"))
            pairs.append(((li, hi, "a1"), conv_name(3 * k + 1), "a"))
            pairs.append(((li, hi, "b1"), conv_bias(3 * k + 1), "b"))
            pairs.append(((li, hi, "a2"), conv_name(3 * k + 2), "a"))
            pairs.append(((li, hi, "b2"), conv_bias(3 * k + 2), "b"))
            bias_name = ("BiasAdd/biases:0" if k == 0
                         else f"BiasAdd_{k}/biases:0")
            pairs.append(((li, hi, "bias"), bias_name, "bias"))
            k += 1
    return pairs


def _ref_weight(npz, prefix, name, kind):
    w = npz[f"{prefix}/{name}"]
    if kind == "kernel":
        return w[0]            # [1,din,dout] → [din,dout]
    if kind == "a":
        return w[0][:, 0]      # [1,dout,1] → [dout]
    if kind == "b":
        return w[0]            # [1] → scalar-ish, broadcastable
    return w                   # bias


def _build(npz):
    hid_units = [int(h) for h in npz["meta/hid_units"]]
    n_heads = [int(h) for h in npz["meta/n_heads"]]
    num_classes = npz["tensors/y_train"].shape[1]
    model = GATNetwork(num_classes, hid_units=hid_units, n_heads=n_heads,
                       in_drop=0.6, attn_drop=0.6,
                       l2_coef=float(npz["meta/l2_coef"]))
    x = jnp.asarray(npz["inputs/features"])
    params = model.init(jax.random.PRNGKey(0), x.shape[1], 1)

    for (li, hi, key), name, kind in _weight_map(params):
        w = _ref_weight(npz, "weights", name, kind)
        p = params["layers"][li][hi]
        if key == "W":
            assert p["W"].shape == w.shape, (li, hi, p["W"].shape, w.shape)
        p[key] = jnp.asarray(w)

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


def test_hidden_layer_matches_reference_tf1(golden):
    """PER-LAYER golden (not just logits): layer 1's 8-head post-ELU concat
    reproduces the reference's h_1 tensor (sp_gat.py inference hidden)."""
    if "golden/layer1" not in golden.files:
        pytest.skip("golden dump predates the per-layer capture")
    model, params, x, adj = _build(golden)
    cap = {}
    model.apply(params, adj, x, [], training=False, capture=cap)
    ours = cap["activations/0-gat"]
    np.testing.assert_allclose(np.asarray(ours), golden["golden/layer1"],
                               rtol=1e-4, atol=1e-5)


def test_training_dynamics_match_reference_tf1(golden):
    """Training-dynamics golden: from the reference's initialized weights,
    N dropout-free TF1-Adam steps (base_gattn.py:20-26 — Adam eps 1e-8 on
    loss + L2) reproduce the reference's per-step total-loss sequence and
    final weights."""
    if "golden/step_losses" not in golden.files:
        pytest.skip("golden dump predates the dynamics capture")
    import optax

    from h2gcn_tpu.models._runtime import _keras_adam

    model, params, x, adj = _build(golden)
    y_train = jnp.asarray(golden["tensors/y_train"])
    train_mask = jnp.asarray(golden["tensors/train_mask"])
    # TF1 AdamOptimizer folds the bias corrections into the step size
    # exactly like keras; only the default epsilon differs (1e-8 vs 1e-7)
    tx = _keras_adam(float(golden["meta/lr"]), eps=1e-8)
    opt_state = tx.init(params)

    def loss_fn(p):
        logits = model.apply(p, adj, x, [], training=False)
        return model.loss(p, logits, y_train, train_mask)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(len(golden["golden/step_losses"])):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    np.testing.assert_allclose(losses, golden["golden/step_losses"],
                               rtol=1e-4, atol=1e-5)

    for (li, hi, key), name, kind in _weight_map(params):
        ref = _ref_weight(golden, "weights_after", name, kind)
        np.testing.assert_allclose(
            np.asarray(params["layers"][li][hi][key]), ref,
            rtol=1e-3, atol=2e-5,
            err_msg=f"post-training weight {name} diverges")
