"""Golden parity against the EXECUTED reference TF1 MixHop baseline.

tests/golden/ref_mixhopbase_cora.npz was produced by building the reference
MixHopModel (baselines/mixhop/mixhop_model.py) under tf.compat.v1 exactly as
its trainer does — train_cora.sh hyperparameters, sparse_dropout →
to_dense → l2_normalize → mixhop layers + batch_norm + relu → psum output —
via workbench/golden_baselines/dump_mixhop_baseline.py (seeded init, one
eval-mode forward).

Asserts: the reference's initialized kernels loaded into our MixHopNetwork
(h2gcn_tpu/models/MIXHOP.py) reproduce the per-layer activations, psum
logits, label loss, total loss (keras-l2 + psum q-penalty), and test
accuracy at ~1e-5; and that our sym-norm(A+I) support equals the
adjacency the reference built (mixhop_dataset.py:99-116).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from h2gcn_tpu.models.MIXHOP import MixHopNetwork
from h2gcn_tpu.nn.metrics import masked_accuracy, masked_softmax_cross_entropy
from h2gcn_tpu.sparse import SparseMatrix

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "ref_mixhopbase_cora.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip(f"{GOLDEN} not present")
    return np.load(GOLDEN)


def _build(npz):
    powers = [int(p) for p in npz["meta/powers"]]
    capacities = [[int(c) for c in row] for row in npz["meta/capacities"]]
    num_classes = int(npz["meta/num_classes"])
    model = MixHopNetwork(
        powers, capacities, num_classes,
        l2reg=float(npz["meta/l2reg"]),
        input_dropout=0.5, layer_dropout=0.9,
        l2_normalize=True, batch_norm=True, nonlinearity="relu",
        psum_softmax=True,
    )
    x = jnp.asarray(npz["inputs/x_dense"])
    params = model.init(jax.random.PRNGKey(0), x.shape[1], 1)
    for j in range(len(capacities)):
        for p in powers:
            key = f"weights/l{j}_p{p}/dense/kernel:0"
            ref = npz[key]
            assert params["layers"][j][str(p)].shape == ref.shape
            params["layers"][j][str(p)] = jnp.asarray(ref)
    params["bn"][0]["beta"] = jnp.asarray(
        npz["weights/batch_normalization/beta:0"])
    params["psum_q"] = jnp.asarray(npz["weights/psum_q:0"])

    idx = npz["inputs/adj/indices"]
    vals = npz["inputs/adj/values"]
    shape = tuple(int(s) for s in npz["inputs/adj/dense_shape"])
    adj = sp.coo_matrix((vals, (idx[:, 0], idx[:, 1])), shape=shape).tocsr()
    support = SparseMatrix.from_scipy(adj, backend="segment")
    return model, params, x, support


def test_forward_matches_reference_tf1(golden):
    model, params, x, support = _build(golden)
    capture = {}
    logits = model.apply(params, support, x, [support], training=False,
                         capture=capture)
    # ref activation indices: 6 = post bn+relu layer0, 8 = mixhop layer1
    # (no bn/relu on the last layer), 9 = psum logits
    np.testing.assert_allclose(
        np.asarray(capture["activations/0-mixhop"]), golden["activations/6"],
        rtol=1e-5, atol=1e-5, err_msg="layer-0 bn+relu diverges")
    np.testing.assert_allclose(
        np.asarray(capture["activations/1-mixhop"]), golden["activations/8"],
        rtol=1e-5, atol=1e-5, err_msg="layer-1 mixhop diverges")
    np.testing.assert_allclose(np.asarray(logits), golden["activations/9"],
                               rtol=1e-5, atol=1e-5)


def test_loss_and_accuracy_match_reference_tf1(golden):
    model, params, x, support = _build(golden)
    logits = model.apply(params, support, x, [support], training=False)

    n = x.shape[0]
    ally = jnp.asarray(golden["tensors/ally"])
    train_mask = np.zeros(n, bool)
    train_mask[golden["tensors/train_idx"]] = True
    label_loss = masked_softmax_cross_entropy(
        logits, ally, jnp.asarray(train_mask))
    np.testing.assert_allclose(np.asarray(label_loss),
                               golden["golden/label_loss"], rtol=1e-5)
    total = label_loss + model.l2_loss(params)
    np.testing.assert_allclose(np.asarray(total),
                               golden["golden/total_loss"], rtol=1e-5)

    test_mask = np.zeros(n, bool)
    test_mask[golden["tensors/test_idx"]] = True
    acc = masked_accuracy(logits, ally, jnp.asarray(test_mask))
    np.testing.assert_allclose(np.asarray(acc), golden["golden/test_acc"],
                               rtol=0, atol=1e-6)


def test_support_pipeline_matches_reference(golden):
    """Our sym-norm(A+I) transform reproduces the adjacency the reference's
    own dataset reader builds (self-loops added, 1/sqrt(d_i d_j) values)."""
    from h2gcn_tpu.datasets._dataset import PlanetoidData
    from h2gcn_tpu.sparse import transforms
    from h2gcn_tpu.sparse.transforms import NType

    data_path = "/root/reference/baselines/mixhop/data/planetoid/data"
    if not os.path.exists(os.path.join(data_path, "ind.cora.allx")):
        pytest.skip("planetoid data not present")
    ds = PlanetoidData("ind.cora", data_path, val_size=500)
    ours = transforms.normalize(
        transforms.add_eye(ds.sparse_adj), NType.SYM_NORMALIZED).tocsr()

    idx = golden["inputs/adj/indices"]
    vals = golden["inputs/adj/values"]
    shape = tuple(int(s) for s in golden["inputs/adj/dense_shape"])
    ref = sp.coo_matrix((vals, (idx[:, 0], idx[:, 1])), shape=shape).tocsr()
    assert abs(ours - ref).max() < 1e-6


def test_mixhop_partition_matches_reference_reader(golden):
    """PlanetoidData.set_mixhop_partition reproduces the exact train/test
    index sets of the reference reader's get_partition_indices
    (mixhop_dataset.py:184-194) recorded in the golden dump."""
    from h2gcn_tpu.datasets._dataset import PlanetoidData

    data_path = "/root/reference/baselines/mixhop/data/planetoid/data"
    if not os.path.exists(os.path.join(data_path, "ind.cora.allx")):
        pytest.skip("planetoid data not present")
    ds = PlanetoidData("ind.cora", data_path, val_size=500)
    ds.set_mixhop_partition(500)
    np.testing.assert_array_equal(np.where(ds.train_mask)[0],
                                  np.sort(golden["tensors/train_idx"]))
    np.testing.assert_array_equal(np.where(ds.test_mask)[0],
                                  np.sort(golden["tensors/test_idx"]))
    assert not (ds.train_mask & ds.val_mask).any()
    assert not (ds.val_mask & ds.test_mask).any()


def test_training_dynamics_match_reference_tf1(golden):
    """Training-dynamics golden: from the reference's initialized weights,
    N deterministic SGD steps (mixhop_trainer.py:285-289,
    GradientDescentOptimizer at --learn_rate, dropouts off, batch_norm on
    moving stats) reproduce the per-step total-loss sequence — pinning the
    gradient of label CE + keras-L2 + the psum q-penalty — and the final
    weights."""
    if "golden/step_losses" not in golden.files:
        pytest.skip("golden dump predates the dynamics capture")
    import optax

    model, params, x, support = _build(golden)
    n = x.shape[0]
    ally = jnp.asarray(golden["tensors/ally"])
    train_mask = np.zeros(n, bool)
    train_mask[golden["tensors/train_idx"]] = True
    train_mask = jnp.asarray(train_mask)
    tx = optax.sgd(float(golden["meta/lr"]))
    opt_state = tx.init(params)

    def loss_fn(p):
        logits = model.apply(p, support, x, [support], training=False)
        return (masked_softmax_cross_entropy(logits, ally, train_mask)
                + model.l2_loss(p))

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

    powers = [int(p) for p in golden["meta/powers"]]
    for j in range(len(golden["meta/capacities"])):
        for p in powers:
            ref = golden[f"weights_after/l{j}_p{p}/dense/kernel:0"]
            np.testing.assert_allclose(
                np.asarray(params["layers"][j][str(p)]), ref,
                rtol=1e-3, atol=2e-5,
                err_msg=f"post-training kernel l{j}_p{p} diverges")
    np.testing.assert_allclose(
        np.asarray(params["psum_q"]), golden["weights_after/psum_q:0"],
        rtol=1e-3, atol=2e-5)
