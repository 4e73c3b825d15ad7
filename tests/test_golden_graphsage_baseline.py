"""Golden parity against the EXECUTED reference PyTorch GraphSAGE.

tests/golden/ref_sagebase_*.npz were produced by running the reference
model (baselines/graphsage-simple/graphsage/{model,encoders,aggregators}.py
on the baked-in torch) with ``num_samples=None`` — the reference's own
deterministic full-neighbor mean mode — via
workbench/golden_baselines/dump_graphsage_baseline.py.

Asserts: the reference's xavier-init encoder/scorer weights loaded into our
GraphSAGENetwork (h2gcn_tpu/models/GRAPHSAGE.py, padded-ELL full-neighbor
path) reproduce the full-graph logits, train CE loss, and test accuracy at
~1e-5 for both the plain and the Concat(+JK) variants.  Weight orientation:
the reference applies ``W·concat(self,neigh)ᵀ`` (encoders.py:50) — ours is
the transpose.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from h2gcn_tpu.models.GRAPHSAGE import (ELLGraph, GraphSAGENetwork,
                                        build_neighbor_table)
from h2gcn_tpu.nn.metrics import masked_accuracy, masked_softmax_cross_entropy

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    "plain": ("ref_sagebase_plain_cora.npz", False),
    "concat": ("ref_sagebase_concat_cora.npz", True),
}


def _build(case):
    path = os.path.join(GOLDEN_DIR, CASES[case][0])
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    npz = np.load(path)
    concat_jk = CASES[case][1]
    num_classes = npz["weights/scorer"].shape[0]
    model = GraphSAGENetwork(num_classes, hid_units=int(npz["meta/hid_units"]),
                             num_samples=(0, 0),  # full-neighbor mean
                             concat_jk=concat_jk)
    params = {
        "W1": jnp.asarray(npz["weights/enc1"].T),
        "W2": jnp.asarray(npz["weights/enc2"].T),
        "Wout": jnp.asarray(npz["weights/scorer"].T),
    }
    adj = sp.csr_matrix(
        (np.ones(npz["inputs/adj/indices"].size, np.float32),
         npz["inputs/adj/indices"], npz["inputs/adj/indptr"]),
        shape=tuple(npz["inputs/adj/shape"]))
    table, valid = build_neighbor_table(adj)
    ell = ELLGraph(table=table, valid=valid, nnz=int(adj.nnz))
    x = jnp.asarray(npz["inputs/features"])
    return npz, model, params, x, ell


@pytest.mark.parametrize("case", sorted(CASES))
def test_forward_matches_reference_torch(case):
    npz, model, params, x, ell = _build(case)
    logits = model.apply(params, ell, x, [], training=False)
    np.testing.assert_allclose(np.asarray(logits), npz["predictions"],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("case", sorted(CASES))
def test_loss_and_accuracy_match_reference_torch(case):
    npz, model, params, x, ell = _build(case)
    logits = model.apply(params, ell, x, [], training=False)

    labels = npz["tensors/labels"]
    onehot = np.eye(int(labels.max()) + 1, dtype=np.float32)[labels]
    train_loss = masked_softmax_cross_entropy(
        logits, jnp.asarray(onehot), jnp.asarray(npz["tensors/train_mask"]))
    np.testing.assert_allclose(np.asarray(train_loss),
                               npz["golden/train_loss"], rtol=1e-5)
    acc = masked_accuracy(logits, jnp.asarray(onehot),
                          jnp.asarray(npz["tensors/test_mask"]))
    np.testing.assert_allclose(np.asarray(acc), npz["golden/test_acc"],
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("case", sorted(CASES))
def test_hidden_layer_matches_reference_torch(case):
    """PER-LAYER golden: encoder-1's post-ReLU embeddings reproduce the
    reference's enc1 output (encoders.py:31-51, full-neighbor mean)."""
    npz, model, params, x, ell = _build(case)
    if "golden/layer1" not in npz.files:
        pytest.skip("golden dump predates the per-layer capture")
    cap = {}
    model.apply(params, ell, x, [], training=False, capture=cap)
    ours = cap["activations/0-enc1"]
    np.testing.assert_allclose(np.asarray(ours), npz["golden/layer1"],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("case", sorted(CASES))
def test_training_dynamics_match_reference_torch(case):
    """Training-dynamics golden: from the reference's xavier-init weights,
    N full-train-batch SGD steps (model.py:142-152, lr 0.7) reproduce the
    reference's per-step CE-loss sequence and final weights."""
    npz, model, params, x, ell = _build(case)
    if "golden/step_losses" not in npz.files:
        pytest.skip("golden dump predates the dynamics capture")
    import jax
    import optax

    labels = npz["tensors/labels"]
    onehot = jnp.asarray(
        np.eye(int(labels.max()) + 1, dtype=np.float32)[labels])
    train_mask = jnp.asarray(npz["tensors/train_mask"])
    tx = optax.sgd(float(npz["meta/lr"]))
    opt_state = tx.init(params)

    def loss_fn(p):
        logits = model.apply(p, ell, x, [], training=False)
        # the reference loss is plain CrossEntropyLoss over the batch —
        # no L2 (model.py:96-99)
        return masked_softmax_cross_entropy(logits, onehot, train_mask)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(len(npz["golden/step_losses"])):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    np.testing.assert_allclose(losses, npz["golden/step_losses"],
                               rtol=1e-4, atol=1e-5)
    for ours_key, ref_key in (("W1", "enc1"), ("W2", "enc2"),
                              ("Wout", "scorer")):
        np.testing.assert_allclose(
            np.asarray(params[ours_key]), npz[f"weights_after/{ref_key}"].T,
            rtol=1e-3, atol=2e-5,
            err_msg=f"post-training weight {ref_key} diverges")


def test_full_neighbor_spmm_route_matches_ell():
    """Full-neighbor mean through the SpMM ladder (mean_adj attached) ==
    the ELL-gather full-neighbor mean, for both aggregators — the
    round-5 fix that makes full-neighbor feasible on skewed graphs (the
    ELL formulation wants an [N·Dmax, F] gather, 256GB at 120K/dmax=4165,
    docs/bench_graphsage.json)."""
    import jax

    from h2gcn_tpu.models.GRAPHSAGE import build_mean_adjacencies

    rng = np.random.default_rng(0)
    n, f = 150, 24
    A = sp.random(n, n, density=0.05, random_state=1, format="csr")
    A = ((A + A.T) > 0).astype(np.float32)
    A = A.tolil()
    A[10, :] = 0  # zero-degree row: mean of nothing must stay 0
    A[:, 10] = 0
    A = A.tocsr()
    A.eliminate_zeros()
    table, valid = build_neighbor_table(A)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    for gcn in (False, True):
        model = GraphSAGENetwork(5, num_samples=(0, 0),
                                 gcn_aggregator=gcn)
        ell_plain = ELLGraph(table=table, valid=valid, nnz=int(A.nnz))
        ell_spmm = ELLGraph(
            table=table, valid=valid, nnz=int(A.nnz),
            mean_adj=build_mean_adjacencies(A, gcn=False),
            mean_adj_gcn=build_mean_adjacencies(A, gcn=True))
        ref = model._sampled_mean(ell_plain, x, key, 0)
        got = model._sampled_mean(ell_spmm, x, key, 0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"gcn={gcn}")
        # the full apply agrees end to end
        params = model.init(jax.random.PRNGKey(1), f)
        o1 = model.apply(params, ell_plain, x, [], rng=key)
        o2 = model.apply(params, ell_spmm, x, [], rng=key)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                   rtol=1e-5, atol=1e-5)
