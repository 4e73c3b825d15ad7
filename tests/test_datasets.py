"""Planetoid loader invariants (reference _dataset.py loading semantics)."""

import numpy as np
import pytest

from h2gcn_tpu.datasets._dataset import PlanetoidData, graph_dict_to_adj


@pytest.fixture(scope="module")
def cora(planetoid_path):
    return PlanetoidData("ind.cora", planetoid_path, val_size=500)


def test_cora_shapes(cora):
    assert cora.num_samples == 2708
    assert cora.feature_dim == 1433
    assert cora.num_labels == 7
    assert cora.sparse_adj.shape == (2708, 2708)


def test_cora_splits(cora):
    assert cora.train_mask.sum() == 140
    assert cora.val_mask.sum() == 500
    assert cora.test_mask.sum() == 1000
    # canonical planetoid layout: train first, then val directly after
    assert cora.train_mask[:140].all()
    assert cora.val_mask[140:640].all()
    # masks disjoint
    assert not (cora.train_mask & cora.val_mask).any()
    assert not (cora.train_mask & cora.test_mask).any()
    # y_* zero outside masks
    assert cora.y_train[~cora.train_mask].sum() == 0
    assert (cora.y_train.sum(1)[cora.train_mask] == 1).all()


def test_cora_adj_symmetric_binary(cora):
    A = cora.sparse_adj
    assert (A != A.T).nnz == 0
    assert set(np.unique(A.data)) == {1.0}


def test_citeseer_patch(planetoid_path):
    ds = PlanetoidData("ind.citeseer", planetoid_path, val_size=500)
    assert ds.num_samples == 3327
    # citeseer has isolated test nodes: patch marks them non-valid
    assert len(ds._non_valid_samples) > 0
    for n_i in ds._non_valid_samples:
        assert not ds.train_mask[n_i]
        assert not ds.val_mask[n_i]
        assert not ds.test_mask[n_i]
        assert not ds.wild_mask[n_i]
    # labels property returns -1 for unlabeled nodes
    labels = ds.labels
    assert (labels == -1).sum() == (ds.y_all.sum(1) == 0).sum()


def test_graph_dict_to_adj():
    g = {0: [1, 2], 1: [0], 2: [], 3: [3]}
    A = graph_dict_to_adj(g).toarray()
    expect = np.zeros((4, 4), np.float32)
    expect[0, 1] = expect[1, 0] = 1
    expect[0, 2] = expect[2, 0] = 1
    expect[3, 3] = 1  # self-listed node keeps a diagonal 1
    np.testing.assert_allclose(A, expect)


def test_get_tensors_hops(cora):
    cora.reload_data()
    cora.row_normalize_features()
    cora.adj_remove_eye()
    t = cora.get_tensors(get_adj_norm_hops=["1", "2"], backend="segment")
    assert len(t.adj_hops) == 2
    a1 = t.adj_hops[0].to_scipy()
    a2 = t.adj_hops[1].to_scipy()
    # hop-1 is sym-normalized self-loop-free adjacency: diag == 0
    assert a1.diagonal().sum() == 0
    assert a2.diagonal().sum() == 0
    # exact-2-hop shares no edges with 1-hop
    assert (a1.multiply(a2)).nnz == 0
    # features row-normalized
    f = np.asarray(t.features)
    sums = f.sum(1)
    assert np.allclose(sums[sums > 0.01], 1.0, atol=1e-5)


def test_feature_configs(cora):
    cora.reload_data()
    n = cora.num_samples
    cora.set_identity_features()
    assert cora.features.shape == (n, n)
    assert cora.features.diagonal().sum() == n
    cora.reload_data()
    cora.set_label_one_hot_features()
    feats = np.asarray(cora.features.todense())
    assert feats[cora.train_mask].sum() == cora.train_mask.sum()
    assert feats[~cora.train_mask].sum() == 0
    cora.reload_data()


def test_hop_saturation_pads_empty_matrices():
    import scipy.sparse as sp

    from h2gcn_tpu.datasets._dataset import PlanetoidData

    # complete graph: reachability saturates at hop 1, so exact-2-hop is empty
    class _Tiny(PlanetoidData):
        def __init__(self):
            self._sparse_data = {}
            self._dense_data = {}
            n = 5
            A = sp.csr_matrix(np.ones((n, n), np.float32)
                              - np.eye(n, dtype=np.float32))
            self._sparse_data["sparse_adj"] = A
            self._sparse_data["features"] = sp.eye(n, format="csr")
            self._dense_data["y_all"] = np.eye(n)[:, :2]
            for s in ("train", "val", "test", "wild"):
                self._dense_data[f"{s}_mask"] = np.zeros(n, bool)
                self._dense_data[f"y_{s}"] = np.zeros((n, 2))
            self._preprocessed_adj = None
            self._preprocessed_feature = None

    ds = _Tiny()
    t = ds.get_tensors(get_adj_norm_hops=["1", "2"], backend="segment")
    assert len(t.adj_hops) == 2
    assert t.adj_hops[1].nnz == 0  # exact-2-hop is empty, not a crash


def test_sample_masks_and_splits(cora):
    cora.reload_data()
    order = cora.sort_label_by_size()
    counts = np.asarray(cora.label_count)
    assert (np.diff(counts[order]) <= 0).all()
    assert cora.feature_sample_eligible([100, 100])
    assert not cora.feature_sample_eligible([5000])
    m = cora.get_sample_mask([0], "train")
    assert m.sum() == cora.y_train[:, 0].sum()
    cora.split_training_set(2)
    total = cora.train_mask_splits.sum()
    assert total == cora.train_mask.sum()
    assert not (cora.train_mask_splits[0] & cora.train_mask_splits[1]).any()


def test_get_tensors_reorder_consistency(cora):
    """--reorder permutes every exported tensor by ONE node permutation:
    the reordered export is exactly the natural export re-indexed, so all
    training math is invariant (layout-only optimization)."""
    cora.reload_data()
    cora.row_normalize_features()
    cora.adj_remove_eye()
    nat = cora.get_tensors(get_adj_norm_hops=["1", "2"], backend="segment")
    cora.reload_data()
    cora.row_normalize_features()
    cora.adj_remove_eye()
    t = cora.get_tensors(get_adj_norm_hops=["1", "2"], backend="segment",
                         reorder="cluster")
    perm = t.node_perm
    n = cora.num_samples
    assert sorted(perm.tolist()) == list(range(n))
    assert np.array_equal(np.asarray(t.features),
                          np.asarray(nat.features)[perm])
    assert np.array_equal(np.asarray(t.labels), np.asarray(nat.labels)[perm])
    assert np.array_equal(np.asarray(t.train_mask),
                          np.asarray(nat.train_mask)[perm])
    assert np.array_equal(np.asarray(t.y_test),
                          np.asarray(nat.y_test)[perm])
    for hp, hn in zip(t.adj_hops, nat.adj_hops):
        want = hn.to_scipy()[perm][:, perm]
        assert abs(hp.to_scipy() - want).max() < 1e-6


def test_reorder_eval_logits_match_natural(cora):
    """Eval logits under --reorder are the natural logits re-indexed (same
    params; dense layers are node-order-equivariant, SpMM commutes with
    P·Pᵀ)."""
    import jax

    from h2gcn_tpu import nn as h2nn

    cora.reload_data()
    cora.row_normalize_features()
    cora.adj_remove_eye()
    nat = cora.get_tensors(get_adj_norm_hops=["1", "2"], backend="segment")
    cora.reload_data()
    cora.row_normalize_features()
    cora.adj_remove_eye()
    t = cora.get_tensors(get_adj_norm_hops=["1", "2"], backend="segment",
                         reorder="cluster")
    setups = h2nn.parse_network_setup(
        "M64-R-T1-G-V-C1-D0.5-MO", cora.num_labels,
        _dense_units=64, _dropout_rate=0.5)
    model = h2nn.NetworkModel(setups)
    params = model.init(jax.random.PRNGKey(0), cora.feature_dim, 2)
    log_nat = np.asarray(model.apply(
        params, nat.adj, nat.features, nat.adj_hops, training=False))
    log_per = np.asarray(model.apply(
        params, t.adj, t.features, t.adj_hops, training=False))
    assert np.allclose(log_per, log_nat[t.node_perm], atol=1e-5)
