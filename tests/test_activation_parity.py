"""Full-pipeline activation parity on real Cora (BASELINE.md criterion).

An INDEPENDENT numpy/scipy implementation of the reference's entire
preprocessing + H2GCN-2 forward semantics (written from
h2gcn/datasets/_dataset.py + models/H2GCN.py math, not from this
framework's code) must match this framework's loader + jitted model
activations layer-by-layer at allclose tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from h2gcn_tpu.datasets._dataset import PlanetoidData
from h2gcn_tpu.nn import NetworkModel, parse_network_setup


@pytest.fixture(scope="module")
def cora_pipeline(planetoid_path):
    ds = PlanetoidData("ind.cora", planetoid_path, val_size=500)
    ds.row_normalize_features()
    ds.adj_remove_eye()
    tensors = ds.get_tensors(get_adj_norm_hops=["1", "2"], backend="segment")
    return ds, tensors


def _numpy_reference(planetoid_path):
    """Independent numpy pipeline: raw pickles → hop matrices → forward."""
    import pickle

    names = ["x", "y", "tx", "ty", "allx", "ally", "graph"]
    objs = {}
    for n in names:
        with open(f"{planetoid_path}/ind.cora.{n}", "rb") as f:
            objs[n] = pickle.load(f, encoding="latin1")
    test_idx = sorted(
        int(line) for line in open(f"{planetoid_path}/ind.cora.test.index")
    )
    feats = sp.vstack((objs["allx"], objs["tx"])).tolil()
    # cora's test index is already contiguous-sorted; reorder rows
    reorder = [int(line) for line in open(f"{planetoid_path}/ind.cora.test.index")]
    feats[reorder, :] = feats[test_idx, :]
    feats = np.asarray(feats.todense(), dtype=np.float64)

    n = feats.shape[0]
    A = np.zeros((n, n), dtype=np.float64)
    for u, nbrs in objs["graph"].items():
        for v in nbrs:
            A[u, v] = 1.0
            A[v, u] = 1.0

    # row normalize features; remove diagonal
    rs = feats.sum(1)
    feats = np.where(rs[:, None] > 0, feats / np.maximum(rs[:, None], 1e-30), 0)
    np.fill_diagonal(A, 0.0)

    # exact hop split + sym normalization
    AI = A + np.eye(n)
    r1 = (AI > 0).astype(float)
    r2 = ((AI @ AI) > 0).astype(float)
    a1 = r1 - np.eye(n)
    a2 = r2 - r1

    def sym_norm(m):
        d = m.sum(1)
        dh = np.where(d > 0, d ** -0.5, 0.0)
        return dh[:, None] * m * dh[None, :]

    return feats, sym_norm(a1), sym_norm(a2)


def test_cora_h2gcn2_activations_allclose(planetoid_path, cora_pipeline):
    ds, tensors = cora_pipeline
    conf = parse_network_setup(
        "M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO", ds.num_labels,
        _dense_units=64, _dropout_rate=0.5,
    )
    model = NetworkModel(conf, l2_regularize_weight=5e-4)
    params = model.init(jax.random.PRNGKey(0), ds.feature_dim, 2)

    capture = {}
    out = jax.jit(
        lambda p, x, hops: model.apply(p, hops[0], x, hops)
    )(params, tensors.features, list(tensors.adj_hops))
    model.apply(params, tensors.adj_hops[0], tensors.features,
                tensors.adj_hops, capture=capture)

    feats, a1, a2 = _numpy_reference(planetoid_path)
    # pipeline-level parity: loader tensors match the independent pipeline
    np.testing.assert_allclose(np.asarray(tensors.features), feats,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        tensors.adj_hops[0].to_scipy().toarray(), a1, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        tensors.adj_hops[1].to_scipy().toarray(), a2, rtol=1e-5, atol=1e-6
    )

    # forward parity, layer by layer
    W0 = np.asarray(params[0]["kernel"], dtype=np.float64)
    WO = np.asarray(params[9]["kernel"], dtype=np.float64)
    h = np.maximum(feats @ W0, 0)
    np.testing.assert_allclose(np.asarray(capture["activations/1-relu"]), h,
                               rtol=2e-4, atol=2e-5)
    r1 = np.concatenate([a1 @ h, a2 @ h], axis=1)
    np.testing.assert_allclose(
        np.asarray(capture["activations/3-flatten"]), r1, rtol=2e-4, atol=2e-4
    )
    r2 = np.concatenate([a1 @ r1, a2 @ r1], axis=1)
    np.testing.assert_allclose(
        np.asarray(capture["activations/5-flatten"]), r2, rtol=2e-3, atol=2e-3
    )
    logits = np.concatenate([r2, h, r1], axis=1) @ WO
    np.testing.assert_allclose(np.asarray(out), logits, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(capture["activations/9-dense"]),
                               np.asarray(out), rtol=1e-5, atol=1e-6)
