"""GeomGCN edge-list format loader on synthetic files."""

import numpy as np
import pytest


@pytest.fixture
def geomgcn_dir(tmp_path):
    rng = np.random.RandomState(0)
    n, f, c = 40, 8, 3
    feats = (rng.rand(n, f) > 0.5).astype(int)
    labels = rng.randint(0, c, n)
    with open(tmp_path / "out1_node_feature_label.txt", "w") as fh:
        fh.write("node_id\tfeature\tlabel\n")
        for i in range(n):
            fh.write(f"{i}\t{','.join(map(str, feats[i]))}\t{labels[i]}\n")
    # chain ensures every node appears in the edge file (nodes absent from
    # it are dropped — reference behavior, graph built from edges only)
    edges = {(i, i + 1) for i in range(n - 1)}
    while len(edges) < 100:
        u, v = rng.randint(0, n, 2)
        if u != v:
            edges.add((u, v))
    with open(tmp_path / "out1_graph_edges.txt", "w") as fh:
        fh.write("src\tdst\n")
        for u, v in sorted(edges):
            fh.write(f"{u}\t{v}\n")
    return tmp_path, feats, labels, edges


def test_geomgcn_load(geomgcn_dir):
    from h2gcn_tpu.datasets._dataset import GeomGCNData

    path, feats, labels, edges = geomgcn_dir
    ds = GeomGCNData("toy", str(path))
    assert ds.num_samples == 40
    assert ds.num_labels == labels.max() + 1
    np.testing.assert_allclose(np.asarray(ds.features.todense()), feats)
    np.testing.assert_allclose(np.argmax(ds.y_all, 1), labels)
    A = ds.sparse_adj
    assert (A != A.T).nnz == 0  # symmetrized
    for u, v in list(edges)[:20]:
        assert A[u, v] == 1 and A[v, u] == 1


def test_geomgcn_splits(geomgcn_dir, tmp_path):
    from h2gcn_tpu.datasets._dataset import GeomGCNData

    path, feats, labels, _ = geomgcn_dir
    n = 40
    rng = np.random.RandomState(1)
    perm = rng.permutation(n)
    train = np.zeros(n, bool)
    val = np.zeros(n, bool)
    test = np.zeros(n, bool)
    train[perm[:20]] = True
    val[perm[20:30]] = True
    test[perm[30:]] = True
    split_file = tmp_path / "toy_split_0.6_0.2_0.npz"
    np.savez(split_file, train_mask=train.astype(np.int64),
             val_mask=val.astype(np.int64), test_mask=test.astype(np.int64))

    ds = GeomGCNData("toy", str(path), splits_file_path=str(split_file))
    assert ds.splitted
    np.testing.assert_array_equal(ds.train_mask, train)
    np.testing.assert_array_equal(ds.val_mask, val)
    np.testing.assert_array_equal(ds.test_mask, test)
    assert (ds.y_train.sum(1)[train] == 1).all()
    assert ds.y_train[~train].sum() == 0


def test_geomgcn_training(geomgcn_dir, tmp_path):
    """GeomGCN plugin through the CLI with a stored split."""
    from h2gcn_tpu.run_experiments import main

    path, _, _, _ = geomgcn_dir
    n = 40
    rng = np.random.RandomState(1)
    perm = rng.permutation(n)
    masks = dict(
        train_mask=np.isin(np.arange(n), perm[:20]).astype(np.int64),
        val_mask=np.isin(np.arange(n), perm[20:30]).astype(np.int64),
        test_mask=np.isin(np.arange(n), perm[30:]).astype(np.int64),
    )
    split_file = tmp_path / "split.npz"
    np.savez(split_file, **masks)
    args = main([
        "H2GCN", "geomgcn", "--dataset", "toy", "--dataset_path", str(path),
        "--splits_file_path", str(split_file),
        "--epochs", "5",
        "--checkpoint_dir", str(tmp_path / "ck" / "{model}_{dataset}_{runname}"),
    ])
    best = args.objects["best_val_stats"]
    assert np.isfinite(float(best["val_loss"]))
