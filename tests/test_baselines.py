"""Baseline model family: short end-to-end training sanity on Cora.

Thresholds are deliberately loose (few epochs, CPU) — full-convergence
accuracy parity lives in the experiment configs. Each test exercises the
model's full train/eval jit path through the real CLI entry point.
"""

import pytest

from h2gcn_tpu.run_experiments import main

DATA = "/root/reference/baselines/mixhop/data/planetoid/data"


def _run(tmp_path, argv, epochs):
    return main(argv + [
        "--dataset", "ind.cora", "--dataset_path", DATA,
        "--epochs", str(epochs),
        "--checkpoint_dir", str(tmp_path / "ckpt" / "{model}_{dataset}_{runname}"),
    ])


@pytest.mark.slow
@pytest.mark.parametrize("variant,threshold", [
    ("gcn", 0.70), ("cheby", 0.60), ("concat2", 0.60),
    ("cheby_concat2", 0.60), ("mlp", 0.35),
])
def test_gcn_family(planetoid_path, tmp_path, variant, threshold):
    args = _run(tmp_path, ["GCN", "planetoid", "--variant", variant,
                           "--cheby_eigenvalue", "2"], epochs=60)
    assert float(args.objects["best_val_stats"]["test_accuracy"]) > threshold


@pytest.mark.slow
def test_mixhop(planetoid_path, tmp_path):
    args = _run(tmp_path, ["MIXHOP", "planetoid", "--adj_pows", "0,1,2"],
                epochs=80)
    assert float(args.objects["best_val_stats"]["test_accuracy"]) > 0.60


@pytest.mark.slow
def test_graphsage(planetoid_path, tmp_path):
    args = _run(tmp_path, ["GRAPHSAGE", "planetoid"], epochs=50)
    assert float(args.objects["best_val_stats"]["test_accuracy"]) > 0.60


@pytest.mark.slow
def test_graphsage_jk(planetoid_path, tmp_path):
    args = _run(tmp_path, ["GRAPHSAGE", "planetoid",
                           "--model_class", "SupervisedGraphSageConcat"],
                epochs=50)
    assert float(args.objects["best_val_stats"]["test_accuracy"]) > 0.55


@pytest.mark.slow
def test_gat(planetoid_path, tmp_path):
    args = _run(tmp_path, ["GAT", "planetoid"], epochs=60)
    assert float(args.objects["best_val_stats"]["test_accuracy"]) > 0.55


def test_adjacency_powers_parser():
    from h2gcn_tpu.models.MIXHOP import AdjacencyPowersParser

    p = AdjacencyPowersParser("0,1,2")
    assert p.powers() == [0, 1, 2]
    assert p.output_capacity(7) == 21
    assert p.divide_capacity(0, 60) == [20, 20, 20]

    p2 = AdjacencyPowersParser("0:20:10,1:10:10")
    assert p2.powers() == [0, 1]
    assert p2.output_capacity(7) == 20
    assert p2.divide_capacity(0, 60) == [40, 20]
    assert p2.divide_capacity(1, 60) == [30, 30]
    assert p2.divide_capacity(5, 60) == [30, 30]

    with pytest.raises(ValueError):
        AdjacencyPowersParser("0:5,1")


def test_gat_patience_controller():
    from h2gcn_tpu.models.GAT import GATPatienceController

    c = GATPatienceController(2)
    assert not c(dict(val_acc=0.5, val_loss=1.0))
    assert not c(dict(val_acc=0.4, val_loss=1.1))  # strike 1
    assert not c(dict(val_acc=0.6, val_loss=1.2))  # acc improved → reset
    assert not c(dict(val_acc=0.5, val_loss=1.3))  # strike 1
    assert c(dict(val_acc=0.5, val_loss=1.3))      # strike 2 → stop


def test_segment_softmax():
    import jax.numpy as jnp
    import numpy as np

    from h2gcn_tpu.models.GAT import segment_softmax

    logits = jnp.asarray([1.0, 2.0, 3.0, 0.0, 5.0])
    rows = jnp.asarray([0, 0, 0, 1, 2])
    valid = jnp.asarray([True, True, True, True, False])
    out = np.asarray(segment_softmax(logits, rows, 3, valid))
    e = np.exp([1.0, 2.0, 3.0])
    np.testing.assert_allclose(out[:3], e / e.sum(), rtol=1e-5)
    np.testing.assert_allclose(out[3], 1.0, rtol=1e-6)
    assert out[4] == 0.0
