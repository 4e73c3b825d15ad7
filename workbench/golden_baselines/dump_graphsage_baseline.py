"""Dump golden artifacts from the EXECUTED reference PyTorch GraphSAGE.

Builds the reference SupervisedGraphSage / SupervisedGraphSageConcat exactly
as model.py:88-127 does (MeanAggregator + 2 Encoders, hid 128), with
``num_samples=None`` so aggregation is the deterministic full-neighbor mean
("No sampling if None", aggregators.py:33-42) — making per-layer activations
comparable across frameworks without RNG coupling.  Records the xavier-init
weights, full-graph logits, train CE loss, test accuracy, raw features, and
the neighbor lists as CSR.

Consumed by tests/test_golden_graphsage_baseline.py.

Usage:
    python dump_graphsage_baseline.py --model_class SupervisedGraphSage \
        --out ../../tests/golden/ref_sagebase_plain_cora.npz
"""
import argparse
import os
import sys

GS_DIR = "/root/reference/baselines/graphsage-simple/graphsage"
SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shim")
DEFAULT_DATA = "/root/reference/baselines/mixhop/data/planetoid/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_class", default="SupervisedGraphSage",
                    choices=["SupervisedGraphSage", "SupervisedGraphSageConcat"])
    ap.add_argument("--dataset", default="ind.cora")
    ap.add_argument("--dataset_path", default=DEFAULT_DATA)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--hid_units", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.7,
                    help="reference run_cora SGD lr (model.py:142)")
    ap.add_argument("--dyn_steps", type=int, default=10,
                    help="deterministic full-train-batch SGD steps to "
                         "record for the training-dynamics golden")
    ap.add_argument("--out", required=True)
    opts = ap.parse_args()

    import numpy as np
    import torch
    import torch.nn as nn
    from torch.nn import init

    torch.manual_seed(opts.seed)

    # py3.12: restore py3.8 random.sample(set) semantics the reference uses
    import random as _random
    _orig_sample = _random.sample

    def _compat_sample(population, k, **kw):
        if isinstance(population, (set, frozenset)):
            population = tuple(population)
        return _orig_sample(population, k, **kw)

    _random.sample = _compat_sample

    sys.path.insert(0, SHIM_DIR)
    sys.path.insert(0, GS_DIR)
    import dataset as ds_mod
    from aggregators import MeanAggregator
    from encoders import Encoder
    import model as ref_model

    cora = ds_mod.PlanetoidData(opts.dataset, opts.dataset_path, val_size=500)
    feat_data = cora.features.toarray().astype(np.float32)
    labels = cora.labels
    adj_lists = cora.dos_graph
    n, f = feat_data.shape

    features = nn.Embedding(n, f)
    features.weight = nn.Parameter(torch.FloatTensor(feat_data),
                                   requires_grad=False)
    agg1 = MeanAggregator(features, cuda=False, gcn=False)
    enc1 = Encoder(features, f, opts.hid_units, adj_lists, agg1, gcn=False,
                   cuda=False)
    agg2 = MeanAggregator(lambda nodes: enc1(nodes).t(), cuda=False,
                          gcn=False)
    enc2 = Encoder(lambda nodes: enc1(nodes).t(), enc1.embed_dim,
                   opts.hid_units, adj_lists, agg2, base_model=enc1,
                   gcn=False, cuda=False)
    enc1.num_samples = None  # full-neighbor deterministic mean
    enc2.num_samples = None
    enc1.num_sample = None
    enc2.num_sample = None

    cls = getattr(ref_model, opts.model_class)
    if opts.model_class == "SupervisedGraphSageConcat":
        graphsage = cls(7 if "cora" in opts.dataset else labels.max() + 1,
                        enc1, enc2)
    else:
        graphsage = cls(int(labels.max()) + 1, enc2)

    all_nodes = list(range(n))
    with torch.no_grad():
        logits = graphsage.forward(all_nodes).numpy()
        layer1 = enc1(all_nodes).t().numpy()  # [n, hid] post-ReLU
        train_nodes = np.where(cora.train_mask)[0]
        loss = graphsage.loss(
            list(train_nodes),
            torch.LongTensor(labels[train_nodes])).item()
    test_nodes = np.where(cora.test_mask)[0]
    test_acc = float(np.mean(logits[test_nodes].argmax(1)
                             == labels[test_nodes]))

    adj_csr = cora.sparse_adj.tocsr()

    # record the INITIAL weights before the dynamics run mutates them
    w_init = {
        "weights/enc1": enc1.weight.detach().numpy().copy(),
        "weights/enc2": enc2.weight.detach().numpy().copy(),
        "weights/scorer": graphsage.weight.detach().numpy().copy(),
    }

    # --- training dynamics: the reference's SGD step (model.py:142-152)
    # on the FULL train-node batch each step (deterministic — the real run
    # samples 256-node batches; full batch removes the RNG coupling)
    optimizer = torch.optim.SGD(
        filter(lambda p: p.requires_grad, graphsage.parameters()),
        lr=opts.lr)
    batch = list(train_nodes)
    batch_labels = torch.LongTensor(labels[train_nodes])
    step_losses = []
    for _ in range(opts.dyn_steps):
        optimizer.zero_grad()
        step_loss = graphsage.loss(batch, batch_labels)
        step_loss.backward()
        optimizer.step()
        step_losses.append(step_loss.item())

    out = {
        "meta/model_class": opts.model_class,
        "meta/hid_units": opts.hid_units,
        "meta/lr": opts.lr,
        **w_init,
        "weights_after/enc1": enc1.weight.detach().numpy(),
        "weights_after/enc2": enc2.weight.detach().numpy(),
        "weights_after/scorer": graphsage.weight.detach().numpy(),
        "golden/step_losses": np.asarray(step_losses),
        "golden/layer1": layer1,
        "predictions": logits,
        "golden/train_loss": loss,
        "golden/test_acc": test_acc,
        "inputs/features": feat_data,
        "inputs/adj/indptr": adj_csr.indptr,
        "inputs/adj/indices": adj_csr.indices,
        "inputs/adj/shape": np.asarray(adj_csr.shape),
        "tensors/labels": labels,
        "tensors/train_mask": cora.train_mask,
        "tensors/test_mask": cora.test_mask,
    }
    os.makedirs(os.path.dirname(os.path.abspath(opts.out)), exist_ok=True)
    np.savez_compressed(opts.out, **out)
    print(f"wrote {opts.out}: train_loss={loss:.6f} test_acc={test_acc:.4f}")


if __name__ == "__main__":
    main()
