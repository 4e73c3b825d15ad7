"""Dump golden artifacts from the EXECUTED reference TF1 GCN baseline.

Builds the reference model (baselines/gcn/gcn/models.py — GCN / MLP /
GCNConcat2, layers.py GraphConvolution/Dense) in tf.compat.v1 graph mode
with seeded initialization, runs one eval-mode forward (dropout 0), and
records per-layer weights (by layer index + var name), the reference's own
``model.activations`` list, the exact preprocessed inputs (features tuple,
support matrices), and loss/accuracy values.

Consumed by tests/test_golden_gcn_baseline.py, which loads the weights into
our GCN layer programs (h2gcn_tpu/models/GCN.py) and asserts per-layer
allclose — extending the executed-reference golden mechanism from H2GCN to
the baseline family.

Usage:
    python dump_gcn_baseline.py --model gcn --dataset ind.cora \
        --out ../../tests/golden/ref_gcnbase_gcn_cora.npz
"""
import argparse
import os
import sys

GCN_DIR = "/root/reference/baselines/gcn/gcn"
SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shim")
DEFAULT_DATA = "/root/reference/baselines/mixhop/data/planetoid/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gcn",
                    choices=["gcn", "gcn_cheby", "dense", "gcn_concat_2",
                             "gcn_cheby_concat_2"])
    ap.add_argument("--dataset", default="ind.cora")
    ap.add_argument("--dataset_path", default=DEFAULT_DATA)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--hidden1", type=int, default=16)
    ap.add_argument("--max_degree", type=int, default=3)
    ap.add_argument("--eigenvalue", type=int, default=-1)
    ap.add_argument("--train_steps", type=int, default=0,
                    help="also run N reference train steps with dropout 0 "
                         "and record per-step train losses (pins the CE "
                         "gradient, first-layer weight decay, and "
                         "tf.train.AdamOptimizer dynamics)")
    ap.add_argument("--out", required=True)
    opts = ap.parse_args()

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

    import numpy as np
    import tensorflow.compat.v1 as tf1

    tf1.disable_eager_execution()
    sys.modules["tensorflow"] = tf1

    flags = tf1.app.flags
    flags.DEFINE_string("dataset", opts.dataset, "")
    flags.DEFINE_string("dataset_path", opts.dataset_path, "")
    flags.DEFINE_string("model", opts.model, "")
    flags.DEFINE_float("learning_rate", 0.01, "")
    flags.DEFINE_integer("epochs", 0, "")
    flags.DEFINE_integer("hidden1", opts.hidden1, "")
    flags.DEFINE_float("dropout", 0.5, "")
    flags.DEFINE_float("weight_decay", 5e-4, "")
    flags.DEFINE_integer("early_stopping", 10, "")
    flags.DEFINE_integer("max_degree", opts.max_degree, "")
    flags.DEFINE_integer("random_seed", opts.seed, "")
    flags.DEFINE_integer("val_size", 500, "")
    flags.DEFINE_bool("_feature_normalize", True, "")
    flags.DEFINE_integer("eigenvalue", opts.eigenvalue, "")
    flags.FLAGS(["dump.py"])

    sys.path.insert(0, SHIM_DIR)
    sys.path.insert(0, GCN_DIR)

    import dataset as _shim  # noqa: F401 — installs the scipy eigsh path
    from utils import (PlanetoidData, preprocess_features, preprocess_adj,
                       chebyshev_polynomials, construct_feed_dict)
    from models import GCN, MLP, GCNConcat2

    np.random.seed(opts.seed)
    tf1.set_random_seed(opts.seed)

    ds = PlanetoidData(opts.dataset, opts.dataset_path, val_size=500)
    (adj, features, y_train, y_val, y_test,
     train_mask, val_mask, test_mask) = ds.load_data_result

    features = preprocess_features(features)
    if opts.model in ("gcn_cheby", "gcn_cheby_concat_2"):
        if opts.eigenvalue >= 0:
            support = chebyshev_polynomials(adj, opts.max_degree,
                                            opts.eigenvalue)
        else:
            support = chebyshev_polynomials(adj, opts.max_degree)
    else:
        support = [preprocess_adj(adj)]

    model_func = {"gcn": GCN, "gcn_cheby": GCN, "dense": MLP,
                  "gcn_concat_2": GCNConcat2,
                  "gcn_cheby_concat_2": GCNConcat2}[opts.model]

    placeholders = {
        "support": [tf1.sparse_placeholder(tf1.float32)
                    for _ in range(len(support))],
        "features": tf1.sparse_placeholder(
            tf1.float32, shape=tf1.constant(features[2], dtype=tf1.int64)),
        "labels": tf1.placeholder(tf1.float32,
                                  shape=(None, y_train.shape[1])),
        "labels_mask": tf1.placeholder(tf1.int32),
        "dropout": tf1.placeholder_with_default(0., shape=()),
        "num_features_nonzero": tf1.placeholder(tf1.int32),
    }
    model = model_func(placeholders, input_dim=features[2][1], logging=False)

    sess = tf1.Session()
    sess.run(tf1.global_variables_initializer())

    out = {
        "meta/model": opts.model,
        "meta/hidden1": opts.hidden1,
        "meta/weight_decay": 5e-4,
        "meta/num_supports": len(support),
    }

    # weights by (layer index in model.layers, var key)
    for i, layer in enumerate(model.layers):
        for key, var in layer.vars.items():
            out[f"weights/{i}/{key}"] = sess.run(var)

    feed = construct_feed_dict(features, support, y_train, train_mask,
                               placeholders)
    dense_acts = [a for a in model.activations
                  if not isinstance(a, tf1.SparseTensor)]
    fetched = sess.run(dense_acts + [model.outputs, model.loss,
                                     model.accuracy], feed)
    acts, (outputs, train_loss, train_acc) = fetched[:-3], fetched[-3:]
    for i, a in enumerate(acts):
        out[f"activations/{i}"] = a
    out["predictions"] = outputs
    out["golden/train_loss"] = train_loss
    out["golden/train_acc"] = train_acc

    feed_t = construct_feed_dict(features, support, y_test, test_mask,
                                 placeholders)
    out["golden/test_acc"] = sess.run(model.accuracy, feed_t)

    if opts.train_steps:
        # dropout stays at the placeholder default 0 → deterministic steps
        step_losses = []
        for _ in range(opts.train_steps):
            _, step_loss = sess.run([model.opt_op, model.loss], feed)
            step_losses.append(step_loss)
        out["golden/step_losses"] = np.asarray(step_losses, np.float64)
        out["meta/learning_rate"] = 0.01

    # exact inputs
    coords, values, shape = features
    out["inputs/features/indices"] = coords
    out["inputs/features/values"] = values
    out["inputs/features/dense_shape"] = np.asarray(shape)
    for k, (c, v, s) in enumerate(support):
        out[f"inputs/support/{k}/indices"] = c
        out[f"inputs/support/{k}/values"] = v
        out[f"inputs/support/{k}/dense_shape"] = np.asarray(s)
    out["tensors/y_train"] = y_train
    out["tensors/y_test"] = y_test
    out["tensors/train_mask"] = train_mask
    out["tensors/test_mask"] = test_mask

    os.makedirs(os.path.dirname(os.path.abspath(opts.out)), exist_ok=True)
    np.savez_compressed(opts.out, **out)
    print(f"wrote {opts.out}: {len(out)} arrays; "
          f"train_loss={train_loss:.6f} test_acc={out['golden/test_acc']:.4f}")


if __name__ == "__main__":
    main()
