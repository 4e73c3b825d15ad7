"""Dump golden artifacts from the EXECUTED reference TF1 SpGAT baseline.

Replicates execute_cora_sparse.py:97-150 under tf.compat.v1 (with the
contrib bias_add shim + dataset symlink shim from run_gat_reference.py):
seeded init, SpGAT.inference over the sparse self-looped adjacency
(preprocess_adj_bias — note its transposed (col,row) indices,
utils/process.py:122-131), one eval-mode forward (is_train False, both
dropouts 0), and records all trainable variables (the 3-conv1d + BiasAdd
pattern per attention head, utils/layers.py:53-100), logits, masked
train loss, test accuracy, and the reference's L2 term
(l2_coef·Σ½‖θ‖² over ALL vars — base_gattn.py:14-18's name-based bias
exclusion matches nothing in practice).

Consumed by tests/test_golden_gat_baseline.py.

Usage:
    python dump_gat_baseline.py --dataset ind.cora \
        --out ../../tests/golden/ref_gatbase_cora.npz
"""
import argparse
import importlib.util
import os
import sys
import types

GAT_DIR = "/root/reference/baselines/GAT"
SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shim")
DEFAULT_DATA = "/root/reference/baselines/mixhop/data/planetoid/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ind.cora")
    ap.add_argument("--dataset_path", default=DEFAULT_DATA)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--hid_units", nargs="*", type=int, default=[8])
    ap.add_argument("--n_heads", nargs="*", type=int, default=[8, 1])
    ap.add_argument("--l2_coef", type=float, default=5e-4)
    ap.add_argument("--lr", type=float, default=0.005)
    ap.add_argument("--dyn_steps", type=int, default=10,
                    help="dropout-free Adam train steps to record "
                         "(per-step loss + final weights) for the "
                         "training-dynamics golden")
    ap.add_argument("--out", required=True)
    opts = ap.parse_args()

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

    import numpy as np
    import tensorflow.compat.v1 as tf1

    tf1.disable_eager_execution()

    def _bias_add(inputs, scope=None):
        with tf1.variable_scope(scope, default_name="BiasAdd"):
            b = tf1.get_variable(
                "biases", shape=[int(inputs.shape[-1])], dtype=inputs.dtype,
                initializer=tf1.zeros_initializer())
            return tf1.nn.bias_add(inputs, b)

    contrib = types.ModuleType("tensorflow.contrib")
    contrib_layers = types.ModuleType("tensorflow.contrib.layers")
    contrib_layers.bias_add = _bias_add
    contrib.layers = contrib_layers
    tf1.contrib = contrib
    sys.modules["tensorflow"] = tf1
    sys.modules["tensorflow.contrib"] = contrib
    sys.modules["tensorflow.contrib.layers"] = contrib_layers

    spec = importlib.util.spec_from_file_location(
        "utils.dataset", os.path.join(SHIM_DIR, "dataset.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["utils.dataset"] = mod
    spec.loader.exec_module(mod)

    sys.path.insert(0, GAT_DIR)
    from models import SpGAT
    from utils import process

    dataset = process.PlanetoidData(opts.dataset, opts.dataset_path,
                                    val_size=500)
    (adj, features, y_train, y_val, y_test,
     train_mask, val_mask, test_mask) = dataset.load_data_result
    features, _ = process.preprocess_features(features)

    nb_nodes, ft_size = features.shape
    nb_classes = y_train.shape[1]
    features = features[np.newaxis]
    y_train = y_train[np.newaxis]
    y_test = y_test[np.newaxis]
    train_mask = train_mask[np.newaxis]
    test_mask = test_mask[np.newaxis]
    bias_idx, bias_val, bias_shape = process.preprocess_adj_bias(adj)
    # Canonicalize the feed order.  preprocess_adj_bias emits transposed
    # (col,row) pairs in the csr-coo order of the ORIGINAL matrix — i.e.
    # non-canonical for the transposed one.  tf 2.21's SparseSoftmax kernel
    # silently mis-pairs softmax values with indices on non-canonical input
    # (verified empirically: row sums != 1, values permuted by the canonical
    # sort), whereas the TF-1.6-era stack the reference targeted computed
    # the proper per-row softmax (its published 83% Cora is unreachable
    # otherwise).  Sorting the same edges canonically executes the reference
    # graph with the semantics its authors validated.
    order = np.lexsort((bias_idx[:, 1], bias_idx[:, 0]))
    bias_idx, bias_val = bias_idx[order], bias_val[order]

    with tf1.Graph().as_default():
        tf1.set_random_seed(opts.seed)
        ftr_in = tf1.placeholder(tf1.float32, (1, nb_nodes, ft_size))
        bias_in = tf1.sparse_placeholder(tf1.float32)
        lbl_in = tf1.placeholder(tf1.int32, (1, nb_nodes, nb_classes))
        msk_in = tf1.placeholder(tf1.int32, (1, nb_nodes))
        attn_drop = tf1.placeholder(tf1.float32, ())
        ffd_drop = tf1.placeholder(tf1.float32, ())
        is_train = tf1.placeholder(tf1.bool, ())

        logits = SpGAT.inference(
            ftr_in, nb_classes, nb_nodes, is_train, attn_drop, ffd_drop,
            bias_mat=bias_in, hid_units=opts.hid_units, n_heads=opts.n_heads,
            residual=False, activation=tf1.nn.elu)
        log_resh = tf1.reshape(logits, [-1, nb_classes])
        lab_resh = tf1.reshape(lbl_in, [-1, nb_classes])
        msk_resh = tf1.reshape(msk_in, [-1])
        loss = SpGAT.masked_softmax_cross_entropy(log_resh, lab_resh,
                                                  msk_resh)
        accuracy = SpGAT.masked_accuracy(log_resh, lab_resh, msk_resh)
        l2_vars = tf1.trainable_variables()
        loss_l2 = tf1.add_n([tf1.nn.l2_loss(v) for v in l2_vars]) \
            * opts.l2_coef
        # the reference train op (base_gattn.py:20-26): plain TF1 Adam on
        # loss + L2, default epsilon 1e-8
        train_op = tf1.train.AdamOptimizer(
            learning_rate=opts.lr).minimize(loss + loss_l2)

        # per-layer probe: the hidden layer is the ONE 8-way ConcatV2 (the
        # 8 ELU head outputs concatenated, sp_gat.py h_1)
        g = tf1.get_default_graph()
        concats = [op for op in g.get_operations()
                   if op.type == "ConcatV2"
                   and len(op.inputs) == opts.n_heads[0] + 1]
        assert len(concats) == 1, [op.name for op in concats]
        layer1 = concats[0].outputs[0]

        sess = tf1.Session()
        sess.run(tf1.global_variables_initializer())

        out = {
            "meta/hid_units": np.asarray(opts.hid_units),
            "meta/n_heads": np.asarray(opts.n_heads),
            "meta/l2_coef": opts.l2_coef,
            "meta/lr": opts.lr,
        }
        for v in l2_vars:
            out[f"weights/{v.name}"] = sess.run(v)

        feed = {ftr_in: features,
                bias_in: (bias_idx, bias_val, bias_shape),
                lbl_in: y_train, msk_in: train_mask,
                is_train: False, attn_drop: 0.0, ffd_drop: 0.0}
        gold_logits, gold_loss, gold_l2, gold_layer1 = sess.run(
            [log_resh, loss, loss_l2, layer1], feed)
        feed[lbl_in] = y_test
        feed[msk_in] = test_mask
        gold_test_acc = sess.run(accuracy, feed)

        # --- training dynamics: dropout-free Adam steps -------------------
        feed[lbl_in] = y_train
        feed[msk_in] = train_mask
        step_losses = []
        for _ in range(opts.dyn_steps):
            step_loss, _ = sess.run([loss + loss_l2, train_op], feed)
            step_losses.append(step_loss)
        out["golden/step_losses"] = np.asarray(step_losses)
        for v in l2_vars:
            out[f"weights_after/{v.name}"] = sess.run(v)

    out["predictions"] = gold_logits
    out["golden/train_loss"] = gold_loss
    out["golden/l2_loss"] = gold_l2
    out["golden/test_acc"] = gold_test_acc
    out["golden/layer1"] = gold_layer1[0]  # [n, heads*hid] post-ELU concat
    out["inputs/features"] = features[0]
    out["inputs/bias/indices"] = bias_idx
    out["inputs/bias/values"] = bias_val
    out["inputs/bias/dense_shape"] = np.asarray(bias_shape)
    out["tensors/y_train"] = y_train[0]
    out["tensors/y_test"] = y_test[0]
    out["tensors/train_mask"] = train_mask[0]
    out["tensors/test_mask"] = test_mask[0]

    os.makedirs(os.path.dirname(os.path.abspath(opts.out)), exist_ok=True)
    np.savez_compressed(opts.out, **out)
    print(f"wrote {opts.out}: train_loss={gold_loss:.6f} "
          f"l2={gold_l2:.6f} test_acc={gold_test_acc:.4f}")


if __name__ == "__main__":
    main()
