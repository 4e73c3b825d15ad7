"""Dump golden artifacts from the EXECUTED reference TF1 MixHop baseline.

Builds the reference MixHopModel exactly as mixhop_trainer.py:229-263 does
(sparse_dropout → to_dense → l2_normalize → per-layer mixhop_layer +
batch_norm + relu → psum_output_layer) under tf.compat.v1 with the contrib
shims from run_mixhop_reference.py, runs one eval-mode forward
(is_training=False), and records weights, the reference's
``model.activations``, the normalized adjacency / dense features it
consumed, and loss/accuracy values.

Consumed by tests/test_golden_mixhop_baseline.py.

Usage:
    python dump_mixhop_baseline.py --dataset_name ind.cora \
        --adj_pows 0:24:0,1:18:7,2:18:7 --l2reg 5e-3 \
        --out ../../tests/golden/ref_mixhopbase_cora.npz
"""
import argparse
import os
import sys
import types

MIXHOP_DIR = "/root/reference/baselines/mixhop"
DEFAULT_DATA = os.path.join(MIXHOP_DIR, "data/planetoid/data")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_name", default="ind.cora")
    ap.add_argument("--dataset_dir", default=DEFAULT_DATA)
    ap.add_argument("--adj_pows", default="0:24:0,1:18:7,2:18:7")
    ap.add_argument("--hidden_dims_csv", default="60")
    ap.add_argument("--l2reg", type=float, default=5e-3)
    ap.add_argument("--input_dropout", type=float, default=0.5)
    ap.add_argument("--layer_dropout", type=float, default=0.9)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--lr", type=float, default=0.5,
                    help="reference default GradientDescentOptimizer lr "
                         "(mixhop_trainer.py:75-77)")
    ap.add_argument("--dyn_steps", type=int, default=10,
                    help="inference-mode (deterministic: dropouts off, "
                         "batch_norm on moving stats) SGD steps to record "
                         "for the training-dynamics golden")
    ap.add_argument("--out", required=True)
    opts = ap.parse_args()

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

    import numpy as np
    import tensorflow.compat.v1 as tf1

    tf1.disable_eager_execution()

    def _batch_norm(inputs, *args, **kwargs):
        return tf1.layers.batch_normalization(
            inputs, momentum=0.999, epsilon=0.001, center=True, scale=False,
            training=kwargs.get("is_training", True))

    contrib = types.ModuleType("tensorflow.contrib")
    contrib_layers = types.ModuleType("tensorflow.contrib.layers")
    contrib_layers.batch_norm = _batch_norm
    contrib.layers = contrib_layers
    tf1.contrib = contrib
    sys.modules["tensorflow"] = tf1
    sys.modules["tensorflow.contrib"] = contrib
    sys.modules["tensorflow.contrib.layers"] = contrib_layers

    _orig_load = np.load

    def _latin1_load(*args, **kwargs):
        kwargs.setdefault("encoding", "latin1")
        return _orig_load(*args, **kwargs)

    np.load = _latin1_load

    sys.path.insert(0, MIXHOP_DIR)
    import mixhop_dataset
    import mixhop_model
    from tensorflow.python.keras import regularizers as keras_regularizers

    np.random.seed(opts.seed)
    tf1.set_random_seed(opts.seed)

    dataset = mixhop_dataset.ReadDataset(opts.dataset_dir, opts.dataset_name)

    x = dataset.sparse_allx_tensor()
    is_training = tf1.placeholder_with_default(True, [], name="is_training")
    sparse_adj = dataset.sparse_adj_tensor()
    kernel_regularizer = keras_regularizers.l2(opts.l2reg)
    num_x_entries = dataset.x_indices.shape[0]

    # powers parser semantics (mixhop_trainer.py:172-214) replicated with
    # explicit values so no absl flags are needed
    ratios, powers = [], []
    for tok in opts.adj_pows.split(","):
        parts = tok.split(":")
        powers.append(int(parts[0]))
        ratios.append(list(map(float, parts[1:])) or [1])
    num_classes = dataset.ally.shape[1]
    out_cap = int(sum(r[-1] for r in ratios))
    layer_dims = [int(d) for d in opts.hidden_dims_csv.split(",")] + [out_cap]

    def divide_capacity(j, total):
        sizes = [r[min(j, len(r) - 1)] for r in ratios]
        per_unit = total / float(np.sum(sizes))
        dims = [int(np.round(s * per_unit)) for s in sizes[:-1]]
        return dims + [total - sum(dims)]

    model = mixhop_model.MixHopModel(sparse_adj, x, is_training,
                                     kernel_regularizer)
    model.add_layer("mixhop_model", "sparse_dropout", opts.input_dropout,
                    num_x_entries, pass_is_training=True)
    model.add_layer("tf", "sparse_tensor_to_dense")
    model.add_layer("tf.nn", "l2_normalize", axis=1)
    capacities = []
    for j, dim in enumerate(layer_dims):
        if j != 0:
            model.add_layer("tf.layers", "dropout", opts.layer_dropout,
                            pass_training=True)
        caps = divide_capacity(j, dim)
        capacities.append(caps)
        model.add_layer("self", "mixhop_layer", powers, caps, layer_id=j,
                        pass_kernel_regularizer=True)
        if j != len(layer_dims) - 1:
            model.add_layer("tf.contrib.layers", "batch_norm")
            model.add_layer("tf.nn", "relu")
    model.add_layer("mixhop_model", "psum_output_layer", num_classes,
                    use_softmax=True)

    net = model.activations[-1]
    y = tf1.placeholder(tf1.float32, [None, num_classes], name="y")
    ph_indices = tf1.placeholder(tf1.int64, [None])
    sliced_output = tf1.gather(net, ph_indices)
    label_loss = tf1.reduce_mean(tf1.nn.softmax_cross_entropy_with_logits_v2(
        labels=tf1.stop_gradient(y), logits=sliced_output))
    total_loss = tf1.losses.get_total_loss() + label_loss
    # reference default optimizer (mixhop_trainer.py:75-77, 285-289):
    # plain GradientDescentOptimizer at --learn_rate
    train_op = tf1.train.GradientDescentOptimizer(opts.lr).minimize(
        total_loss)

    sess = tf1.Session()
    sess.run(tf1.global_variables_initializer())

    train_idx, val_idx, test_idx = dataset.get_partition_indices(500)
    train_idx = list(train_idx)

    out = {
        "meta/adj_pows": opts.adj_pows,
        "meta/hidden_dims_csv": opts.hidden_dims_csv,
        "meta/l2reg": opts.l2reg,
        "meta/num_classes": num_classes,
        "meta/capacities": np.asarray(
            [c + [0] * (len(max(capacities, key=len)) - len(c))
             for c in capacities]),
        "meta/powers": np.asarray(powers),
    }
    for v in tf1.trainable_variables():
        out[f"weights/{v.name}"] = sess.run(v)

    feed = {is_training: False, ph_indices: train_idx,
            y: dataset.ally[train_idx]}
    dataset.populate_feed_dict(feed)
    dense_acts = [(i, a) for i, a in enumerate(model.activations)
                  if not isinstance(a, tf1.SparseTensor)]
    fetched = sess.run([a for _, a in dense_acts]
                       + [label_loss, total_loss], feed)
    acts, (gold_label_loss, gold_total_loss) = fetched[:-2], fetched[-2:]
    acts_by_ind = {}
    for (i, _), val in zip(dense_acts, acts):
        out[f"activations/{i}"] = val
        acts_by_ind[i] = val

    feed_t = {is_training: False, ph_indices: list(test_idx)}
    dataset.populate_feed_dict(feed_t)
    test_preds = sess.run(sliced_output, feed_t)
    test_acc = float(np.mean(test_preds.argmax(1)
                             == dataset.ally[list(test_idx)].argmax(1)))
    out["golden/label_loss"] = gold_label_loss
    out["golden/total_loss"] = gold_total_loss
    out["golden/test_acc"] = test_acc
    out["meta/lr"] = opts.lr

    # --- training dynamics: deterministic (is_training False) SGD steps —
    # pins the gradient of keras-L2 + psum q-penalty + label CE through
    # the whole stack, and the plain-SGD update
    feed_d = {is_training: False, ph_indices: train_idx,
              y: dataset.ally[train_idx]}
    dataset.populate_feed_dict(feed_d)
    step_losses = []
    for _ in range(opts.dyn_steps):
        step_loss, _ = sess.run([total_loss, train_op], feed_d)
        step_losses.append(step_loss)
    out["golden/step_losses"] = np.asarray(step_losses)
    for v in tf1.trainable_variables():
        out[f"weights_after/{v.name}"] = sess.run(v)

    feed_a = {}
    dataset.populate_feed_dict(feed_a)
    adj_val = sess.run(sparse_adj, feed_a)
    out["inputs/adj/indices"] = adj_val.indices
    out["inputs/adj/values"] = adj_val.values
    out["inputs/adj/dense_shape"] = np.asarray(adj_val.dense_shape)
    # dense features exactly as the model saw them (post to_dense,
    # activations[2] in the build above)
    out["inputs/x_dense"] = acts_by_ind[2]
    out["tensors/ally"] = dataset.ally
    out["tensors/train_idx"] = np.asarray(train_idx)
    out["tensors/test_idx"] = np.asarray(list(test_idx))

    os.makedirs(os.path.dirname(os.path.abspath(opts.out)), exist_ok=True)
    np.savez_compressed(opts.out, **out)
    print(f"wrote {opts.out}: label_loss={gold_label_loss:.6f} "
          f"total={gold_total_loss:.6f} test_acc={test_acc:.4f}")


if __name__ == "__main__":
    main()
