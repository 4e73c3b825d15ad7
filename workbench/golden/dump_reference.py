"""Run the ACTUAL reference TF2 H2GCN and dump golden artifacts.

This is the parity oracle generator demanded by BASELINE.json's north star:
instead of builder-written numpy oracles, we execute the reference
implementation (/root/reference/h2gcn) in-process and record

  * every trainable variable right after seeded initialization,
  * every per-layer activation of an eval-mode forward pass
    (via the reference's own ``saveActivations`` mechanism,
    reference models/H2GCN.py:294-346),
  * the exact input tensors (features, adj, adj_hops) it consumed.

The npz is then consumed by tests/test_golden_reference.py, which loads the
reference weights into the h2gcn_tpu model and asserts per-layer allclose.

Usage:
    python workbench/golden/dump_reference.py --dataset ind.cora \
        --out tests/golden/ref_h2gcn2_cora.npz [--network_setup ...]

Reference call stack exercised: run_experiments.py:1-45 equivalent setup,
modules/arguments.py:12-41 hook drain, models/H2GCN.py:33-54
(argparse_callback -> preprocessing_data -> initialize_model).
"""
import argparse
import os
import sys

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REFERENCE = "/root/reference/h2gcn"
DEFAULT_DATA = "/root/reference/baselines/mixhop/data/planetoid/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ind.cora")
    ap.add_argument("--dataset_path", default=DEFAULT_DATA)
    ap.add_argument("--network_setup", default="M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO")
    ap.add_argument("--adj_nhood", nargs="+", default=["1", "2"])
    ap.add_argument("--random_seed", type=int, default=123)
    ap.add_argument("--train_steps", type=int, default=0,
                    help="also run N reference train steps (use a "
                         "dropout-free --network_setup for determinism) and "
                         "record the per-step losses + final weights")
    ap.add_argument("--out", required=True)
    opts = ap.parse_args()

    scratch = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scratch")
    os.makedirs(scratch, exist_ok=True)
    os.chdir(scratch)  # reference logger writes results/checkpoints/ under cwd
    sys.path.insert(0, REFERENCE)

    import numpy as np

    # Compat shim: the reference targets scipy<1.8 whose eigsh lived at
    # scipy.sparse.linalg.eigen.arpack (imported by ref _dataset.py:23).
    import types
    import scipy.sparse.linalg as _ssl
    _eigen = types.ModuleType("scipy.sparse.linalg.eigen")
    _arpack = types.ModuleType("scipy.sparse.linalg.eigen.arpack")
    _arpack.eigsh = _ssl.eigsh
    _eigen.arpack = _arpack
    sys.modules["scipy.sparse.linalg.eigen"] = _eigen
    sys.modules["scipy.sparse.linalg.eigen.arpack"] = _arpack

    import models
    import datasets
    from modules import arguments, logger, monitor
    from models import tf, toNumpy

    tf.config.experimental_run_functions_eagerly(True)
    tf.random.set_seed(opts.random_seed)

    # Reproduce run_experiments.py's parser assembly, then parse a synthetic
    # argv so every reference hook (dataset load, checkpoint dir, model build)
    # runs exactly as the real entry point would.
    sys.argv = [
        "run_experiments.py", "H2GCN", "planetoid",
        "--dataset", opts.dataset,
        "--dataset_path", opts.dataset_path,
        "--network_setup", opts.network_setup,
        "--adj_nhood", *opts.adj_nhood,
    ]
    parser = arguments.create_parser()
    subparser = parser.add_argument_group("Experiment arguments")
    subparser.add_argument("--epochs", type=int, default=2000)
    models.add_subparsers(parser)
    datasets.add_subparsers(parser)
    logger.add_subparser_args(parser)
    monitor.add_subparser_args(parser)
    args = arguments.parse_args(parser)

    model = args.objects["model"]
    tensors = args.objects["tensors"]

    # One eval-mode forward; saveActivations is the reference's own golden
    # mechanism (H2GCN.py:298-337). Weights are created lazily on this call.
    acts = {}
    predictions = model(tensors["adj"], tensors["features"], tensors["adj_hops"],
                        training=False, saveActivations=acts)

    out = {}
    for key, val in acts.items():
        if isinstance(val, dict):  # toNumpy(SparseTensor) -> indices/values/shape
            for part, arr in val.items():
                out[f"{key}/{part}"] = np.asarray(arr)
        else:
            out[key] = np.asarray(val)
    for var in model.trainable_variables:
        out[f"weights/{var.name}"] = var.numpy()
    out["predictions"] = np.asarray(predictions)

    # Loss pieces on the initialized model (eval mode) — pins masked-CE + L2.
    from models._metrics import masked_softmax_cross_entropy, masked_accuracy
    out["golden/train_loss"] = np.asarray(
        model._loss(predictions, tensors["y_train"], tensors["train_mask"]))
    out["golden/l2_loss"] = np.asarray(tf.math.add_n(model.losses))
    out["golden/test_acc"] = np.asarray(
        masked_accuracy(predictions, tensors["y_test"], tensors["test_mask"]))
    for name in ("y_train", "y_val", "y_test", "train_mask", "val_mask", "test_mask"):
        out[f"tensors/{name}"] = np.asarray(tensors[name])
    if opts.train_steps:
        # Training-dynamics golden: N steps of the reference's own
        # train_step (H2GCN.py:66-74 — forward, masked CE + keras L2,
        # GradientTape, optimizer.apply_gradients). The recorded effective
        # lr is read back from the optimizer object, NOT assumed from
        # --lr: tf-keras 2.21 silently drops the deprecated "lr" alias the
        # reference passes to from_config (H2GCN.py:62-63), so the two can
        # differ — the consuming test must replay whatever actually ran.
        step_losses = []
        for _ in range(opts.train_steps):
            stats = args.objects["train_step"](**tensors)
            step_losses.append(float(stats["train_loss"]))
        out["golden/step_losses"] = np.asarray(step_losses, np.float64)
        for var in model.trainable_variables:
            out[f"weights_after/{var.name}"] = var.numpy()
        opt = args.objects["optimizer"]
        out["meta/effective_lr"] = np.asarray(float(opt.learning_rate))
        out["meta/optimizer"] = np.array(type(opt).__name__.lower())

    out["meta/network_setup"] = np.array(opts.network_setup)
    out["meta/adj_nhood"] = np.array(";".join(opts.adj_nhood))
    out["meta/dataset"] = np.array(opts.dataset)
    out["meta/random_seed"] = np.array(opts.random_seed)
    out["meta/tf_version"] = np.array(tf.__version__)

    dest = opts.out if os.path.isabs(opts.out) else os.path.join(REPO, opts.out)
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} with {len(out)} arrays")
    for k in sorted(out):
        v = out[k]
        print(f"  {k}: {getattr(v, 'shape', ())} {getattr(v, 'dtype', '')}")


if __name__ == "__main__":
    main()
