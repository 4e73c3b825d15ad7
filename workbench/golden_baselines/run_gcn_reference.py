"""Execute the reference TF1 GCN baseline under tf.compat.v1 for parity.

The reference trainer (baselines/gcn/gcn/train.py) is TF1 graph-mode code.
TF 2.21 in this container runs it through ``tensorflow.compat.v1`` with:

  * ``sys.modules["tensorflow"] = tf.compat.v1`` so the baseline's
    ``import tensorflow as tf`` resolves to the v1 surface
    (tf.app.flags, placeholders, Session);
  * eager disabled;
  * flags pre-defined with this wrapper's values and the baseline's own
    ``DEFINE_*`` calls de-duplicated (absl raises DuplicateFlagError where
    TF1's flags silently re-used; the TF1-era lazy argv parse is replaced
    by an explicit parse here);
  * the ``models`` module pre-imported with the snapshot's missing classes
    (train.py:10 imports BeliefGCN/GCNConcat/GCNChebyAlt1/GCNChebyAlt2
    which do not exist in models.py — the known latent ImportError,
    SURVEY.md "known reference bugs") stubbed to None; none of them is
    reachable through the --model dispatch (train.py:75-103);
  * the dangling ``dataset`` symlink (component #31) satisfied by
    shim/dataset.py.

Usage:
    python run_gcn_reference.py --model gcn --dataset ind.cora --seed 123
    # models: gcn | gcn_cheby | gcn_concat_2 | gcn_cheby_concat_2 | dense
"""
import argparse
import os
import runpy
import sys

GCN_DIR = "/root/reference/baselines/gcn/gcn"
SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shim")
DEFAULT_DATA = "/root/reference/baselines/mixhop/data/planetoid/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gcn")
    ap.add_argument("--dataset", default="ind.cora")
    ap.add_argument("--dataset_path", default=DEFAULT_DATA)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--learning_rate", type=float, default=0.01)
    ap.add_argument("--hidden1", type=int, default=16)
    ap.add_argument("--dropout", type=float, default=0.5)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--early_stopping", type=int, default=10)
    ap.add_argument("--max_degree", type=int, default=3)
    ap.add_argument("--eigenvalue", type=int, default=-1)
    ap.add_argument("--val_size", type=int, default=500)
    opts = ap.parse_args()

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")

    import tensorflow.compat.v1 as tf1

    tf1.disable_eager_execution()
    sys.modules["tensorflow"] = tf1

    flags = tf1.app.flags
    flags.DEFINE_string("dataset", opts.dataset, "")
    flags.DEFINE_string("dataset_path", opts.dataset_path, "")
    flags.DEFINE_string("model", opts.model, "")
    flags.DEFINE_float("learning_rate", opts.learning_rate, "")
    flags.DEFINE_integer("epochs", opts.epochs, "")
    flags.DEFINE_integer("hidden1", opts.hidden1, "")
    flags.DEFINE_float("dropout", opts.dropout, "")
    flags.DEFINE_float("weight_decay", opts.weight_decay, "")
    flags.DEFINE_integer("early_stopping", opts.early_stopping, "")
    flags.DEFINE_integer("max_degree", opts.max_degree, "")
    flags.DEFINE_string("run_id", "", "")
    flags.DEFINE_bool("use_signac", False, "")
    flags.DEFINE_string("signac_root", None, "")
    flags.DEFINE_string("save_plot", None, "")
    flags.DEFINE_bool("debug", False, "")
    flags.DEFINE_integer("random_seed", opts.seed, "")
    flags.DEFINE_integer("val_size", opts.val_size, "")
    flags.DEFINE_bool("_feature_normalize", True, "")
    flags.DEFINE_integer("eigenvalue", opts.eigenvalue, "")
    flags.FLAGS(["train.py"])  # mark parsed with the values above

    from absl.flags import _exceptions as _flag_exc

    def _dedup(define_fn):
        def wrapped(name, default, help_str="", *a, **k):
            try:
                return define_fn(name, default, help_str, *a, **k)
            except _flag_exc.DuplicateFlagError:
                return None
        return wrapped

    for fn_name in ("DEFINE_string", "DEFINE_integer", "DEFINE_float",
                    "DEFINE_bool", "DEFINE_boolean"):
        setattr(flags, fn_name, _dedup(getattr(flags, fn_name)))

    sys.path.insert(0, SHIM_DIR)
    sys.path.insert(0, GCN_DIR)

    import dataset  # noqa: F401 — shim; also installs the scipy eigsh compat path
    import models as ref_models  # noqa: F401 (pre-import to patch)

    for missing in ("BeliefGCN", "GCNConcat", "GCNChebyAlt1", "GCNChebyAlt2"):
        if not hasattr(ref_models, missing):
            setattr(ref_models, missing, None)

    sys.argv = ["train.py"]
    runpy.run_path(os.path.join(GCN_DIR, "train.py"), run_name="__main__")


if __name__ == "__main__":
    main()
