"""Execute the reference TF1 GAT baseline under tf.compat.v1 for parity.

baselines/GAT/execute_cora_sparse.py is TF1 graph-mode code; this wrapper
runs it unmodified on TF 2.21's compat.v1 surface:

  * ``sys.modules["tensorflow"] = tf.compat.v1`` + eager disabled
    (placeholders, Session, Saver, tf.layers.conv1d);
  * ``tf.contrib.layers.bias_add`` (utils/layers.py:36,91) shimmed with
    slim semantics: a zero-init bias under a uniquified "BiasAdd" scope;
  * the package-relative ``from .dataset import PlanetoidData``
    (utils/process.py:39 — dangling symlink, SURVEY component #31)
    satisfied by pre-registering shim/dataset.py as ``utils.dataset``;
  * the scipy<1.8 eigsh import path restored (the shim does this).

Usage:
    python run_gat_reference.py --seed 123 [execute_cora_sparse.py flags]
"""
import importlib.util
import os
import runpy
import sys
import types

GAT_DIR = "/root/reference/baselines/GAT"
SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shim")
DEFAULT_DATA = "/root/reference/baselines/mixhop/data/planetoid/data"


def main():
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

    seed = None
    argv = sys.argv[1:]
    if "--seed" in argv:
        i = argv.index("--seed")
        seed = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]

    import tensorflow.compat.v1 as tf1

    tf1.disable_eager_execution()
    if seed is not None:
        tf1.set_random_seed(seed)

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

    # Satisfy utils/process.py's package-relative `from .dataset import ...`
    # (the dangling symlink) with the shared shim before `utils` is touched.
    spec = importlib.util.spec_from_file_location(
        "utils.dataset", os.path.join(SHIM_DIR, "dataset.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["utils.dataset"] = mod
    spec.loader.exec_module(mod)

    # tf 2.21's SparseSoftmax silently mis-pairs values with indices when
    # the input SparseTensor is not canonically ordered.  The reference
    # feeds preprocess_adj_bias's transposed (col,row) pairs, which are
    # non-canonical (utils/process.py:122-131) — fine on the TF-1.6-era
    # stack it targeted (published 83% Cora), broken here.  Re-sort the
    # same edges canonically so the executed graph computes the per-row
    # softmax the reference's authors validated.
    scratch = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scratch", "gat")
    os.makedirs(os.path.join(scratch, "pre_trained", "cora"), exist_ok=True)
    os.chdir(scratch)

    sys.path.insert(0, GAT_DIR)

    import numpy as _np
    from utils import process as _process

    _orig_pab = _process.preprocess_adj_bias

    def _canonical_pab(adj):
        idx, vals, shape = _orig_pab(adj)
        order = _np.lexsort((idx[:, 1], idx[:, 0]))
        return idx[order], vals[order], shape

    _process.preprocess_adj_bias = _canonical_pab
    defaults = []
    if "--dataset_path" not in argv:
        defaults += ["--dataset_path", DEFAULT_DATA]
    sys.argv = ["execute_cora_sparse.py"] + defaults + argv
    runpy.run_path(os.path.join(GAT_DIR, "execute_cora_sparse.py"),
                   run_name="__main__")


if __name__ == "__main__":
    main()
