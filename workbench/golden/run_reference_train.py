"""Execute the reference's own run_experiments.py end-to-end (TF 2.21).

Usage:
    python workbench/golden/run_reference_train.py H2GCN planetoid \
        --dataset ind.cora --dataset_path ... [--epochs N] [...]

Runs with cwd = workbench/golden/scratch so the reference's relative
checkpoint paths never touch /root/reference. Installs the scipy<1.8
compat shim the reference needs, then hands over to the real entry point
(reference run_experiments.py) via runpy — nothing is reimplemented, so the
printed "Best performance:" line is the reference's own result.
"""
import os
import runpy
import sys
import types

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")

REFERENCE = "/root/reference/h2gcn"
scratch = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scratch")
os.makedirs(scratch, exist_ok=True)
os.chdir(scratch)
sys.path.insert(0, REFERENCE)

import scipy.sparse.linalg as _ssl  # noqa: E402

_eigen = types.ModuleType("scipy.sparse.linalg.eigen")
_arpack = types.ModuleType("scipy.sparse.linalg.eigen.arpack")
_arpack.eigsh = _ssl.eigsh
_eigen.arpack = _arpack
sys.modules["scipy.sparse.linalg.eigen"] = _eigen
sys.modules["scipy.sparse.linalg.eigen.arpack"] = _arpack

# Keras-version compat: the reference builds its optimizer with
# `keras.optimizers.get(name).from_config({"lr": lr})`
# (h2gcn/models/H2GCN.py:62-63). The TF-2.1-era keras honored the
# deprecated "lr" alias, so the published reference trains at --lr
# (default 0.01). tf-keras 2.21 *warns and drops* the key, silently
# training at the Adam default 1e-3 instead. Restore the published
# semantics by translating the alias before from_config sees it.
# Set H2GCN_REF_KEEP_LR_BUG=1 to reproduce the modern-keras behavior.
if not os.environ.get("H2GCN_REF_KEEP_LR_BUG"):
    import tf_keras  # noqa: E402

    _base = tf_keras.optimizers.Optimizer
    _orig_from_config = _base.from_config.__func__

    def _from_config(cls, config, custom_objects=None):
        config = dict(config)
        if "lr" in config and "learning_rate" not in config:
            config["learning_rate"] = config.pop("lr")
        return _orig_from_config(cls, config, custom_objects)

    _base.from_config = classmethod(_from_config)

sys.argv = ["run_experiments.py"] + sys.argv[1:]
runpy.run_path(os.path.join(REFERENCE, "run_experiments.py"), run_name="__main__")
