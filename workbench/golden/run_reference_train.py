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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _keras_lr_fix  # noqa: E402

_keras_lr_fix.apply()

sys.argv = ["run_experiments.py"] + sys.argv[1:]
runpy.run_path(os.path.join(REFERENCE, "run_experiments.py"), run_name="__main__")
