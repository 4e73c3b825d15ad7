"""Shim standing in for the reference's dangling ``dataset`` symlink.

The reference baselines (graphsage model.py:10, GAT utils/process.py:39,
gcn train.py) import a module ``dataset`` that upstream was a symlink to
``workspace/synthetic/utils/dataset.py`` — dangling in the snapshot
(SURVEY.md component #31).  The same content survives as
``experiments/h2gcn/utils/dataset.py``; this shim loads that file under the
name the baselines expect, with a scipy compat patch (the reference targets
scipy<1.8 whose eigsh lived at scipy.sparse.linalg.eigen.arpack).

Used ONLY by workbench/golden_baselines harnesses that execute the
reference baselines to produce parity oracles — never imported by
h2gcn_tpu itself.
"""
import importlib.util
import sys
import types

import scipy.sparse.linalg as _ssl

if "scipy.sparse.linalg.eigen.arpack" not in sys.modules:
    _eigen = types.ModuleType("scipy.sparse.linalg.eigen")
    _arpack = types.ModuleType("scipy.sparse.linalg.eigen.arpack")
    _arpack.eigsh = _ssl.eigsh
    _eigen.arpack = _arpack
    sys.modules["scipy.sparse.linalg.eigen"] = _eigen
    sys.modules["scipy.sparse.linalg.eigen.arpack"] = _arpack

_REF_DATASET = "/root/reference/experiments/h2gcn/utils/dataset.py"

_spec = importlib.util.spec_from_file_location("_ref_shared_dataset", _REF_DATASET)
_mod = importlib.util.module_from_spec(_spec)
sys.modules["_ref_shared_dataset"] = _mod
_spec.loader.exec_module(_mod)

globals().update({k: v for k, v in vars(_mod).items() if not k.startswith("__")})
