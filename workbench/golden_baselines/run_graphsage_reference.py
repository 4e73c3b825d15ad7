"""Execute the reference PyTorch GraphSAGE baseline (seeded) for parity.

The reference trainer (baselines/graphsage-simple/graphsage/model.py:88-163)
fixes np/random seeds to 1 inside run_graphsage but never seeds torch, so
parameter init varies run to run.  This wrapper seeds torch explicitly and
runs the reference script unmodified via runpy, so repeated invocations give
a reproducible seed set for the accuracy-parity table.

Usage:
    python run_graphsage_reference.py --seed 1 --dataset ind.cora \
        [--model_class SupervisedGraphSageConcat] [-- extra model.py args]
"""
import argparse
import os
import runpy
import sys

GS_DIR = "/root/reference/baselines/graphsage-simple/graphsage"
SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shim")
DEFAULT_DATA = "/root/reference/baselines/mixhop/data/planetoid/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--dataset", default="ind.cora")
    ap.add_argument("--dataset_path", default=DEFAULT_DATA)
    ap.add_argument("--model_class", default="SupervisedGraphSage")
    opts, extra = ap.parse_known_args()

    import torch

    torch.manual_seed(opts.seed)

    # Python 3.11 removed random.sample(set) — the reference (written for
    # 3.6-era CPython, aggregators.py:38-41) relies on the old behavior
    # `population = tuple(population)` for sets.  Restore it exactly.
    import random as _random

    _orig_sample = _random.sample

    def _compat_sample(population, k, **kw):
        if isinstance(population, (set, frozenset)):
            population = tuple(population)
        return _orig_sample(population, k, **kw)

    _random.sample = _compat_sample

    sys.path.insert(0, SHIM_DIR)
    sys.path.insert(0, GS_DIR)
    sys.argv = [
        "model.py",
        "--dataset", opts.dataset,
        "--dataset_path", opts.dataset_path,
        "--model_class", opts.model_class,
        "--no-cuda",
    ] + extra
    runpy.run_path(os.path.join(GS_DIR, "model.py"), run_name="__main__")


if __name__ == "__main__":
    main()
