"""Every shipped sweep config must parse and run one training epoch."""

import glob
import json

import pytest

from h2gcn_tpu.run_experiments import main

DATA = "/root/reference/baselines/mixhop/data/planetoid/data"


def _all_model_args():
    seen = set()
    for path in sorted(glob.glob("configs/*/*.json")):
        if path.endswith("generation.json"):
            continue
        with open(path) as f:
            cfg = json.load(f)
        for args in cfg.get("model_args", []):
            seen.add(args)
    return sorted(seen)


@pytest.mark.slow
def test_all_shipped_model_args_run(planetoid_path, tmp_path):
    combos = _all_model_args()
    assert len(combos) >= 10
    for i, args_str in enumerate(combos):
        parts = args_str.split()
        # datafmt goes right after the model name (the sweep's argv layout,
        # workflow.dataset_args) so greedy nargs flags can't swallow it
        argv = [parts[0], "planetoid"] + parts[1:] + [
            "--dataset", "ind.cora",
            "--dataset_path", planetoid_path, "--epochs", "1",
            "--checkpoint_dir",
            str(tmp_path / f"ck{i}" / "{model}_{dataset}_{runname}"),
        ]
        args = main(argv)
        assert "test_accuracy" in args.objects["best_val_stats"], args_str


def test_generation_configs_parse():
    for path in sorted(glob.glob("configs/*/generation.json")):
        with open(path) as f:
            cfg = json.load(f)
        assert cfg["graphs"], path
        for g in cfg["graphs"]:
            assert g["method"] == "mixhop"
            assert g["m"] * g["numClass"] <= g["m0"], (
                f"{path}: BA seed constraint violated")
            assert sum(g["classRatio"]) == g["numNode"]
