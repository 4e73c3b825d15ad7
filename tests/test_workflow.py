"""End-to-end orchestration: init → generate → sweep → summarize → clean.

A miniature syn-cora pipeline (2 tiny graphs, 1 feature type, 2 splits, 2
model configs) exercised through the real CLI module, including resumability
(second sweep run skips everything) and stale-run cleanup.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from h2gcn_tpu.experiments import generation, summarize, workflow
from h2gcn_tpu.experiments.__main__ import main as exp_main
from h2gcn_tpu.modules.runstore import get_project

GEN_CONFIG = {
    "graphs": [
        {
            "method": "mixhop", "numNode": 120, "numClass": 3,
            "classRatio": [40, 40, 40], "m": 2, "m0": 6, "h": h,
            "heteroClsWeight": "circularDist", "heteroWeightsExponent": 1.0,
            "graphName": f"mixhop-n120-h{h}-c3",
        }
        for h in (0.2, 0.8)
    ],
    "features": [{"feature_type": "naive_npz", "var_factor": "all"}],
    "splits": [
        {"split_config": "0.25p__0.5p", "split_index": i} for i in range(2)
    ],
}

MODEL_CONFIG = {
    "model_args": [
        "H2GCN --network_setup M16-R-T1-G-V-C1-MO --adj_nhood 1 2 --hidden 16",
        "GCN --variant gcn --hidden1 16",
    ],
    "exp_regex": "",
    "arg_regex": None,
    "graph_filter_dict": None,
}


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    gen_cfg = root / "gen.json"
    gen_cfg.write_text(json.dumps(GEN_CONFIG))
    exp_main(["init", str(root / "proj"), "-c", str(gen_cfg)])
    exp_main(["generate", str(root / "proj")])
    return root


def test_generation_pipeline(pipeline_root):
    project = get_project(str(pipeline_root / "proj"))
    assert len(project) == 2
    for job in project:
        assert generation.graph_generated(job)
        assert generation.statistics_calculated(job)
        assert generation.split_generated(job)
        assert 0 <= job.doc["homoEdgeRatio"] <= 1
        assert job.doc["numNodes"] == 120
    # homophily ordering reflects h
    jobs = sorted(project, key=lambda j: j.sp.h)
    assert jobs[0].doc["homoEdgeRatio"] < jobs[1].doc["homoEdgeRatio"]


def test_generation_idempotent(pipeline_root):
    project = get_project(str(pipeline_root / "proj"))
    job = next(iter(project))
    before = job.doc["homoEdgeRatio"]
    generation.run_pipeline(str(pipeline_root / "proj"), verbose=False)
    assert job.doc["homoEdgeRatio"] == before


@pytest.mark.slow
def test_sweep_and_summarize(pipeline_root, tmp_path):
    cfg = tmp_path / "model.json"
    cfg.write_text(json.dumps(MODEL_CONFIG))
    root = str(pipeline_root / "proj")

    env = None
    exp_main(["sweep", root, "-c", str(cfg), "--epochs", "8",
              "--extra_args", "--platform cpu"])

    # every (graph × split × args) has a succeeded run with results.json
    rows = summarize.summarize_experiments(root, MODEL_CONFIG)
    assert len(rows) == 2 * 2 * 2  # graphs × splits × model_args
    for row in rows:
        assert row["test_accuracy"] is not None
        assert 0 <= row["test_accuracy"] <= 1 + 1e-5  # f32 mask-sum rounding
        assert row["h"] in (0.2, 0.8)

    # resumability: re-running skips every run (dry_run would still spawn)
    project = get_project(root)
    for job in project:
        assert workflow.model_experiments_finished(job, MODEL_CONFIG)
        results = workflow.run_model(job, MODEL_CONFIG, epochs=8)
        assert results == []  # all skipped

    # CSV output
    out_csv = tmp_path / "results.csv"
    exp_main(["summarize", root, "-f", str(cfg), "-o", str(out_csv)])
    assert out_csv.exists()
    stats_csv = tmp_path / "stats.csv"
    exp_main(["stats", root, "-o", str(stats_csv)])
    assert stats_csv.exists()

    # clean: corrupt one split file → its runs become stale and are removed
    job = next(iter(project))
    _, split_job, fg_name, files = next(generation.feature_split_iter(job))
    with open(split_job.fn(files[0]), "ab") as f:
        f.write(b"stale")
    removed = workflow.clean_workspace(job, MODEL_CONFIG)
    assert len(removed) >= 1
    assert not workflow.model_experiments_finished(job, MODEL_CONFIG)


def test_run_sweep_forwards_epochs(pipeline_root, capsys):
    """Regression: run_sweep must forward --epochs to child argv."""
    root = str(pipeline_root / "proj")
    workflow.run_sweep(root, dict(MODEL_CONFIG, model_args=["GCN"]),
                       epochs=7, dry_run=True)
    out = capsys.readouterr().out
    assert "--epochs 7" in out
