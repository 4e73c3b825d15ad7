"""Heterophilous (WebKB-protocol) substitute benchmark, end to end.

Real Texas/Wisconsin/Cornell need network access this container lacks
(scripts/get-real-geomgcn.sh — DNS verified failing), so this script
regenerates the recorded substitute (docs/BENCHMARKS.md "Heterophilous
benchmarks"): a Texas-scale synthetic heterophilous dataset (n=183, 5
classes, h=0.1, cora-transplanted features) written in the EXACT GeomGCN
on-disk format with 10 stored 60/20/20 splits, then H2GCN-1/2, MLP and GCN
run through the real CLI with --splits_file_path. The expected signature
(paper Table 3 under strong heterophily): H2GCN > MLP >> GCN.

Emits docs/geomgcn_substitute.json. CPU-only, ~10 min.

Usage: python workbench/geomgcn_sweep.py [workdir]
"""
import json
import pathlib
import subprocess
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from h2gcn_tpu.experiments.feature_generation import row_sample
from h2gcn_tpu.experiments.graphgen import MixhopGraphGenerator

N, C, H_HOMOPHILY, N_SPLITS = 183, 5, 0.1, 10
PLANETOID = "/root/reference/baselines/mixhop/data/planetoid/data"

MODELS = {
    "h2gcn-2": ["H2GCN", "--network_setup",
                "M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO", "--adj_nhood", "1", "2"],
    "h2gcn-1": ["H2GCN", "--network_setup", "M64-R-T1-G-V-C1-D0.5-MO",
                "--adj_nhood", "1", "2"],
    "mlp": ["H2GCN", "--network_setup", "M64-R-D0.5-MO"],
    "gcn": ["GCN", "--variant", "gcn", "--early_stopping", "10"],
}


def build_dataset(work: pathlib.Path) -> str:
    rng = np.random.RandomState(0)
    gen = MixhopGraphGenerator([37, 37, 37, 36, 36], rng=rng)
    adj_lists, colors = gen.generate_graph(N, 2, 10, H_HOMOPHILY)
    ally = np.zeros((N, C))
    for v, col in enumerate(colors):
        ally[v][col - 1] = 1

    # features: cora rows transplanted per class (the syn-cora protocol,
    # reference run_graph_generation.py row_sample mode)
    from h2gcn_tpu.datasets.planetoid import PlanetoidData

    cora = PlanetoidData("ind.cora", PLANETOID)
    allx = row_sample(ally, cora, rng=rng)

    name = f"syn-texas-h{H_HOMOPHILY}"
    with open(work / f"out1_node_feature_label.txt", "w") as fh:
        fh.write("node_id\tfeature\tlabel\n")
        for i in range(N):
            feats = ",".join(str(int(v)) for v in allx[i])
            fh.write(f"{i}\t{feats}\t{int(np.argmax(ally[i]))}\n")
    with open(work / f"out1_graph_edges.txt", "w") as fh:
        fh.write("src\tdst\n")
        for u in sorted(adj_lists):
            for v in sorted(adj_lists[u]):
                if u < v:
                    fh.write(f"{u}\t{v}\n")

    for s in range(N_SPLITS):
        srng = np.random.RandomState(100 + s)
        perm = srng.permutation(N)
        n_tr, n_va = int(0.6 * N), int(0.2 * N)
        masks = {}
        masks["train_mask"] = np.zeros(N, np.int64)
        masks["val_mask"] = np.zeros(N, np.int64)
        masks["test_mask"] = np.zeros(N, np.int64)
        masks["train_mask"][perm[:n_tr]] = 1
        masks["val_mask"][perm[n_tr:n_tr + n_va]] = 1
        masks["test_mask"][perm[n_tr + n_va:]] = 1
        np.savez(work / f"{name}_split_0.6_0.2_{s}.npz", **masks)
    return name


def run_cli(model_args, work, name, split, ckpt_root):
    cmd = ([sys.executable, "-m", "h2gcn_tpu.run_experiments"]
           + model_args[:1]
           + ["geomgcn", "--dataset", name, "--dataset_path", str(work),
              "--splits_file_path",
              str(work / f"{name}_split_0.6_0.2_{split}.npz"),
              "--platform", "cpu", "--random_seed", str(123 + split),
              "--checkpoint_dir",
              str(ckpt_root / f"{{model}}_{{dataset}}_{split}_{{runname}}")]
           + model_args[1:])
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT,
                         timeout=600)
    if out.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)} failed:\n{out.stderr[-2000:]}")
    for line in reversed(out.stdout.splitlines()):
        if "Test Acc" in line:
            return float(line.split("Test Acc:")[1].strip().rstrip("%"))
    raise RuntimeError(f"no Test Acc in output:\n{out.stdout[-2000:]}")


def main():
    work = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else (
        pathlib.Path("/tmp/geomgcn_substitute"))
    work.mkdir(parents=True, exist_ok=True)
    name = build_dataset(work)
    print(f"dataset {name} written to {work}")
    results = {}
    for model, margs in MODELS.items():
        accs = []
        for s in range(N_SPLITS):
            acc = run_cli(margs, work, name, s, work / "ckpt")
            accs.append(acc)
            print(f"{model} split {s}: {acc:.2f}", flush=True)
        results[model] = {
            "mean": round(float(np.mean(accs)), 1),
            "std": round(float(np.std(accs)), 1),
            "accs": accs,
        }
        print(f"{model}: {results[model]['mean']} ± {results[model]['std']}")
    payload = {
        "protocol": "GeomGCN/WebKB 60/20/20 x10 stored splits, CLI end-to-end",
        "dataset": {"n": N, "classes": C, "homophily": H_HOMOPHILY,
                    "features": "cora row_sample transplant",
                    "generator": "MixhopGraphGenerator seed 0"},
        "results": results,
    }
    (ROOT / "docs" / "geomgcn_substitute.json").write_text(
        json.dumps(payload, indent=2))
    print("wrote docs/geomgcn_substitute.json")


if __name__ == "__main__":
    main()
