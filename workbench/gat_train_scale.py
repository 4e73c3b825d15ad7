"""End-to-end fused GAT TRAINING at 120K nodes through the real CLI.

The VERDICT r2 item-1 capstone: a GAT train run at a scale the reference
SpGAT could never touch (its tf.sparse scatter formulation faults this
TPU runtime outright at 120K — docs/bench_attn_scale.json — and its
published runs stop at pubmed, 19.7K). Builds a 120K-node power-law
SparseGraph npz (64-dim random features, 8 classes, 2% train split),
then trains GAT --fused_attention end to end via run_experiments —
adjacency routing (auto picks the gather payload at this occupancy since
r4; --attn_impl coo forces the chunk kernel), fused fwd+bwd, Adam,
early-stopping machinery, checkpointing all on the production path.
--timing forces jax.block_until_ready since r4, so median_ms_per_epoch
is honest device time + one relay RTT (~26-30ms), not dispatch-ack.

Appends the timing block to docs/bench_attn_scale.json.

Usage: python workbench/gat_train_scale.py [n] [m_edges] [epochs]
"""
import json
import pathlib
import re
import subprocess
import sys
import time

import numpy as np
import scipy.sparse as sp

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from bench import build_graph
from h2gcn_tpu.datasets.sparsegraph import (SparseGraph,
                                            save_sparse_graph_to_npz)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
EPOCHS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
F, C = 64, 8


def main():
    work = pathlib.Path("/tmp/gat_scale")
    work.mkdir(exist_ok=True)
    npz = work / f"powerlaw{N}.npz"
    if not npz.exists():
        rng = np.random.default_rng(0)
        A = build_graph(N, M, seed=0)
        feats = sp.csr_matrix(
            rng.standard_normal((N, F)).astype(np.float32))
        labels = rng.integers(0, C, N).astype(np.int64)
        save_sparse_graph_to_npz(npz, SparseGraph(
            A, attr_matrix=feats, labels=labels))
        print(f"wrote {npz}", flush=True)

    cmd = [sys.executable, "-u", "-m", "h2gcn_tpu.run_experiments",
           "GAT", "sparsegraph",
           "--dataset", str(npz.with_suffix("")),
           "--dataset_path", str(work),
           "--epochs", str(EPOCHS), "--fused_attention", "--attn_drop", "0",
           "--fused_precision", "default", "--patience", "0",
           "--random_seed", "1", "--timing",
           "--checkpoint_dir", str(work / "ck" / "{model}_{dataset}_{runname}")]
    t0 = time.time()
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT,
                         timeout=6000)
    wall = time.time() - t0
    print(out.stdout[-2500:], flush=True)
    if out.returncode != 0:
        print(out.stderr[-3000:], flush=True)
        raise SystemExit(1)
    m = re.search(r"median ([0-9.]+) ms/epoch \(first epoch ([0-9.]+) ms",
                  out.stdout)
    block = {
        "train_n": N, "train_m_edges": M, "epochs": EPOCHS,
        "wall_s": round(wall, 1),
        "median_ms_per_epoch": float(m.group(1)) if m else None,
        "first_epoch_ms_incl_compile": float(m.group(2)) if m else None,
        "cli": " ".join(cmd[3:]),
    }
    art = ROOT / "docs" / "bench_attn_scale.json"
    data = json.loads(art.read_text())
    if isinstance(data, list):
        data = {"sizes": data}
    data[f"gat_train_{N // 1000}k"] = block
    art.write_text(json.dumps(data, indent=2))
    print(json.dumps(block, indent=2))


if __name__ == "__main__":
    main()
