"""Does BSR have a winning regime? (VERDICT r2 weak #4, adjudicated r4)

BSR loses to dense-MXU at 10K (auto picks dense) and its payload explodes
past ~100K on unclustered graphs. Its candidate niche: mid-size CLUSTERED
graphs — too big for the n² dense payload to be cheap, block-occupied
enough for the dense-block payload to be small. This probe builds that
exact regime (SBM, cluster reordering, sweep over cluster sizes) and races
BSR vs dense vs cootile vs segment in both precision modes. Dense is in
the race because it — not cootile — is what BSR must beat: both are
MXU-payload paths and BSR's only edge is payload_bytes < n²·itemsize.

Writes docs/bench_bsr_niche.json.

Usage: python workbench/probe_bsr_niche.py [n] [m_edges] [n_blocks ...]
"""
import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import interleaved_timeit
from bench_large import build_sbm_graph, count_bsr_blocks
from h2gcn_tpu.sparse import SparseMatrix, transforms
from h2gcn_tpu.sparse.matrix import spmm

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 240_000
BLOCK_COUNTS = [int(a) for a in sys.argv[3:]] or [40]
P_INS = [float(v) for v in os.environ.get('BSR_PINS', '0.9 0.99 1.0').split()]
F = 64

float(jnp.zeros(()))
print(f"backend={jax.default_backend()} n={N} m={M}")

report = {"n": N, "m_edges": M, "f": F,
          "platform": jax.default_backend(), "sweeps": []}

for n_blocks in BLOCK_COUNTS:
  for p_in in P_INS:
    A = build_sbm_graph(N, M, n_blocks=n_blocks, p_in=p_in, seed=0)
    hops = transforms.nhood_split(A, 2)
    a2 = transforms.normalize(hops[2])
    perm = transforms.cluster_order(a2, method="cluster")
    a2c = transforms.permute_graph(a2, perm)
    nb = count_bsr_blocks(a2c)
    payload = nb * 128 * 128 * 4 / 1e9
    dense_gb = N * N * 4 / 1e9
    entry = {
        "n_blocks": n_blocks, "p_in": p_in, "cluster_size": N // n_blocks,
        "hop2_nnz": int(a2.nnz), "bsr_blocks_128": int(nb),
        "payload_gb_f32": round(payload, 3),
        "dense_gb_f32": round(dense_gb, 3),
        "occ_nnz_per_block": round(a2.nnz / nb, 1),
    }
    print(f"n_blocks={n_blocks} p_in={p_in}: nnz={a2.nnz} blocks={nb} "
          f"payload={payload:.2f}GB (dense {dense_gb:.1f}GB) "
          f"occ={a2.nnz / nb:.0f}")
    if payload > 4.0:
        entry["skipped"] = "payload > 4GB"
        report["sweeps"].append(entry)
        continue

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    fn = jax.jit(lambda m, xx: spmm(m, xx))
    fns = {}
    for backend in ("bsr", "dense", "cootile", "segment"):
        for tag, kw in (("f32", dict(precision="highest")),
                        ("bf16", dict(precision="default",
                                      payload_dtype="bfloat16"))):
            if backend == "segment" and tag == "bf16":
                continue
            if backend in ("cootile", "dense"):
                kw = dict(precision=kw["precision"])
            if backend == "dense" and dense_gb > 4.0:
                continue
            m = SparseMatrix.from_scipy(a2c, backend=backend, **kw)
            fns[f"{backend}/{tag}"] = (lambda m=m: fn(m, x))
    res = interleaved_timeit(fns, rounds=3, iters=5, warmup=1)
    entry["ms"] = {k: round(t * 1e3, 3) for k, (t, _) in res.items()}
    entry["edges_per_s"] = {k: round(a2.nnz / t)
                            for k, (t, _) in res.items()}
    for key, (t, _) in sorted(res.items(), key=lambda kv: kv[1][0]):
        print(f"  {key}: {t * 1e3:.2f} ms | {a2.nnz / t / 1e6:.0f}M edges/s")
    entry["winner"] = min(res, key=lambda k: res[k][0])
    report["sweeps"].append(entry)
    del fns, res, x

out = pathlib.Path(__file__).resolve().parent.parent / "docs" / "bench_bsr_niche.json"
if out.exists():
    prior = json.load(open(out))
    seen = {(s["n_blocks"], s.get("p_in")) for s in report["sweeps"]}
    report["sweeps"] += [s for s in prior.get("sweeps", [])
                         if (s["n_blocks"], s.get("p_in")) not in seen]
    report["sweeps"].sort(key=lambda s: (s["n_blocks"], s.get("p_in") or 0))
with open(out, "w") as f:
    json.dump(report, f, indent=1)
print(f"wrote {out}")
