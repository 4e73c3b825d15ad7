"""Does locality reordering lift 1M-node gather attention?

The 1M attention rooflines sag to 0.16-0.29 (vs 0.34-0.64 at 90-120K)
because the [1M, 128] node tables no longer fit cache, so the per-slot
row gathers drop to the cold random rate (the row-latency study,
BENCHMARKS.md). The SpMM ladder's measured lever for exactly this is the
tile-clustering node permutation (`--reorder cluster`, 86M→338M e/s on
the 250K cootile study). This probe measures the SAME graph's gather
attention with and without `transforms.cluster_order` — sorted slot
streams turn the x/weight row gathers near-sequential.

Merges a `reorder_1m` block into docs/bench_attn_scale.json.

Usage: python workbench/probe_attn_reorder_1m.py [n m_edges]
"""
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import build_graph, interleaved_timeit
from h2gcn_tpu.sparse import transforms
from h2gcn_tpu.sparse.pallas_attention_gather import (build_gatherattn,
                                                      gat_attention_gather)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000
H, F = 8, 8

float(jnp.zeros(()))
print(f"backend={jax.default_backend()} n={N} m={M}", flush=True)

A = build_graph(N, M, seed=0)
support = transforms.add_eye(A).tocsr()
rng = np.random.default_rng(0)
f1 = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
f2 = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
h = jnp.asarray(rng.standard_normal((N, H * F)).astype(np.float32))

report = {"n": N, "m_edges": M, "nnz": int(support.nnz), "orders": {}}
timed = {}
for name in ("original", "cluster"):
    if name == "cluster":
        t0 = time.time()
        perm = transforms.cluster_order(support)
        sup = support[perm][:, perm].tocsr()
        report["reorder_s"] = round(time.time() - t0, 1)
    else:
        sup = support
    t0 = time.time()
    ga = build_gatherattn(sup)
    report["orders"][name] = {
        "build_s": round(time.time() - t0, 1),
        "slots": int(ga.total_slots_fwd),
    }

    def fwd_fn(precision, ga=ga):
        @jax.jit
        def fn(ga, f1, f2, h):
            return gat_attention_gather(ga, f1, f2, h, num_heads=H,
                                        feat=F, n_out=N,
                                        precision=precision)
        return lambda: fn(ga, f1, f2, h)

    def step_fn(precision, ga=ga):
        @jax.jit
        def fn(ga, f1, f2, h):
            return jax.grad(lambda *x: jnp.sum(gat_attention_gather(
                ga, *x, num_heads=H, feat=F, n_out=N,
                precision=precision) ** 2), (0, 1, 2))(f1, f2, h)
        return lambda: fn(ga, f1, f2, h)

    # note: for the clustered row, f1/f2/h SHOULD be permuted too for the
    # output to be meaningful — but throughput only depends on the edge
    # STRUCTURE, and using the same tensors keeps inputs identical
    timed[f"fwd_df_{name}"] = fwd_fn("default")
    timed[f"fwdbwd_df_{name}"] = step_fn("default")

for nm, fn in timed.items():
    t0 = time.time()
    jax.block_until_ready(fn())
    print(f"{nm} compiled in {time.time() - t0:.0f}s", flush=True)
res = interleaved_timeit(timed, rounds=3, iters=2, warmup=1)
for k, (t, _) in res.items():
    report[k + "_ms"] = round(t * 1e3, 2)
report["fwd_speedup"] = round(
    res["fwd_df_original"][0] / res["fwd_df_cluster"][0], 2)
report["fwdbwd_speedup"] = round(
    res["fwdbwd_df_original"][0] / res["fwdbwd_df_cluster"][0], 2)
print(json.dumps(report, indent=1), flush=True)

art = pathlib.Path(__file__).resolve().parent.parent / "docs" / "bench_attn_scale.json"
doc = json.loads(art.read_text())
doc["reorder_1m"] = report
art.write_text(json.dumps(doc, indent=2))
print("merged reorder_1m")
