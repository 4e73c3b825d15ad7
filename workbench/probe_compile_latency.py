"""Compile-latency analysis for the big gather-attention programs.

VERDICT r4 weak #8: 87 s to compile the 40K fwd+bwd (7.75M slots) and
22.4 s first-epoch at 120K are documented but unanalyzed — could the
per-segment Python loop be ``lax.scan``-folded to compile faster? This
probe measures what actually scales the compile time, holding the GRAPH
fixed (40K/4M edges) and varying the SEGMENT COUNT via the gscatter step
cap: if compile time grows with segments (more unrolled pallas_call
instances), scan-folding would help; if it is flat, the cost is the
big-shape XLA program + Mosaic kernel compile and folding would buy
nothing.

Measures jit lower+compile wall time (no execution) for the gather
forward at max_steps ∈ {2048 (production, 4 segs), 1024, 512} and the
StableHLO text size of each. Writes docs/compile_latency.json.

Usage: python workbench/probe_compile_latency.py [n m_edges]
"""
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import build_graph
from h2gcn_tpu.sparse import transforms
from h2gcn_tpu.sparse import pallas_gscatter as gsm
from h2gcn_tpu.sparse.pallas_attention_gather import (build_gatherattn,
                                                      gat_attention_gather)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
H, F = 8, 8

float(jnp.zeros(()))
print(f"backend={jax.default_backend()} n={N} m={M}", flush=True)

A = build_graph(N, M, seed=0)
support = transforms.add_eye(A).tocsr()
rng = np.random.default_rng(0)
f1 = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
f2 = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
h = jnp.asarray(rng.standard_normal((N, H * F)).astype(np.float32))

rows = []
for max_steps in (2048, 1024, 512):
    old = gsm._MAX_STEPS
    gsm._MAX_STEPS = max_steps
    try:
        t0 = time.time()
        ga = build_gatherattn(support)
        t_build = time.time() - t0
    finally:
        gsm._MAX_STEPS = old

    def fwd(ga, f1, f2, h):
        return gat_attention_gather(ga, f1, f2, h, num_heads=H, feat=F,
                                    n_out=N, precision="highest")

    t0 = time.time()
    lowered = jax.jit(fwd).lower(ga, f1, f2, h)
    t_lower = time.time() - t0
    hlo_kb = len(lowered.as_text()) // 1024
    t0 = time.time()
    lowered.compile()
    t_compile = time.time() - t0
    row = {"max_steps": max_steps,
           "segments_fwd": len(ga.fwd.segments),
           "segments_bwd": len(ga.bwd.segments),
           "build_s": round(t_build, 1),
           "lower_s": round(t_lower, 2),
           "stablehlo_kb": hlo_kb,
           "compile_s": round(t_compile, 1)}
    rows.append(row)
    print(json.dumps(row), flush=True)

out = {"n": N, "m_edges": M, "nnz": int(support.nnz),
       "program": "gather attention forward (highest)", "rows": rows}
path = (pathlib.Path(__file__).resolve().parent.parent / "docs"
        / "compile_latency.json")
doc = json.loads(path.read_text()) if path.exists() else {}
doc[f"gather_fwd_{N // 1000}k"] = out
path.write_text(json.dumps(doc, indent=1))
print(f"merged gather_fwd_{N // 1000}k into {path}")
