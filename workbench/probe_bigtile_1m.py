"""Big-tile cootile probe at the 1M ultra-sparse regime (VERDICT r2 #3).

Derivation: at occupancy << 1 the per-edge MXU cost of tile
densification is 4*f*e_b*n^2/(nnz*T) — it FALLS with T (occupancy rises
with T^2, one-hot cost only with T) — and consecutive chunks of one tile
hit Mosaic's same-block-index pipeline cache, so big tiles don't pay
per-chunk x DMAs either. auto_geometry's 2048 cap + the 16MB scoped-VMEM
default were the binding constraints, not hardware.

Usage: python workbench/probe_bigtile_1m.py [n] [m_edges]
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import build_graph, interleaved_timeit
from h2gcn_tpu.sparse import pallas_cootile as pc
from h2gcn_tpu.sparse import transforms

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 800_000
F = 64

float(jnp.zeros(()))
print(f"backend={jax.default_backend()} n={N} m={M}", flush=True)
A = build_graph(N, M, seed=0)
a2 = transforms.normalize(transforms.nhood_split(A, 2)[2]).tocsr()
print(f"hop2 nnz={a2.nnz}", flush=True)
rng = np.random.default_rng(1)
x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))

for prec, dt in (("default", "bf16"), ("highest", "f32")):
    fns, cts = {}, {}
    for tile, e_b in ((2048, 128), (4096, 128), (8192, 128), (8192, 256)):
        key = f"{tile},{e_b}"
        try:
            ct = pc.build_cootile(a2, tile=tile, e_b=e_b, dtype=dt, kb=8)
        except Exception as e:
            print(f"{key} build failed: {e}", flush=True)
            continue
        cts[key] = ct
        fns[key] = (lambda c: (lambda: pc.cootile_spmm(
            c, x, precision=prec)))(ct)
    res = interleaved_timeit(fns, rounds=3, iters=3, warmup=1)
    for key, ct in cts.items():
        t = res[key][0]
        chunks = sum(int(s.ctr.shape[0]) for s in ct.segments)
        print(f"{prec} ({key}): {t*1e3:.0f} ms | {a2.nnz/t/1e6:.0f}M e/s | "
              f"{chunks} chunks", flush=True)
