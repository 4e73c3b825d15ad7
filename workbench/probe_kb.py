"""kb (chunks per grid step) sweep for the COO-tile SpMM kernel.

Regenerates the kb-amortization numbers cited in docs/BENCHMARKS.md and
sparse/pallas_cootile.py: on the 250K-node Â₂ (the VERDICT #3 regime) the
per-step fixed cost stays ~0.5-0.7 µs as the block deepens, so kb = 8/16/32
amortizes it almost linearly (r2 measured 227/266/289M edges/s) — kb is
bounded by the VMEM the double-buffered slot x tiles occupy.

Usage: python workbench/probe_kb.py [n] [m_edges] [tile] [e_b]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
TILE = int(sys.argv[3]) if len(sys.argv) > 3 else 512
E_B = int(sys.argv[4]) if len(sys.argv) > 4 else 128
F = 64

float(jnp.zeros(()))
print(f"backend={jax.default_backend()} n={N} m={M} tile={TILE} e_b={E_B}")

A = build_graph(N, M, seed=0)
hops = transforms.nhood_split(A, 2)
a2 = transforms.normalize(hops[2]).tocsr()
print(f"hop2 nnz={a2.nnz}")

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))

fns = {}
cts = {}
for kb in (8, 16, 32):
    vmem = kb * TILE * pc.F_TILE * 2 * 2 + 2 * TILE * pc.F_TILE * 4
    if vmem > pc._VMEM_BUDGET:
        print(f"kb={kb}: slot VMEM {vmem / 1e6:.1f}MB over budget, skipped")
        continue
    ct = pc.build_cootile(a2, tile=TILE, e_b=E_B, dtype="bf16", kb=kb)
    cts[kb] = ct
    fns[f"kb{kb}"] = (lambda c: (lambda: pc.cootile_spmm(
        c, x, precision="default")))(ct)

res = interleaved_timeit(fns, rounds=3, iters=5, warmup=2)
for kb, ct in cts.items():
    t = res[f"kb{kb}"][0]
    chunks = sum(int(s.ctr.shape[0]) for s in ct.segments)
    print(f"kb={kb}: {t * 1e3:.1f} ms | {a2.nnz / t / 1e6:.0f}M edges/s | "
          f"{chunks} chunks, {chunks // kb} steps, "
          f"{t / (chunks // kb) * 1e6:.2f} us/step")
