"""A/B: x-tile delivery via auto-pipelined slot operands vs manual DMA.

Regenerates the `_X_MODE` decision record in sparse/pallas_cootile.py:
"slots" (kb auto-pipelined BlockSpec operands) vs "manual" (in-kernel
double-buffered async copies from HBM, block i+1's copies started before
block i's waits). r2 on the 131K/8M probe measured slots 264M vs manual
242M edges/s at (512,128) and 219M vs 208M at (1024,256) — the pipeline's
lookahead hides the x DMAs better than the 2-deep manual scheme, so
"manual" stays an experimental knob.

Usage: python workbench/probe_xbuffering.py [n] [m_edges]
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import build_graph, interleaved_timeit
from h2gcn_tpu.sparse import pallas_cootile as pc

N = int(sys.argv[1]) if len(sys.argv) > 1 else 131_072
M = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
F = 64

float(jnp.zeros(()))
print(f"backend={jax.default_backend()} n={N} m={M}")

A = build_graph(N, M, seed=0)
print(f"nnz={A.nnz}")
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))

for tile, e_b in ((512, 128), (1024, 256)):
    ct = pc.build_cootile(A, tile=tile, e_b=e_b, dtype="bf16")
    fns = {}
    for mode in ("slots", "manual"):
        def run(m=mode, c=ct):
            old = pc._X_MODE
            pc._X_MODE = m
            try:
                return pc.cootile_spmm(c, x, precision="default")
            finally:
                pc._X_MODE = old
        fns[mode] = run
    res = interleaved_timeit(fns, rounds=3, iters=5, warmup=2)
    for mode in ("slots", "manual"):
        t = res[mode][0]
        print(f"(tile={tile}, e_b={e_b}, kb={ct.kb}) {mode}: "
              f"{t * 1e3:.1f} ms | {A.nnz / t / 1e6:.0f}M edges/s")
