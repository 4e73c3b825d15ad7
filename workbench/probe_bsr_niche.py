"""Does BSR have a winning regime? (VERDICT r2 weak #4)

BSR loses to dense-MXU at 10K (auto picks dense) and its payload explodes
past ~100K on unclustered graphs. Its candidate niche: mid-size CLUSTERED
graphs — too big for the n² dense payload, block-occupied enough for the
dense-block payload to be small. This probe builds that exact regime (SBM
with cluster reordering) and races BSR vs cootile vs segment in both
precision modes.

Usage: python workbench/probe_bsr_niche.py [n] [m_edges]
"""
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
F = 64

float(jnp.zeros(()))
print(f"backend={jax.default_backend()} n={N} m={M}")
A = build_sbm_graph(N, M, n_blocks=max(1, N // 1000), seed=0)
hops = transforms.nhood_split(A, 2)
a2 = transforms.normalize(hops[2])
perm = transforms.cluster_order(a2, method="cluster")
a2c = transforms.permute_graph(a2, perm)
nb = count_bsr_blocks(a2c)
payload = nb * 128 * 128 * 4 / 1e9
print(f"hop2 nnz={a2.nnz}, clustered 128-blocks={nb} "
      f"(payload {payload:.2f}GB f32, "
      f"occ {a2.nnz / nb:.0f} nnz/block); dense would be "
      f"{N * N * 4 / 1e9:.0f}GB")
assert payload < 4.0, "payload infeasible - not a BSR regime"

rng = np.random.default_rng(1)
x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
fn = jax.jit(lambda m, xx: spmm(m, xx))
fns, mats = {}, {}
for backend in ("bsr", "cootile", "segment"):
    for tag, kw in (("f32", dict(precision="highest")),
                    ("bf16", dict(precision="default",
                                  payload_dtype="bfloat16"))):
        if backend == "segment" and tag == "bf16":
            continue
        if backend == "cootile":
            kw = dict(precision=kw["precision"])
        m = SparseMatrix.from_scipy(a2c, backend=backend, **kw)
        key = f"{backend}/{tag}"
        mats[key] = m
        fns[key] = (lambda m=m: fn(m, x))
res = interleaved_timeit(fns, rounds=3, iters=5, warmup=1)
for key, (t, _) in sorted(res.items(), key=lambda kv: kv[1][0]):
    print(f"{key}: {t * 1e3:.2f} ms | {a2.nnz / t / 1e6:.0f}M edges/s")
