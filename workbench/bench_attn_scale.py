"""Large-graph fused GAT attention benchmark: COO-chunk kernel vs segment.

VERDICT r2 item 1: the fused path must work (and win) at 120K nodes, a
scale where the BSR payload is infeasible (~56GB) and the reference SpGAT
(baselines/GAT/utils/layers.py:53-100) relies on scatter ops this hardware
serializes. Measures, chained-dispatch methodology (bench.py):

  * segment composition (models/GAT.py unfused math), fwd and fwd+bwd
  * COO-chunk fused kernel, precision="highest" (parity) and "default"
    (bf16 head contractions), fwd and fwd+bwd

Emits docs/bench_attn_scale.json.

Usage: python workbench/bench_attn_scale.py [n] [m_edges]
"""
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import _block, build_graph, interleaved_timeit
from h2gcn_tpu.models.GAT import segment_softmax
from h2gcn_tpu.sparse import SparseMatrix, transforms
from h2gcn_tpu.sparse.pallas_attention_coo import (build_attn_coo,
                                                   gat_attention_coo)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
H, F = 8, 8

float(jnp.zeros(()))  # readback warm-up
print(f"backend={jax.default_backend()} n={N} m_edges={M} heads={H}x{F}")

A = build_graph(N, M, seed=0)
support = transforms.add_eye(A).tocsr()
nnz = support.nnz
print(f"support nnz={nnz}")

t0 = time.time()
ac = build_attn_coo(support, tile=256, e_b=128)
t_build = time.time() - t0
print(f"attn_coo build: {t_build:.1f}s, chunks={ac.num_chunks}, "
      f"segments fwd={len(ac.fwd)} bwd={len(ac.bwd)}")

adj = SparseMatrix.from_scipy(support, backend="segment")

rng = np.random.default_rng(0)
f1 = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
f2 = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
h = jnp.asarray(rng.standard_normal((N, H * F)).astype(np.float32))


@jax.jit
def seg_fwd(adj, f1, f2, h):
    rows, cols = adj.rows, adj.cols
    valid = adj.vals > 0
    outs = []
    for k in range(H):
        e = jax.nn.leaky_relu(f1[rows, k] + f2[cols, k], 0.2)
        alpha = segment_softmax(e, rows, N, valid)
        outs.append(jax.ops.segment_sum(
            alpha[:, None] * h[cols, k * F:(k + 1) * F], rows,
            num_segments=N, indices_are_sorted=True))
    return jnp.concatenate(outs, axis=1)


def make_coo_fwd(precision):
    @jax.jit
    def fn(ac, f1, f2, h):
        return gat_attention_coo(ac, f1, f2, h, num_heads=H, feat=F,
                                 n_out=N, precision=precision)
    return fn


def make_coo_step(precision):
    @jax.jit
    def fn(ac, f1, f2, h):
        return jax.grad(lambda *x: jnp.sum(gat_attention_coo(
            ac, *x, num_heads=H, feat=F, n_out=N,
            precision=precision) ** 2), (0, 1, 2))(f1, f2, h)
    return fn


@jax.jit
def seg_step(adj, f1, f2, h):
    return jax.grad(lambda *x: jnp.sum(seg_fwd(adj, *x) ** 2),
                    (0, 1, 2))(f1, f2, h)


coo_fwd_hi = make_coo_fwd("highest")
coo_fwd_df = make_coo_fwd("default")
coo_step_hi = make_coo_step("highest")
coo_step_df = make_coo_step("default")

# correctness cross-check before timing
o_coo = coo_fwd_hi(ac, f1, f2, h)
o_seg = seg_fwd(adj, f1, f2, h)
err = float(jnp.max(jnp.abs(o_coo - o_seg)))
scale = float(jnp.max(jnp.abs(o_seg)))
print(f"fused-hi vs segment max abs err: {err:.2e} (scale {scale:.1f})")
err_df = float(jnp.max(jnp.abs(coo_fwd_df(ac, f1, f2, h) - o_seg)))
print(f"fused-default vs segment max abs err: {err_df:.2e}")

fns = {
    "coo_fwd_highest": lambda: coo_fwd_hi(ac, f1, f2, h),
    "coo_fwd_default": lambda: coo_fwd_df(ac, f1, f2, h),
    "coo_fwdbwd_highest": lambda: coo_step_hi(ac, f1, f2, h),
    "coo_fwdbwd_default": lambda: coo_step_df(ac, f1, f2, h),
    "segment_fwd": lambda: seg_fwd(adj, f1, f2, h),
    "segment_fwdbwd": lambda: seg_step(adj, f1, f2, h),
}
res = interleaved_timeit(fns, rounds=3, iters=2, warmup=1)
out = {
    "n": N, "m_edges": M, "nnz": int(nnz), "heads": H, "feat": F,
    "tile": ac.tile, "e_b": ac.e_b, "chunks": ac.num_chunks,
    "build_s": round(t_build, 2),
    "fused_vs_segment_max_abs_err": err,
    "fused_default_vs_segment_max_abs_err": err_df,
    "times_s": {k: round(v[0], 5) for k, v in res.items()},
}
out["speedup_fwd_highest"] = round(
    res["segment_fwd"][0] / res["coo_fwd_highest"][0], 1)
out["speedup_fwd_default"] = round(
    res["segment_fwd"][0] / res["coo_fwd_default"][0], 1)
out["speedup_fwdbwd_default"] = round(
    res["segment_fwdbwd"][0] / res["coo_fwdbwd_default"][0], 1)
print(json.dumps(out, indent=2))
art = pathlib.Path(__file__).resolve().parent.parent / "docs"
(art / "bench_attn_scale.json").write_text(json.dumps(out, indent=2))
