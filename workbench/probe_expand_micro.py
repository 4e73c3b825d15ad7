"""Micro-decomposition of the gather-attention weighting epilogue.

parts_120k v2/v3 (docs/bench_attn_parts.json) show a ~17 ms
dtype-invariant overhead between the raw combine (8.6/5.7 ms) and the
weighted combine (25.6/23.0) — bigger than (expansion dot ≈ 2) +
(w slot-gather ≈ 2.6) + (multiply ≈ 2.7) predicts. This times each stage
alone: the MXU one-hot expansion at both precisions, the slot gather of
the expanded table, the gathered×w multiply, and the fused
gather+gather+multiply chain the production epilogue wants XLA to form.

Usage: python workbench/probe_expand_micro.py [n m_edges]
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import build_graph, interleaved_timeit


def _expand_edge(w_e, H, F, f_pad, exact):
    # the round-5 v2 edge-table MXU one-hot expansion this probe measured
    # (one of the superseded weight-delivery designs — see BENCHMARKS.md
    # "alpha-delivery floor study"); self-contained here
    lanes = np.arange(f_pad)
    oh = (((lanes[None, :] // F) == np.arange(H)[:, None])
          & (lanes[None, :] < H * F)).astype(np.float32)
    az = jnp.concatenate(
        [w_e.astype(jnp.float32), jnp.zeros((1, w_e.shape[1]),
                                            jnp.float32)], axis=0)
    import jax as _jax

    return jnp.dot(az, jnp.asarray(oh),
                   precision=_jax.lax.Precision.HIGHEST)
from h2gcn_tpu.sparse import transforms
from h2gcn_tpu.sparse import pallas_attention_gather as pag

N = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
H, F, F_PAD = 8, 8, 128

float(jnp.zeros(()))
print(f"backend={jax.default_backend()} n={N} m={M}", flush=True)

A = build_graph(N, M, seed=0)
support = transforms.add_eye(A).tocsr()
ga = pag.build_gatherattn(support)
E = ga.num_edges
seg = ga.fwd.segments[0]
S = int(seg.cols.shape[0])
print(f"E={E} S={S}", flush=True)

rng = np.random.default_rng(0)
alpha = jnp.asarray(rng.random((E, H)).astype(np.float32))
x = jnp.asarray(rng.standard_normal((N, F_PAD)).astype(np.float32))
idx = jax.block_until_ready(jax.jit(
    lambda s2e: jnp.pad(jax.lax.slice_in_dim(s2e, seg.slot_lo, seg.slot_hi),
                        (0, S - (seg.slot_hi - seg.slot_lo)),
                        constant_values=E))(ga.slot2edge_fwd))
wx_hi = jax.block_until_ready(jax.jit(
    lambda a: _expand_edge(a, H, F, F_PAD, True))(alpha))
gathered = jax.block_until_ready(jax.jit(lambda x: x[seg.cols])(x))
w_slots = jax.block_until_ready(jax.jit(lambda wx, i: wx[i])(wx_hi, idx))

fns = {
    "expand_hi": jax.jit(
        lambda a: _expand_edge(a, H, F, F_PAD, True)),
    "expand_df": jax.jit(
        lambda a: _expand_edge(a, H, F, F_PAD, False)),
    "wgather": jax.jit(lambda wx, idx: wx[idx]),
    "multiply": jax.jit(lambda g, w: g * w),
    "wgather_mult": jax.jit(lambda g, wx, idx: g * wx[idx]),
    "full_epilogue_hi": jax.jit(
        lambda x, a, idx: x[seg.cols]
        * _expand_edge(a, H, F, F_PAD, True)[idx]),
}
timed = {
    "expand_hi": lambda: fns["expand_hi"](alpha),
    "expand_df": lambda: fns["expand_df"](alpha),
    "wgather": lambda: fns["wgather"](wx_hi, idx),
    "multiply": lambda: fns["multiply"](gathered, w_slots),
    "wgather_mult": lambda: fns["wgather_mult"](gathered, wx_hi, idx),
    "full_epilogue_hi": lambda: fns["full_epilogue_hi"](x, alpha, idx),
}
for nm, fn in timed.items():
    jax.block_until_ready(fn())
    print(nm, "compiled", flush=True)
res = interleaved_timeit(timed, rounds=3, iters=3, warmup=1)
for k, (t, _) in res.items():
    print(f"{k}: {t * 1e3:.2f} ms", flush=True)
