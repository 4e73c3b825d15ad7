"""Feasibility probe for IN-KERNEL attention weighting.

Decides the final gather-attention design: the weight stream enters the
Pallas kernel as a dense [H2, S] array (46-92MB — no [S,128]
materialization at all) and is lane-expanded on the MXU per chunk via a
dim-0-contracting dot_general with an iota-built one-hot. Two unknowns:

1. producing [H2, S]: (a) minor-axis gather ``tableT[:, idx]`` from a
   small [H2, n] node table, vs (b) slot-major [S, H2] chain + one
   transpose — which is cheaper on this stack?
2. does Mosaic compile ``dot_general(aw_k, ohj, (((0,), (0,)), ((), ())))``
   (contracting the sublane dim) and at what cost per step?

Usage: python workbench/probe_inkernel_feas.py [n m_edges]
"""
import functools
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build_graph, interleaved_timeit
from h2gcn_tpu.sparse import transforms
from h2gcn_tpu.sparse import pallas_attention_gather as pag

N = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
H, F, F_TILE = 8, 8, 128
H2 = 2 * H

float(jnp.zeros(()))
print(f"backend={jax.default_backend()} n={N} m={M}", flush=True)

A = build_graph(N, M, seed=0)
support = transforms.add_eye(A).tocsr()
ga = pag.build_gatherattn(support)
S = int(ga.total_slots_fwd)
rng = np.random.default_rng(0)
f1 = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
f2 = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
tblT = jnp.asarray(rng.standard_normal((H2, N)).astype(np.float32))
slotH2 = jnp.asarray(rng.standard_normal((S, H2)).astype(np.float32))
# slot-space edge endpoints (built locally — one of the superseded
# designs carried these on GatherAttn)
_rs = np.zeros(S, np.int32); _cs = np.zeros(S, np.int32)
_rs[np.asarray(ga.slot_fwd)] = np.asarray(ga.rows)
_cs[np.asarray(ga.slot_fwd)] = np.asarray(ga.cols)
rs, cs = jnp.asarray(_rs), jnp.asarray(_cs)

# 1a. minor-axis gather: [H2, n] table → [H2, S]
gather_minor = jax.jit(lambda t, i: jnp.take(t, i, axis=1))
# 1b. slot-major score chain + transpose
chain_T = jax.jit(lambda f1, f2, rs, cs: (
    jnp.exp(jnp.minimum(f1[rs] + f2[cs], 0.0))).T)
# plain transpose of a materialized [S, H2]
transpose_only = jax.jit(lambda x: x.T)
# slot-major chain WITHOUT transpose (baseline)
chain_slotmajor = jax.jit(lambda f1, f2, rs, cs:
                          jnp.exp(jnp.minimum(f1[rs] + f2[cs], 0.0)))


# 2. Mosaic kernel with in-kernel one-hot expansion via dot_general
def _kernel(g_ref, aw_ref, o_ref):
    lg = jax.lax.broadcasted_iota(jnp.int32, (H2, F_TILE), 1)
    rr = jax.lax.broadcasted_iota(jnp.int32, (H2, F_TILE), 0)
    row = lg // F
    ohj = jnp.where((rr == row) & (lg < H * F), 1.0, 0.0
                    ).astype(jnp.bfloat16)
    aw = aw_ref[...]
    w = jax.lax.dot_general(
        aw.astype(jnp.bfloat16), ohj, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [e_b, F_TILE]
    o_ref[...] = g_ref[...].astype(jnp.float32) * w


def _mk(S, e_b=128):
    steps = S // e_b
    return pl.pallas_call(
        _kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec((e_b, F_TILE), lambda i: (i, 0)),
                  pl.BlockSpec((H2, e_b), lambda i: (0, i))],
        out_specs=pl.BlockSpec((e_b, F_TILE), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((S, F_TILE), jnp.float32),
    )


Sr = (S // 128) * 128
g = jnp.asarray(rng.standard_normal((Sr, F_TILE)).astype(np.float32))
awT = jnp.asarray(rng.standard_normal((H2, Sr)).astype(np.float32))
kern = jax.jit(lambda g, a: _mk(Sr)(g, a))
mult_baseline = jax.jit(lambda g, w: g * w)  # XLA multiply, w prebuilt
w_full = jnp.asarray(rng.standard_normal((Sr, F_TILE)).astype(np.float32))

timed = {
    "gather_minor_H2": lambda: gather_minor(tblT, cs),
    "chain_slotmajor": lambda: chain_slotmajor(f1, f2, rs, cs),
    "chain_plus_T": lambda: chain_T(f1, f2, rs, cs),
    "transpose_SxH2": lambda: transpose_only(slotH2),
    "kernel_inkernel_expand": lambda: kern(g, awT),
    "xla_mult_baseline": lambda: mult_baseline(g, w_full),
}
for nm, fn in timed.items():
    try:
        jax.block_until_ready(fn())
        print(nm, "compiled", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{nm} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        timed[nm] = None
res = interleaved_timeit({k: v for k, v in timed.items() if v},
                         rounds=3, iters=3, warmup=1)
for k, (t, _) in res.items():
    print(f"{k}: {t * 1e3:.2f} ms", flush=True)
