"""Where does gather-attention forward time go? (roofline follow-up)

docs/bench_attn_scale.json has the gather forward at 0.11-0.19 of its
speed-of-light. This probe decomposes the 120K forward into its stages,
each jitted separately with chained-dispatch timing:

  * logits+softmax (edge-major scalar gathers + segment max/sum)
  * alpha slot scatter (the [E,H] -> [slots,H] .at[].set)
  * combine (weighted gather + one-hot MXU scatter kernel)
  * full forward (the production composition)

Writes docs/bench_attn_parts.json.

Usage: python workbench/probe_attn_parts.py [n m_edges]
"""
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import build_graph, interleaved_timeit
from h2gcn_tpu.sparse import transforms
from h2gcn_tpu.sparse import pallas_attention_gather as pag

N = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
H, F = 8, 8

float(jnp.zeros(()))
print(f"backend={jax.default_backend()} n={N} m={M}", flush=True)

A = build_graph(N, M, seed=0)
support = transforms.add_eye(A).tocsr()
ga = pag.build_gatherattn(support)
print("built", flush=True)
E = ga.num_edges

rng = np.random.default_rng(0)
f1 = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
f2 = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
h = jnp.asarray(rng.standard_normal((N, H * F)).astype(np.float32))


@jax.jit
def softmax_only(ga, f1, f2):
    return pag.gather_attention_coefficients(ga, f1, f2)


alpha = jax.block_until_ready(softmax_only(ga, f1, f2))
print("softmax compiled", flush=True)


@jax.jit
def scatter_only(ga, alpha):
    return pag._scatter_alpha(ga.slot2edge_fwd, alpha)


def combine_fn(precision):
    exact = precision == "highest"

    @jax.jit
    def fn(ga, alpha, h):
        return pag._make_combine(ga, H, F, exact, False)(alpha, h)

    return fn


def full_fn(precision):
    @jax.jit
    def fn(ga, f1, f2, h):
        return pag.gat_attention_gather(ga, f1, f2, h, num_heads=H, feat=F,
                                        n_out=N, precision=precision)

    return fn


comb_hi, comb_df = combine_fn("highest"), combine_fn("default")
full_hi, full_df = full_fn("highest"), full_fn("default")

for nm, fn in (("scatter", lambda: scatter_only(ga, alpha)),
               ("comb_hi", lambda: comb_hi(ga, alpha, h)),
               ("comb_df", lambda: comb_df(ga, alpha, h)),
               ("full_hi", lambda: full_hi(ga, f1, f2, h)),
               ("full_df", lambda: full_df(ga, f1, f2, h))):
    jax.block_until_ready(fn())
    print(nm, "compiled", flush=True)

res = interleaved_timeit({
    "softmax_only": lambda: softmax_only(ga, f1, f2),
    "alpha_scatter": lambda: scatter_only(ga, alpha),
    "combine_highest": lambda: comb_hi(ga, alpha, h),
    "combine_default": lambda: comb_df(ga, alpha, h),
    "full_fwd_highest": lambda: full_hi(ga, f1, f2, h),
    "full_fwd_default": lambda: full_df(ga, f1, f2, h),
}, rounds=3, iters=3, warmup=1)

report = {"n": N, "m_edges": M, "nnz": int(support.nnz), "heads": H,
          "feat": F, "slots": int(ga.total_slots_fwd),
          "ms": {k: round(t * 1e3, 2) for k, (t, _) in res.items()}}
report["sum_of_parts_highest_ms"] = round(
    (res["softmax_only"][0] + res["alpha_scatter"][0]
     + res["combine_highest"][0]) * 1e3, 2)
print(json.dumps(report, indent=1))
out = pathlib.Path(__file__).resolve().parent.parent / "docs" / "bench_attn_parts.json"
out.write_text(json.dumps(report, indent=1))
print(f"wrote {out}")
