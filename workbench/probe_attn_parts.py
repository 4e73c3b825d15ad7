"""Where does gather-attention time go? Per-precision fwd AND bwd parts.

Round-4 found the forward split (docs/bench_attn_parts.json v1); round 5
(VERDICT task #2) asks why bf16 runs at 0.34-0.38 of its roofline while
f32 reaches 0.59-0.64 — the halved ``sol_ms`` barely moves the achieved
time. This probe decomposes BOTH directions per precision, each stage
jitted separately with chained-dispatch timing:

  forward:
  * logits+softmax (edge-major scalar gathers + segment max/sum)
  * alpha slot fill (the [E,H] → [slots,H] inverse-map gather)
  * raw combine (``gscatter_spmm`` on the same tables, vals=1 — the
    kernel + raw gather WITHOUT the XLA-side α-weighting epilogue)
  * α-weighted combine (the production ``_make_combine`` pass)
  * full forward
  The (weighted − raw) delta isolates the α-broadcast/multiply streams —
  the [slots, f_pad] ``repeat`` + multiply XLA materializes between the
  gather and the kernel, which the roofline model omits.

  backward (the three extra passes of the whole-attention VJP):
  * dh (plain combine over the TRANSPOSE tables)
  * df1 (augmented combine over forward tables)
  * df2 (augmented combine over transpose tables)
  * full fwd+bwd

MERGES docs/bench_attn_parts.json by regime key (evidence artifacts are
never overwritten — bench_attn_scale.py rule).

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
from h2gcn_tpu.sparse.pallas_gscatter import gscatter_spmm

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
gN = jnp.asarray(rng.standard_normal((N, H * F)).astype(np.float32))
gl = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
alpha_e = jnp.asarray(
    rng.random((E, H)).astype(np.float32))  # stand-in per-edge weights


@jax.jit
def softmax_only(ga, f1, f2):
    return pag.gather_attention_coefficients(ga, f1, f2)


@jax.jit
def fill_only(ga, alpha):
    return pag._scatter_alpha(ga.slot2edge_fwd, alpha)


def _prep(x, width, exact):
    xp = x.astype(jnp.float32)
    if width != xp.shape[1]:
        xp = jnp.pad(xp, ((0, 0), (0, width - xp.shape[1])))
    return xp if exact else xp.astype(jnp.bfloat16)


F_PAD = 128
F_PAD_AUG = 128  # H*(F+1) = 72 → one lane tile


def make_fns(precision):
    exact = precision == "highest"

    @jax.jit
    def raw_combine(ga, h):
        # vals=1 tables ⇒ this IS the unweighted combine: raw gather +
        # kernel, none of the α-weighting epilogue
        return gscatter_spmm(ga.fwd, h, precision=precision)

    @jax.jit
    def combine(ga, alpha, h):
        return pag._make_combine(ga, H, F, exact, False)(alpha, h)

    @jax.jit
    def dh_pass(ga, alpha, g):
        aw_b = pag._scatter_alpha(ga.slot2edge_bwd, alpha)
        return pag._weighted_combine(ga.bwd, aw_b, _prep(g, F_PAD, exact),
                                     H, F, exact, False)

    @jax.jit
    def df1_pass(ga, alpha, h):
        aw = pag._scatter_alpha(ga.slot2edge_fwd, alpha)
        xa = pag._augx(h, jnp.ones((h.shape[0], H), jnp.float32), H, F)
        return pag._weighted_combine_aug(
            ga.fwd, aw, aw, _prep(xa, F_PAD_AUG, exact), H, F, exact, False)

    @jax.jit
    def df2_pass(ga, alpha, gN, gl):
        aw = pag._scatter_alpha(ga.slot2edge_bwd, alpha)
        xa = pag._augx(gN, gl, H, F)
        return pag._weighted_combine_aug(
            ga.bwd, aw, aw, _prep(xa, F_PAD_AUG, exact), H, F, exact, False)

    @jax.jit
    def full_fwd(ga, f1, f2, h):
        return pag.gat_attention_gather(ga, f1, f2, h, num_heads=H, feat=F,
                                        n_out=N, precision=precision)

    @jax.jit
    def full_fwdbwd(ga, f1, f2, h):
        return jax.grad(lambda *x: jnp.sum(pag.gat_attention_gather(
            ga, *x, num_heads=H, feat=F, n_out=N,
            precision=precision) ** 2), (0, 1, 2))(f1, f2, h)

    return dict(raw_combine=raw_combine, combine=combine, dh=dh_pass,
                df1=df1_pass, df2=df2_pass, full_fwd=full_fwd,
                full_fwdbwd=full_fwdbwd)


alpha = jax.block_until_ready(softmax_only(ga, f1, f2))
print("softmax compiled", flush=True)

timed = {"softmax_only": lambda: softmax_only(ga, f1, f2),
         "alpha_fill": lambda: fill_only(ga, alpha_e)}
for tag in ("highest", "default"):
    fns = make_fns(tag)
    sfx = "_hi" if tag == "highest" else "_df"
    timed.update({
        f"raw_combine{sfx}": lambda fns=fns: fns["raw_combine"](ga, h),
        f"combine{sfx}": lambda fns=fns: fns["combine"](ga, alpha_e, h),
        f"dh{sfx}": lambda fns=fns: fns["dh"](ga, alpha_e, gN),
        f"df1{sfx}": lambda fns=fns: fns["df1"](ga, alpha_e, h),
        f"df2{sfx}": lambda fns=fns: fns["df2"](ga, alpha_e, gN, gl),
        f"full_fwd{sfx}": lambda fns=fns: fns["full_fwd"](ga, f1, f2, h),
        f"full_fwdbwd{sfx}":
            lambda fns=fns: fns["full_fwdbwd"](ga, f1, f2, h),
    })

for nm, fn in timed.items():
    jax.block_until_ready(fn())
    print(nm, "compiled", flush=True)

res = interleaved_timeit(timed, rounds=3, iters=2, warmup=1)

report = {"n": N, "m_edges": M, "nnz": int(support.nnz), "heads": H,
          "feat": F, "slots_fwd": int(ga.total_slots_fwd),
          "slots_bwd": int(ga.total_slots_bwd),
          "ms": {k: round(t * 1e3, 2) for k, (t, _) in res.items()}}
ms = report["ms"]
for sfx in ("_hi", "_df"):
    report[f"alpha_weighting_overhead{sfx}_ms"] = round(
        ms[f"combine{sfx}"] - ms[f"raw_combine{sfx}"], 2)
    report[f"sum_bwd_passes{sfx}_ms"] = round(
        ms[f"dh{sfx}"] + ms[f"df1{sfx}"] + ms[f"df2{sfx}"], 2)
print(json.dumps(report, indent=1))
out = (pathlib.Path(__file__).resolve().parent.parent / "docs"
       / "bench_attn_parts.json")
doc = json.loads(out.read_text()) if out.exists() else {}
if "ms" in doc and "n" in doc:  # v1 single-report form → keyed
    doc = {f"fwd_v1_{doc['n'] // 1000}k": doc}
doc[f"parts_{N // 1000}k"] = report
out.write_text(json.dumps(doc, indent=1))
print(f"merged parts_{N // 1000}k into {out}")
