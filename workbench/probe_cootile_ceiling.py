"""250K cootile: push past 0.65 of HBM SoL or pin the ceiling (VERDICT r4
task #8).

The 250K cootile-cluster/bf16 number has sat at ~0.64-0.67 of its HBM
roofline for two tuning rounds. This probe (a) decomposes the achieved
time into the calibrated cost model's three terms — MXU densification,
fixed per-step overhead, and the unhidden fraction of per-chunk x-tile
DMA — for the auto-chosen geometry, and (b) races the one untried lever:
kb beyond the candidate list (more pipeline lookahead per output tile,
more slot operands in flight) plus the neighboring e_b/tile corners, to
test whether any geometry outside the swept grid moves the number.

If no variant beats auto by >5%, the artifact records the model's account
of where the time goes as the measured ceiling explanation.

Writes docs/bench_cootile_ceiling.json.

Usage: python workbench/probe_cootile_ceiling.py [n] [m_edges]
"""
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import build_graph, interleaved_timeit, tpu_hbm_bw
from h2gcn_tpu.sparse import transforms
from h2gcn_tpu.sparse import pallas_cootile as pc

N = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
F = 64

float(jnp.zeros(()))
print(f"backend={jax.default_backend()} n={N} m={M}", flush=True)

A = build_graph(N, M, seed=0)
hops = transforms.nhood_split(A, 2)
a2 = transforms.normalize(hops[2])
perm = transforms.cluster_order(a2, method="cluster")
a2c = transforms.permute_graph(a2, perm)
print(f"hop2 nnz={a2c.nnz}", flush=True)

rng = np.random.default_rng(1)
x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
bw, gen = tpu_hbm_bw()

auto_geo = pc.auto_geometry(a2c, f=F, dtype="bf16")
print(f"auto geometry: {auto_geo}", flush=True)

# variants: auto + wider kb (outside the swept candidate list) + corners
variants = {f"auto{auto_geo}": auto_geo}
t0, e0, k0 = auto_geo
for geo in [(t0, e0, 64), (t0, e0 * 2, k0), (t0 * 2, e0, k0),
            (t0, e0, k0 * 2) if k0 * 2 != 64 else (t0 // 2, e0, k0)]:
    variants[f"geo{geo}"] = geo

report = {"n": N, "m_edges": M, "f": F, "nnz": int(a2c.nnz),
          "tpu_generation": gen, "auto_geometry": list(auto_geo),
          "variants": {}}

fns = {}
built = {}
for name, (t, e_b, kb) in variants.items():
    if name in built:
        continue
    try:
        tb0 = time.time()
        ct = pc.build_cootile(a2c, tile=t, e_b=e_b, dtype="bf16", kb=kb)
        built[name] = ct
        chunks = sum(int(s.ctr.shape[0]) for s in ct.segments)
        # model terms for this geometry
        steps = chunks // kb
        f_pad = 128
        mxu_s = chunks * 4.0 * e_b * t * f_pad / pc._MXU_RATE["bf16"]
        step_s = steps * pc._STEP_OVERHEAD_S
        xdma_s = chunks * t * f_pad * 2 / pc._HBM_RATE
        edge_s = (chunks * e_b * 12 + N * f_pad * 4.0) / pc._HBM_RATE
        report["variants"][name] = {
            "geometry": [t, e_b, kb], "chunks": int(chunks),
            "build_s": round(time.time() - tb0, 1),
            "model_ms": {
                "mxu": round(mxu_s * 1e3, 2),
                "step_overhead": round(step_s * 1e3, 2),
                "x_dma_total": round(xdma_s * 1e3, 2),
                "x_dma_unhidden(0.45)": round(0.45 * xdma_s * 1e3, 2),
                "edge_tables+flush": round(edge_s * 1e3, 2),
                "predicted_total": round(
                    (mxu_s + step_s + 0.45 * xdma_s + edge_s) * 1e3, 2),
            },
        }
        fn = jax.jit(lambda ct, xx: pc.cootile_spmm(ct, xx,
                                                    precision="default"))
        fns[name] = (lambda ct=ct, fn=fn: fn(ct, x))
    except Exception as e:  # noqa: BLE001 — infeasible geometry recorded
        report["variants"][name] = {"geometry": [t, e_b, kb],
                                    "error": f"{type(e).__name__}: {e}"[:200]}

res = interleaved_timeit(fns, rounds=3, iters=3, warmup=1)
best_name = min(res, key=lambda k: res[k][0])
for name, (tt, _) in sorted(res.items(), key=lambda kv: kv[1][0]):
    v = report["variants"][name]
    v["achieved_ms"] = round(tt * 1e3, 2)
    v["edges_per_s"] = round(a2c.nnz / tt)
    # SoL here = pure streaming bytes (x tiles + edge tables + flush) at
    # HBM rate — the same definition bench_large uses
    sol = (v["model_ms"]["x_dma_total"]
           + v["model_ms"]["edge_tables+flush"]) / 1e3
    v["frac_of_sol"] = round(sol / tt, 3)
    print(f"{name}: {tt * 1e3:.2f} ms | {a2c.nnz / tt / 1e6:.0f}M e/s | "
          f"predicted {v['model_ms']['predicted_total']} ms | "
          f"frac_of_sol {v['frac_of_sol']}", flush=True)

auto_name = f"auto{auto_geo}"
report["best"] = best_name
report["best_vs_auto"] = round(
    res[auto_name][0] / res[best_name][0], 3)
report["verdict"] = (
    "swept-grid auto geometry is within 5% of every wider corner — the "
    "residual gap to SoL is the model's MXU+step+unhidden-DMA account"
    if report["best_vs_auto"] < 1.05 else
    f"{best_name} beats auto by {report['best_vs_auto']}x — fold into "
    "the candidate grid")

out = pathlib.Path(__file__).resolve().parent.parent / "docs" / "bench_cootile_ceiling.json"
out.write_text(json.dumps(report, indent=1))
print(json.dumps({k: report[k] for k in ("best", "best_vs_auto",
                                         "verdict")}, indent=1))
print(f"wrote {out}")
