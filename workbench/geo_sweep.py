"""Geometry sweep: measured COO-tile SpMM vs the auto_geometry cost model.

The tool that fitted `_X_HIDE_FRAC` (sparse/pallas_cootile.py): for each
(tile, e_b, kb) geometry it measures edges/s and prints the cost model's
prediction alongside, plus the hide-fraction that would make the model
exact for that geometry — re-run on new TPU generations and refit the
constant if the fitted column drifts from 0.55.

Usage: python workbench/geo_sweep.py [n] [m_edges] [--hop2]
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

args = [a for a in sys.argv[1:] if not a.startswith("--")]
N = int(args[0]) if args else 131_072
M = int(args[1]) if len(args) > 1 else 4_000_000
F = 64

float(jnp.zeros(()))
print(f"backend={jax.default_backend()} n={N} m={M}")

A = build_graph(N, M, seed=0)
if "--hop2" in sys.argv:
    A = transforms.normalize(transforms.nhood_split(A, 2)[2]).tocsr()
print(f"nnz={A.nnz}")
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))

geos = [(512, 128, 8), (512, 128, 32), (512, 256, 8), (1024, 256, 8),
        (1024, 128, 32), (256, 128, 32)]
fns, cts = {}, {}
for tile, e_b, kb in geos:
    vmem = kb * tile * pc.F_TILE * 2 * 2 + 2 * tile * pc.F_TILE * 4
    if vmem > pc._VMEM_BUDGET:
        print(f"({tile},{e_b},kb{kb}): VMEM over budget, skipped")
        continue
    ct = pc.build_cootile(A, tile=tile, e_b=e_b, dtype="bf16", kb=kb)
    key = f"{tile},{e_b},kb{kb}"
    cts[key] = (ct, tile, e_b, kb)
    fns[key] = (lambda c: (lambda: pc.cootile_spmm(
        c, x, precision="default")))(ct)

res = interleaved_timeit(fns, rounds=3, iters=5, warmup=2)
f_pad = pc.F_TILE
print(f"{'geometry':>16} {'meas ms':>8} {'M e/s':>6} {'model ms':>9} "
      f"{'fit hide-frac':>13}")
for key, (ct, tile, e_b, kb) in cts.items():
    t = res[key][0]
    chunks = sum(int(s.ctr.shape[0]) for s in ct.segments)
    steps = chunks // kb
    n_rb = -(-N // tile)
    mxu = chunks * 4.0 * e_b * tile * f_pad / pc._MXU_RATE["bf16"]
    step_c = steps * pc._STEP_OVERHEAD_S
    x_dma = chunks * tile * f_pad * 2 / pc._HBM_RATE
    hbm = (chunks * e_b * 12 + n_rb * tile * f_pad * 4.0) / pc._HBM_RATE
    model = mxu + step_c + (1 - pc._X_HIDE_FRAC) * x_dma + hbm
    # hide fraction that reproduces the measurement exactly
    fit = 1.0 - (t - mxu - step_c - hbm) / x_dma if x_dma > 0 else float("nan")
    print(f"{key:>16} {t * 1e3:8.1f} {A.nnz / t / 1e6:6.0f} "
          f"{model * 1e3:9.1f} {fit:13.2f}")
