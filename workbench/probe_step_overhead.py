"""Measure the fixed per-grid-step cost of the COO-tile SpMM kernel.

Regenerates the `_STEP_OVERHEAD_S` constant in sparse/pallas_cootile.py:
a NULL-COMPUTE kernel with the exact grid + DMA structure of the real one
(same scalar prefetch, same edge-chunk and x-slot BlockSpec operands, same
output blocks — the pipeline DMAs everything identically) isolates the
per-step fixed cost (DMA descriptors + scalar bookkeeping); the delta to
the real kernel is the one-hot build + MXU contractions.

Two nulls isolate the two cost classes the geometry model separates:
``null-no-x`` drops the x slot operands entirely (pure step overhead —
the model's `_STEP_OVERHEAD_S`), while ``null`` keeps them (overhead +
the x DMA stream the model charges separately). r3 v5e at the auto-kb
geometries: null ~5.1-5.7 µs/step *including* the kb-deep x DMAs
(4MB/step at (512,128,kb32) ≈ 5 µs of HBM time — the DMAs, not fixed
cost), with the real kernel's compute adding 2-7.7 µs.

Usage: python workbench/probe_step_overhead.py [n] [m_edges]
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build_graph, interleaved_timeit
from h2gcn_tpu.sparse import pallas_cootile as pc

N = int(sys.argv[1]) if len(sys.argv) > 1 else 131_072
M = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
F = 64

float(jnp.zeros(()))
print(f"backend={jax.default_backend()} n={N} m={M}")

A = build_graph(N, M, seed=0)


def null_seg_fn(nchunks, rb_span, tile, e_b, f_pad, kb, with_x=True):
    """pallas_call with _seg_fn's exact grid/DMA structure, null compute.

    ``with_x=False`` additionally drops the x slot operands: what remains
    is the pure per-step fixed cost (descriptors + scalar bookkeeping) —
    the thing `_STEP_OVERHEAD_S` models."""

    def kernel(ctr_ref, ctc_ref, rows_ref, cols_ref, vals_ref, *xs_o):
        o_ref = xs_o[kb if with_x else 0]
        i = pl.program_id(1)
        prev = ctr_ref[jnp.maximum(kb * i - 1, 0)]
        first = jnp.logical_or(i == 0, ctr_ref[kb * i] != prev)

        @pl.when(first)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

    grid = (f_pad // pc.F_TILE, nchunks // kb)
    edge_specs = [
        pl.BlockSpec((kb, e_b), lambda j, i, tr, tc: (i, 0))
        for _ in range(3)
    ]
    x_specs = [
        pl.BlockSpec((tile, pc.F_TILE),
                     lambda j, i, tr, tc, k=k: (tc[kb * i + k], j))
        for k in range(kb)
    ] if with_x else []
    out_spec = pl.BlockSpec((tile, pc.F_TILE),
                            lambda j, i, tr, tc: (tr[kb * i], j))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=grid, in_specs=edge_specs + x_specs,
            out_specs=out_spec),
        out_shape=jax.ShapeDtypeStruct((rb_span * tile, f_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )


rng = np.random.default_rng(0)
for tile, e_b in ((512, 128), (512, 256), (1024, 256)):
    ct = pc.build_cootile(A, tile=tile, e_b=e_b, dtype="bf16")
    kb = ct.kb
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    m_pad = -(-N // tile) * tile
    f_pad = pc.F_TILE
    xp = jnp.zeros((m_pad, f_pad), jnp.bfloat16).at[:N, :F].set(
        x.astype(jnp.bfloat16))
    seg = ct.segments[0]
    nchunks = int(seg.ctr.shape[0])
    steps = nchunks // kb

    real = pc._seg_fn(nchunks, seg.rb_hi - seg.rb_lo, tile, e_b, f_pad,
                      "bfloat16", False, kb=kb)
    null = null_seg_fn(nchunks, seg.rb_hi - seg.rb_lo, tile, e_b, f_pad, kb)
    null0 = null_seg_fn(nchunks, seg.rb_hi - seg.rb_lo, tile, e_b, f_pad,
                        kb, with_x=False)
    args = (seg.ctr, seg.ctc, seg.rows, seg.cols, seg.vals)
    res = interleaved_timeit({
        "real": lambda: real(*(args + (xp,) * kb)),
        "null": lambda: null(*(args + (xp,) * kb)),
        "null_no_x": lambda: null0(*args),
    }, rounds=3, iters=5, warmup=2)
    t_real, t_null = res["real"][0], res["null"][0]
    t_null0 = res["null_no_x"][0]
    print(f"(tile={tile}, e_b={e_b}, kb={kb}): {steps} steps | "
          f"fixed {t_null0 / steps * 1e6:.2f} us/step (no-x null) | "
          f"+x DMAs {t_null / steps * 1e6:.2f} | "
          f"real {t_real / steps * 1e6:.2f} | "
          f"compute delta {(t_real - t_null) / steps * 1e6:.2f} us/step")
