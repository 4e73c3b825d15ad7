"""Pallas TPU kernel: block-sparse-row (BSR) SpMM.

The aggregation hot loop of the whole framework (reference semantics:
``tf.sparse.sparse_dense_matmul`` at h2gcn/models/_layers.py:78-81) executed
the TPU way: the adjacency is tiled into dense ``B×B`` blocks, only nonzero
blocks are kept, and each block multiply runs on the MXU.

Kernel layout
-------------
Grid ``(F_tiles, num_blocks)`` with the block index innermost. Blocks are
sorted by (block_row, block_col), so all blocks of one output row-tile are
visited consecutively: Pallas keeps the output tile resident in VMEM across
those steps and only flushes to HBM when the row changes. Scalar-prefetched
``block_rows`` / ``block_cols`` drive the input/output index maps, i.e. the
block coordinate arrays act as the DMA schedule.

Per grid step the kernel computes ``out[r] (+)= A_block @ x[c]`` — one
``B×B @ B×Ft`` MXU contraction — and double-buffered block/feature DMAs are
inserted automatically by the Pallas pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FEATURE_TILE = 128


def _make_kernel(precision):
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)

    def _kernel(brows_ref, bcols_ref, a_ref, x_ref, o_ref):
        i = pl.program_id(1)
        prev_row = brows_ref[jnp.maximum(i - 1, 0)]
        is_first = jnp.logical_or(i == 0, brows_ref[i] != prev_row)

        contrib = jnp.dot(
            a_ref[0],
            x_ref[...],
            preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(o_ref.dtype)

        @pl.when(is_first)
        def _():
            o_ref[...] = contrib

        @pl.when(jnp.logical_not(is_first))
        def _():
            o_ref[...] = o_ref[...] + contrib

    return _kernel


@functools.partial(jax.jit,
                   static_argnames=("n_out", "feature_tile", "precision"))
def bsr_spmm(bsr, x: jax.Array, *, n_out: int,
             feature_tile: int = _FEATURE_TILE, precision: str = "highest"):
    """``A @ x`` where ``A`` is a :class:`~h2gcn_tpu.sparse.matrix.BSR`.

    ``x``: [m, F] (any F — padded to the feature tile internally).
    Returns [n_out, F].
    """
    B = bsr.block_size
    nb = bsr.blocks.shape[0]
    m, f = x.shape
    m_pad = bsr.n_col_blocks * B
    f_pad = max(feature_tile, -(-f // feature_tile) * feature_tile)
    nf = f_pad // feature_tile

    # match the feature operand to the block payload dtype (bf16 throughput
    # mode converts the small x, never the large block payload)
    x_comp_dtype = (bsr.blocks.dtype if bsr.blocks.dtype == jnp.bfloat16
                    else x.dtype)
    xp = x.astype(x_comp_dtype)
    if m_pad != m or f_pad != f:
        xp = jnp.zeros((m_pad, f_pad), dtype=x_comp_dtype).at[:m, :f].set(xp)

    grid = (nf, nb)
    out_dtype = x.dtype if x.dtype != jnp.bfloat16 else jnp.float32
    out_shape = jax.ShapeDtypeStruct((bsr.n_row_blocks * B, f_pad), out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, B, B), lambda j, i, br, bc: (i, 0, 0)),
            pl.BlockSpec((B, feature_tile), lambda j, i, br, bc: (bc[i], j)),
        ],
        out_specs=pl.BlockSpec(
            (B, feature_tile), lambda j, i, br, bc: (br[i], j)
        ),
    )

    flops = 2 * nb * B * B * f_pad
    bytes_accessed = (
        bsr.blocks.size * bsr.blocks.dtype.itemsize
        + xp.size * xp.dtype.itemsize
        + bsr.n_row_blocks * B * f_pad * xp.dtype.itemsize
    )

    out = pl.pallas_call(
        _make_kernel(precision),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
    )(bsr.block_rows, bsr.block_cols, bsr.blocks, xp)

    return out[:n_out, :f]
