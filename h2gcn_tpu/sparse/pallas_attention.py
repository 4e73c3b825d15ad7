"""Pallas TPU kernel: fused multi-head graph attention (SDDMM + softmax + agg).

The GAT hot path — per-edge logits ``leakyrelu(f1_i + f2_j)``, per-destination
softmax, attention-weighted aggregation — fused into ONE kernel over the
block-sparse adjacency, flash-attention style: blocks stream through VMEM in
(block_row, block_col) order while running max / normalizer / accumulator
scratch carries the online softmax across each row's blocks; the output tile
is written once per block row. No [E]-sized intermediates ever materialize
(the pure-XLA path in models/GAT.py builds three of them).

Head layout: H heads processed together, features concatenated along lanes —
``f1, f2: [N, H]``, ``h: [N, H·F]`` — so the per-block work is H small MXU
contractions and the VPU exp/max ops run across full lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _make_kernel(num_heads: int, feat: int, nb: int, slope: float):
    def kernel(brows_ref, bcols_ref, a_ref, f1_ref, f2_ref, h_ref, o_ref,
               m_scr, l_scr, acc_scr):
        i = pl.program_id(0)
        prev_row = brows_ref[jnp.maximum(i - 1, 0)]
        nxt_row = brows_ref[jnp.minimum(i + 1, nb - 1)]
        is_first = jnp.logical_or(i == 0, brows_ref[i] != prev_row)
        is_last = jnp.logical_or(i == nb - 1, brows_ref[i] != nxt_row)

        @pl.when(is_first)
        def _():
            m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        mask = a_ref[0] > 0  # [B, B]
        for k in range(num_heads):
            f1k = f1_ref[:, k][:, None]        # [B, 1] destination term
            f2k = f2_ref[:, k][None, :]        # [1, B] source term
            e = f1k + f2k
            e = jnp.where(e >= 0, e, slope * e)  # leaky relu
            e = jnp.where(mask, e, _NEG_INF)

            m_old = m_scr[:, k][:, None]
            m_new = jnp.maximum(m_old, jnp.max(e, axis=1, keepdims=True))
            scale = jnp.exp(m_old - m_new)
            p = jnp.exp(e - m_new)              # [B, B]
            p = jnp.where(mask, p, 0.0)

            l_new = l_scr[:, k][:, None] * scale + jnp.sum(
                p, axis=1, keepdims=True
            )
            hk = h_ref[:, k * feat:(k + 1) * feat]
            contrib = jnp.dot(p, hk, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            acc_scr[:, k * feat:(k + 1) * feat] = (
                acc_scr[:, k * feat:(k + 1) * feat] * scale + contrib
            )
            m_scr[:, k] = m_new[:, 0]
            l_scr[:, k] = l_new[:, 0]

        @pl.when(is_last)
        def _():
            # build the per-head normalizer by concatenation (a value-level
            # .at[].set would lower to an unsupported scatter)
            b = acc_scr.shape[0]
            parts = [
                jnp.broadcast_to(
                    jnp.maximum(l_scr[:, k][:, None], 1e-16), (b, feat)
                )
                for k in range(num_heads)
            ]
            width = acc_scr.shape[1]
            used = num_heads * feat
            if used < width:
                parts.append(jnp.ones((b, width - used), jnp.float32))
            o_ref[...] = acc_scr[...] / jnp.concatenate(parts, axis=1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "feat", "n_out", "slope", "interpret"),
)
def bsr_gat_attention(bsr, f1, f2, h, *, num_heads: int, feat: int,
                      n_out: int, slope: float = 0.2,
                      interpret: bool = False):
    """Fused graph attention over a BSR adjacency mask.

    ``bsr``: binary adjacency blocks (self loops included), blocks sorted by
    (row, col), every row block present. ``f1, f2: [N, H]``; ``h: [N, H·F]``.
    Returns ``[n_out, H·F]`` — per-head attention-weighted neighbor sums.
    """
    B = bsr.block_size
    nb = bsr.blocks.shape[0]
    n_pad = bsr.n_col_blocks * B
    hf = num_heads * feat

    def pad(x, width):
        out = jnp.zeros((n_pad, width), dtype=jnp.float32)
        return out.at[: x.shape[0], : x.shape[1]].set(x.astype(jnp.float32))

    # lane padding: heads → multiple of 128 is NOT required for non-final
    # dims, but keep feature width lane-aligned
    h_pad_w = max(128, -(-hf // 128) * 128)
    f_lane = max(128, -(-num_heads // 128) * 128)
    f1p = pad(f1, f_lane)
    f2p = pad(f2, f_lane)
    hp = pad(h, h_pad_w)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B, B), lambda i, br, bc: (i, 0, 0)),
            pl.BlockSpec((B, f_lane), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((B, f_lane), lambda i, br, bc: (bc[i], 0)),
            pl.BlockSpec((B, h_pad_w), lambda i, br, bc: (bc[i], 0)),
        ],
        out_specs=pl.BlockSpec((B, h_pad_w), lambda i, br, bc: (br[i], 0)),
        scratch_shapes=[
            pltpu.VMEM((B, f_lane), jnp.float32),   # running max per head
            pltpu.VMEM((B, f_lane), jnp.float32),   # running normalizer
            pltpu.VMEM((B, h_pad_w), jnp.float32),  # output accumulator
        ],
    )
    out = pl.pallas_call(
        _make_kernel(num_heads, feat, nb, slope),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsr.n_row_blocks * B, h_pad_w),
                                       jnp.float32),
        interpret=interpret,
    )(bsr.block_rows, bsr.block_cols,
      bsr.blocks.astype(jnp.float32), f1p, f2p, hp)
    return out[:n_out, :hf]
