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


def _attn_tile_update(mask, f1, f2, h, m_scr, l_scr, acc_scr,
                      num_heads: int, feat: int, slope: float,
                      precision=jax.lax.Precision.HIGHEST):
    """One (dest-tile, src-tile) block's online-softmax update.

    Shared by the BSR kernel (mask from a dense block) and the COO-chunk
    kernel (mask densified on the MXU from the chunk's edge list,
    pallas_attention_coo.py). ``mask: [Br, Bc]`` bool; scratch refs carry
    the running max / normalizer / accumulator across a dest tile's blocks.
    """
    for k in range(num_heads):
        f1k = f1[:, k][:, None]            # [B, 1] destination term
        f2k = f2[:, k][None, :]            # [1, B] source term
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
        hk = h[:, k * feat:(k + 1) * feat]
        contrib = jnp.dot(p, hk, preferred_element_type=jnp.float32,
                          precision=precision)
        acc_scr[:, k * feat:(k + 1) * feat] = (
            acc_scr[:, k * feat:(k + 1) * feat] * scale + contrib
        )
        m_scr[:, k] = m_new[:, 0]
        l_scr[:, k] = l_new[:, 0]


def _attn_finalize(acc_scr, l_scr, num_heads: int, feat: int):
    """Normalized output tile from the accumulator + per-head normalizer.

    Builds the per-head divisor by concatenation (a value-level .at[].set
    would lower to an unsupported scatter).
    """
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
    return acc_scr[...] / jnp.concatenate(parts, axis=1)


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
        _attn_tile_update(mask, f1_ref[...], f2_ref[...], h_ref[...],
                          m_scr, l_scr, acc_scr, num_heads, feat, slope)

        @pl.when(is_last)
        def _():
            o_ref[...] = _attn_finalize(acc_scr, l_scr, num_heads, feat)

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
    (row, col), every row/column block present. ``f1, f2: [N, H]``;
    ``h: [N, H·F]``. Returns ``[n_out, H·F]`` — per-head attention-weighted
    neighbor sums. (Delegates to the stats kernel; see :func:`gat_attention`
    for the differentiable entry point.)
    """
    _, _, hf, _, _ = _attn_dims(bsr, num_heads, feat)
    f1p, f2p, hp = _pad_attn_inputs(bsr, f1, f2, h, num_heads, feat)
    out, _, _ = _fwd_stats_call(bsr, f1p, f2p, hp, num_heads, feat, slope,
                                interpret)
    return out[:n_out, :hf]


# ---------------------------------------------------------------------------
# Differentiable wrapper: forward-with-stats + two-pass flash-style backward.
#
# Forward additionally emits the per-row softmax stats (running max m and
# normalizer l); the backward recomputes attention blocks from them:
#   pass R (row-major blocks):    df1_i  = Σ_j dpre_ij
#   pass C (column-major order):  dh_j  += αᵀ g,   df2_j = Σ_i dpre_ij
# where de = α ⊙ (g·hᵀ − D_i), dpre = de · leaky'(e), D_i = g_i · out_i.
# ---------------------------------------------------------------------------


def _make_fwd_stats_kernel(num_heads: int, feat: int, nb: int, slope: float):
    base = _make_kernel(num_heads, feat, nb, slope)

    def kernel(brows_ref, bcols_ref, a_ref, f1_ref, f2_ref, h_ref,
               o_ref, m_out_ref, l_out_ref, m_scr, l_scr, acc_scr):
        base(brows_ref, bcols_ref, a_ref, f1_ref, f2_ref, h_ref, o_ref,
             m_scr, l_scr, acc_scr)
        i = pl.program_id(0)
        nxt_row = brows_ref[jnp.minimum(i + 1, nb - 1)]
        is_last = jnp.logical_or(i == nb - 1, brows_ref[i] != nxt_row)

        @pl.when(is_last)
        def _():
            m_out_ref[...] = m_scr[...]
            l_out_ref[...] = l_scr[...]

    return kernel


def _attn_dims(bsr, num_heads: int, feat: int):
    B = bsr.block_size
    n_pad = bsr.n_col_blocks * B
    hf = num_heads * feat
    # lane padding: keep feature width lane-aligned
    h_pad_w = max(128, -(-hf // 128) * 128)
    f_lane = max(128, -(-num_heads // 128) * 128)
    return B, n_pad, hf, h_pad_w, f_lane


def _pad_attn_inputs(bsr, f1, f2, h, num_heads: int, feat: int):
    _, n_pad, _, h_pad_w, f_lane = _attn_dims(bsr, num_heads, feat)

    def pad(x, width):
        out = jnp.zeros((n_pad, width), dtype=jnp.float32)
        return out.at[: x.shape[0], : x.shape[1]].set(x.astype(jnp.float32))

    return pad(f1, f_lane), pad(f2, f_lane), pad(h, h_pad_w)


def _fwd_stats_call(bsr, f1p, f2p, hp, num_heads: int, feat: int,
                    slope: float, interpret: bool):
    """One pallas launch: fused attention + per-row softmax stats (m, l)."""
    B, _, _, h_pad_w, f_lane = _attn_dims(bsr, num_heads, feat)
    nb = bsr.blocks.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B, B), lambda i, br, bc: (i, 0, 0)),
            pl.BlockSpec((B, f_lane), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((B, f_lane), lambda i, br, bc: (bc[i], 0)),
            pl.BlockSpec((B, h_pad_w), lambda i, br, bc: (bc[i], 0)),
        ],
        out_specs=(
            pl.BlockSpec((B, h_pad_w), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((B, f_lane), lambda i, br, bc: (br[i], 0)),
            pl.BlockSpec((B, f_lane), lambda i, br, bc: (br[i], 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, f_lane), jnp.float32),   # running max per head
            pltpu.VMEM((B, f_lane), jnp.float32),   # running normalizer
            pltpu.VMEM((B, h_pad_w), jnp.float32),  # output accumulator
        ],
    )
    return pl.pallas_call(
        _make_fwd_stats_kernel(num_heads, feat, nb, slope),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bsr.n_row_blocks * B, h_pad_w), jnp.float32),
            jax.ShapeDtypeStruct((bsr.n_row_blocks * B, f_lane), jnp.float32),
            jax.ShapeDtypeStruct((bsr.n_row_blocks * B, f_lane), jnp.float32),
        ),
        interpret=interpret,
    )(bsr.block_rows, bsr.block_cols,
      bsr.blocks.astype(jnp.float32), f1p, f2p, hp)



def _block_alpha(mask, f1k, f2k, mk, lk, slope):
    """Recompute one head's α block + leaky' mask from saved stats.

    ``mask: [Br, Bc]`` bool — shared by the BSR backward kernels (mask from
    a dense block) and the COO-chunk ones (mask densified from edges)."""
    pre = f1k[:, None] + f2k[None, :]
    e = jnp.where(pre >= 0, pre, slope * pre)
    p = jnp.where(mask, jnp.exp(e - mk[:, None]), 0.0)
    alpha = p / jnp.maximum(lk[:, None], 1e-16)
    dleaky = jnp.where(pre >= 0, 1.0, slope)
    return alpha, jnp.where(mask, dleaky, 0.0)


def _bwd_row_update(mask, f1, f2, h, g, m, l, d, acc_scr,
                    num_heads: int, feat: int, slope: float,
                    precision=jax.lax.Precision.HIGHEST):
    """Row-pass per-block df1 accumulation (shared BSR / COO-chunk)."""
    parts = []
    for k in range(num_heads):
        alpha, dleaky = _block_alpha(mask, f1[:, k], f2[:, k], m[:, k],
                                     l[:, k], slope)
        gk = g[:, k * feat:(k + 1) * feat]
        hk = h[:, k * feat:(k + 1) * feat]
        gh = jax.lax.dot_general(
            gk, hk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        de = alpha * (gh - d[:, k][:, None])
        dpre = de * dleaky
        parts.append(jnp.sum(dpre, axis=1, keepdims=True))
    width = acc_scr.shape[1]
    if num_heads < width:
        parts.append(jnp.zeros((acc_scr.shape[0], width - num_heads),
                               jnp.float32))
    acc_scr[...] = acc_scr[...] + jnp.concatenate(parts, axis=1)


def _bwd_col_update(mask, f1, f2, h, g, m, l, d, dh_scr, df2_scr,
                    num_heads: int, feat: int, slope: float,
                    precision=jax.lax.Precision.HIGHEST):
    """Column-pass per-block dh/df2 accumulation (shared BSR / COO-chunk)."""
    dh_parts = []
    df2_parts = []
    for k in range(num_heads):
        alpha, dleaky = _block_alpha(mask, f1[:, k], f2[:, k], m[:, k],
                                     l[:, k], slope)
        gk = g[:, k * feat:(k + 1) * feat]
        hk = h[:, k * feat:(k + 1) * feat]
        # dh_c += αᵀ @ g  (contract the destination dim)
        dh_parts.append(jax.lax.dot_general(
            alpha, gk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ))
        gh = jax.lax.dot_general(
            gk, hk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        de = alpha * (gh - d[:, k][:, None])
        dpre = de * dleaky
        df2_parts.append(jnp.sum(dpre, axis=0)[:, None])
    dh_blk = jnp.concatenate(dh_parts, axis=1)
    if dh_blk.shape[1] < dh_scr.shape[1]:
        dh_blk = jnp.concatenate(
            [dh_blk, jnp.zeros((dh_blk.shape[0],
                                dh_scr.shape[1] - dh_blk.shape[1]),
                               jnp.float32)], axis=1)
    df2_blk = jnp.concatenate(df2_parts, axis=1)
    if df2_blk.shape[1] < df2_scr.shape[1]:
        df2_blk = jnp.concatenate(
            [df2_blk, jnp.zeros((df2_blk.shape[0],
                                 df2_scr.shape[1] - df2_blk.shape[1]),
                                jnp.float32)], axis=1)
    dh_scr[...] = dh_scr[...] + dh_blk
    df2_scr[...] = df2_scr[...] + df2_blk


def _make_bwd_row_kernel(num_heads: int, feat: int, nb: int, slope: float):
    """Row-major pass: df1 (per-destination gradient of the a1 logits)."""

    def kernel(brows_ref, bcols_ref, a_ref, f1_ref, f2_ref, h_ref, g_ref,
               m_ref, l_ref, d_ref, df1_ref, acc_scr):
        i = pl.program_id(0)
        prev_row = brows_ref[jnp.maximum(i - 1, 0)]
        nxt_row = brows_ref[jnp.minimum(i + 1, nb - 1)]
        is_first = jnp.logical_or(i == 0, brows_ref[i] != prev_row)
        is_last = jnp.logical_or(i == nb - 1, brows_ref[i] != nxt_row)

        @pl.when(is_first)
        def _():
            acc_scr[...] = jnp.zeros_like(acc_scr)

        _bwd_row_update(a_ref[0] > 0, f1_ref[...], f2_ref[...], h_ref[...],
                        g_ref[...], m_ref[...], l_ref[...], d_ref[...],
                        acc_scr, num_heads, feat, slope)

        @pl.when(is_last)
        def _():
            df1_ref[...] = acc_scr[...]

    return kernel


def _make_bwd_col_kernel(num_heads: int, feat: int, nb: int, slope: float):
    """Column-major pass: dh (source features) and df2 (source logits)."""

    def kernel(bcols_ref, brows_ref, border_ref, a_ref, f1_ref, f2_ref,
               h_ref, g_ref, m_ref, l_ref, d_ref, dh_ref, df2_ref,
               dh_scr, df2_scr):
        i = pl.program_id(0)
        prev_col = bcols_ref[jnp.maximum(i - 1, 0)]
        nxt_col = bcols_ref[jnp.minimum(i + 1, nb - 1)]
        is_first = jnp.logical_or(i == 0, bcols_ref[i] != prev_col)
        is_last = jnp.logical_or(i == nb - 1, bcols_ref[i] != nxt_col)

        @pl.when(is_first)
        def _():
            dh_scr[...] = jnp.zeros_like(dh_scr)
            df2_scr[...] = jnp.zeros_like(df2_scr)

        _bwd_col_update(a_ref[0] > 0, f1_ref[...], f2_ref[...], h_ref[...],
                        g_ref[...], m_ref[...], l_ref[...], d_ref[...],
                        dh_scr, df2_scr, num_heads, feat, slope)

        @pl.when(is_last)
        def _():
            dh_ref[...] = dh_scr[...]
            df2_ref[...] = df2_scr[...]

    return kernel


def gat_attention(bsr, f1, f2, h, *, num_heads: int, feat: int, n_out: int,
                  slope: float = 0.2, interpret: bool = False):
    """Differentiable fused graph attention (custom VJP).

    Same contract as :func:`bsr_gat_attention`, plus gradients w.r.t.
    ``f1``/``f2``/``h`` via the two-pass flash-style backward kernels.
    """
    fn = _gat_attention_vjp(bsr, num_heads, feat, n_out, slope, interpret)
    return fn(f1, f2, h)


def _gat_attention_vjp(bsr, num_heads, feat, n_out, slope, interpret):
    B = bsr.block_size
    nb = bsr.blocks.shape[0]
    n_pad = bsr.n_col_blocks * B
    hf = num_heads * feat
    h_pad_w = max(128, -(-hf // 128) * 128)
    f_lane = max(128, -(-num_heads // 128) * 128)

    def fwd_stats(f1p, f2p, hp):
        return _fwd_stats_call(bsr, f1p, f2p, hp, num_heads, feat, slope,
                               interpret)

    @jax.custom_vjp
    def _apply(f1, f2, h):
        f1p, f2p, hp = _pad_attn_inputs(bsr, f1, f2, h, num_heads, feat)
        out, _, _ = fwd_stats(f1p, f2p, hp)
        return out[:n_out, :hf]

    def _apply_fwd(f1, f2, h):
        f1p, f2p, hp = _pad_attn_inputs(bsr, f1, f2, h, num_heads, feat)
        out, m, l = fwd_stats(f1p, f2p, hp)
        return out[:n_out, :hf], (f1p, f2p, hp, out, m, l)

    def _apply_bwd(res, g):
        f1p, f2p, hp, out, m, l = res
        gp = jnp.zeros_like(out).at[:n_out, :hf].set(g.astype(jnp.float32))
        # D_i per head: g_i · out_i
        d = jnp.stack(
            [
                jnp.sum(gp[:, k * feat:(k + 1) * feat]
                        * out[:, k * feat:(k + 1) * feat], axis=1)
                for k in range(num_heads)
            ],
            axis=1,
        )
        dp = jnp.zeros((out.shape[0], f_lane), jnp.float32)
        dp = dp.at[:, :num_heads].set(d)

        # pass R: row-major (original block order)
        grid_r = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, B, B), lambda i, br, bc: (i, 0, 0)),
                pl.BlockSpec((B, f_lane), lambda i, br, bc: (br[i], 0)),
                pl.BlockSpec((B, f_lane), lambda i, br, bc: (bc[i], 0)),
                pl.BlockSpec((B, h_pad_w), lambda i, br, bc: (bc[i], 0)),
                pl.BlockSpec((B, h_pad_w), lambda i, br, bc: (br[i], 0)),
                pl.BlockSpec((B, f_lane), lambda i, br, bc: (br[i], 0)),
                pl.BlockSpec((B, f_lane), lambda i, br, bc: (br[i], 0)),
                pl.BlockSpec((B, f_lane), lambda i, br, bc: (br[i], 0)),
            ],
            out_specs=pl.BlockSpec((B, f_lane), lambda i, br, bc: (br[i], 0)),
            scratch_shapes=[pltpu.VMEM((B, f_lane), jnp.float32)],
        )
        df1 = pl.pallas_call(
            _make_bwd_row_kernel(num_heads, feat, nb, slope),
            grid_spec=grid_r,
            out_shape=jax.ShapeDtypeStruct((bsr.n_row_blocks * B, f_lane),
                                           jnp.float32),
            interpret=interpret,
        )(bsr.block_rows, bsr.block_cols, bsr.blocks.astype(jnp.float32),
          f1p, f2p, hp, gp, m, l, dp)

        # pass C: column-major permutation of the same blocks — host-
        # precomputed on the BSR (static per graph); jnp fallback for BSRs
        # built without it
        if bsr.colmajor_order is not None:
            order = bsr.colmajor_order
        else:
            order = jnp.lexsort(
                (bsr.block_rows, bsr.block_cols)
            ).astype(jnp.int32)
        bc_sorted = bsr.block_cols[order]
        br_sorted = bsr.block_rows[order]
        blk_order = order

        grid_c = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, B, B), lambda i, bc, br, po: (po[i], 0, 0)),
                pl.BlockSpec((B, f_lane), lambda i, bc, br, po: (br[i], 0)),
                pl.BlockSpec((B, f_lane), lambda i, bc, br, po: (bc[i], 0)),
                pl.BlockSpec((B, h_pad_w), lambda i, bc, br, po: (bc[i], 0)),
                pl.BlockSpec((B, h_pad_w), lambda i, bc, br, po: (br[i], 0)),
                pl.BlockSpec((B, f_lane), lambda i, bc, br, po: (br[i], 0)),
                pl.BlockSpec((B, f_lane), lambda i, bc, br, po: (br[i], 0)),
                pl.BlockSpec((B, f_lane), lambda i, bc, br, po: (br[i], 0)),
            ],
            out_specs=(
                pl.BlockSpec((B, h_pad_w), lambda i, bc, br, po: (bc[i], 0)),
                pl.BlockSpec((B, f_lane), lambda i, bc, br, po: (bc[i], 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((B, h_pad_w), jnp.float32),
                pltpu.VMEM((B, f_lane), jnp.float32),
            ],
        )
        dh, df2 = pl.pallas_call(
            _make_bwd_col_kernel(num_heads, feat, nb, slope),
            grid_spec=grid_c,
            out_shape=(
                jax.ShapeDtypeStruct((bsr.n_col_blocks * B, h_pad_w),
                                     jnp.float32),
                jax.ShapeDtypeStruct((bsr.n_col_blocks * B, f_lane),
                                     jnp.float32),
            ),
            interpret=interpret,
        )(bc_sorted, br_sorted, blk_order,
          bsr.blocks.astype(jnp.float32), f1p, f2p, hp, gp, m, l, dp)

        return (df1[:n_out, :num_heads], df2[:n_out, :num_heads],
                dh[:n_out, :hf])

    _apply.defvjp(_apply_fwd, _apply_bwd)
    return _apply
