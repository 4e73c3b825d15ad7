"""Pallas TPU kernel: fused graph attention at scale via COO-chunk tiles.

The scale-capable variant of :mod:`pallas_attention`: same fused SDDMM +
online-softmax + aggregation (flash-attention style) as the BSR kernel, but
the adjacency rides as **per-tile edge chunks** instead of dense blocks —
each grid step densifies its own T×T mask tiles on the MXU with two one-hot
comparisons and a single bf16-exact contraction (the proven
:mod:`pallas_cootile` trick):

    mask[r, c] = Σ_e rows_oh[r, e] · vals_e · cols_oh[e, c]     (MXU)

so graph memory is O(E) (12 bytes per padded edge slot) rather than the
BSR's O(tiles·T²) dense payload, which explodes past ~20K nodes on
unclustered graphs (56 GB at 120K nodes — the real reason the fused GAT
path used to cap out, not VMEM). With chunk tables a 120K-node support is
~15 MB of device state and the kernel streams f1/f2/h tiles through VMEM
exactly like the BSR version.

Replaces the reference SpGAT's ``tf.sparse`` attention
(baselines/GAT/utils/layers.py:53-100) in the regime the reference handles
only through scatter ops; on TPU the XLA segment composition is 100×+
slower (docs/BENCHMARKS.md), so this kernel is what makes large-graph GAT
viable at all.

Structure mirrors :mod:`pallas_cootile`: one grid step processes a
``kb``-chunk block sharing one output tile (build_chunk_tables pads every
group's chunk list to a kb multiple), the per-chunk f2/h tiles arrive
through kb auto-pipelined slot operands, and chunk tables are SMEM-
segmented at group boundaries. Backward is two-pass flash-style like the
BSR kernel — a row pass over the same chunk tables (df1) and a column pass
over **transpose chunk tables** (the same edges regrouped by source tile,
built host-side from Aᵀ) for dh/df2, with α recomputed from the saved
per-row softmax stats. The column pass streams five dest-side tiles per
chunk (f1/g/m/l/D); the raised ``_VMEM_LIMIT`` keeps kb=8 viable there.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import (_NEG_INF, _attn_finalize, _attn_tile_update,
                               _bwd_col_update, _bwd_row_update)
from .pallas_cootile import _MAX_CHUNKS, build_chunk_tables

# scoped-VMEM ceiling for the kernels: the kb-unrolled chunk loop needs
# ~30MB of scheduling stack at kb=8/T=256, far over the compiler's
# conservative 16MB default but a fraction of the v5e's 128MB physical
# VMEM. (The same default is what round 2 mis-read as a hardware operand
# budget — see docs/BENCHMARKS.md history.)
_VMEM_LIMIT = 96 * 1024 * 1024

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,   # 6-pass f32 MXU (parity mode)
    "default": jax.lax.Precision.DEFAULT,   # 1-pass bf16, f32 accumulation
}

_KB_FWD = 8   # chunks per grid step, forward + backward-row passes
_KB_COL = 8   # backward-column pass (5 slot operands/chunk fit under _VMEM_LIMIT)


@struct.dataclass
class AttnCooSegment:
    """One SMEM-budget slice of the chunk tables (≤ _MAX_CHUNKS chunks, cut
    at output-tile boundaries, kb-block aligned). ``grp`` is the tile index
    the chunk's output accumulates into (dest tile for fwd/row tables,
    source tile for the transpose tables); ``oth`` is the opposite side."""

    grp: jax.Array   # [nchunks] int32, ascending (absolute tile index)
    oth: jax.Array   # [nchunks] int32 (absolute tile index)
    rows: jax.Array  # [nchunks, e_b] int32 tile-local dest-row coords
    cols: jax.Array  # [nchunks, e_b] int32 tile-local src-col coords
    vals: jax.Array  # [nchunks, e_b] float32 (0 marks padding slots)
    lo: int = struct.field(pytree_node=False)   # first output tile
    hi: int = struct.field(pytree_node=False)   # one past last output tile


@struct.dataclass
class AttnCoo:
    """Fused-attention graph payload: edge chunk tables in both visit
    orders. ``fwd`` chunks are grouped by destination tile (row-major) and
    drive the forward + backward-row passes; ``bwd`` chunks regroup the
    SAME edges by source tile (built from Aᵀ, coordinates swapped back to
    the original orientation) and drive the backward-column pass."""

    fwd: Tuple[AttnCooSegment, ...]
    bwd: Tuple[AttnCooSegment, ...]
    tile: int = struct.field(pytree_node=False, default=256)
    e_b: int = struct.field(pytree_node=False, default=128)
    n: int = struct.field(pytree_node=False, default=0)

    @property
    def n_tiles(self) -> int:
        return -(-self.n // self.tile)

    @property
    def num_chunks(self) -> int:
        return sum(int(s.grp.shape[0]) for s in self.fwd)


def _segment(grp, oth, rows, cols, vals, kb, swap_coords=False):
    """Split chunk tables at group boundaries into ≤_MAX_CHUNKS segments.

    ``swap_coords``: the transpose tables come out of build_chunk_tables
    with rows/cols in the TRANSPOSED orientation — swap them back so every
    kernel sees (dest-local, src-local) coordinates."""
    if swap_coords:
        rows, cols = cols, rows
    total = len(grp)
    starts = np.flatnonzero(np.diff(grp, prepend=-1))
    segs = []
    lo = 0
    while lo < total:
        hi = min(lo + _MAX_CHUNKS, total)
        if hi < total:
            cut = starts[(starts > lo) & (starts <= hi)]
            if len(cut):
                hi = int(cut[-1])
            else:
                nxt = starts[starts > lo]
                hi = int(nxt[0]) if len(nxt) else total
        assert (hi - lo) % kb == 0  # group chunk counts are kb multiples
        sl = slice(lo, hi)
        segs.append(AttnCooSegment(
            grp=jnp.asarray(grp[sl]), oth=jnp.asarray(oth[sl]),
            rows=jnp.asarray(rows[sl]), cols=jnp.asarray(cols[sl]),
            vals=jnp.asarray(vals[sl]),
            lo=int(grp[lo]), hi=int(grp[hi - 1]) + 1,
        ))
        lo = hi
    return tuple(segs)


def build_attn_coo(csr, tile: int = 256, e_b: int | None = 128) -> AttnCoo:
    """Host prep: (tile, e_b) chunk tables of the attention support in both
    visit orders. The support must carry mask semantics — the kernel
    treats any positive densified value as an edge."""
    import scipy.sparse as sp

    csr = sp.csr_matrix(csr)
    n, m = csr.shape
    assert n == m, "attention support must be square"
    ctr, ctc, rows, cols, vals, _, e_b = build_chunk_tables(
        csr, tile, e_b, kb=_KB_FWD)
    fwd = _segment(ctr, ctc, rows, cols, vals, _KB_FWD)
    # transpose tables: the same edges regrouped by source tile. Built
    # explicitly even for symmetric supports — symmetry makes the table
    # SHAPES match, not the per-chunk contents.
    ttr, ttc, trows, tcols, tvals, _, _ = build_chunk_tables(
        csr.T.tocsr(), tile, e_b, kb=_KB_COL)
    bwd = _segment(ttr, ttc, trows, tcols, tvals, _KB_COL,
                   swap_coords=True)
    return AttnCoo(fwd=fwd, bwd=bwd, tile=tile, e_b=e_b, n=n)


def _densify_mask(rows, cols, vals, tile: int, e_b: int):
    """[T, T] edge mask from one chunk's tile-local COO slots (MXU).

    One-hot 0/1 operands are exact in bf16 and the MXU accumulates in f32,
    so the densified mask is exact; padding slots carry vals=0 and vanish.
    """
    iota_te = jax.lax.broadcasted_iota(jnp.int32, (tile, e_b), 0)
    iota_ec = jax.lax.broadcasted_iota(jnp.int32, (e_b, tile), 1)
    row_oh = (iota_te == rows[None, :]).astype(jnp.bfloat16)
    col_oh = ((cols[:, None] == iota_ec).astype(jnp.float32)
              * vals[:, None]).astype(jnp.bfloat16)
    dens = jnp.dot(row_oh, col_oh, preferred_element_type=jnp.float32)
    return dens > 0


def _group_edges(i, grp_ref, nsteps, kb):
    """(is_first, is_last) for the kb-chunk block's shared output tile."""
    prev = grp_ref[jnp.maximum(kb * i - 1, 0)]
    nxt = grp_ref[jnp.minimum(kb * (i + 1), nsteps * kb - 1)]
    me = grp_ref[kb * i]
    is_first = jnp.logical_or(i == 0, me != prev)
    is_last = jnp.logical_or(i == nsteps - 1, me != nxt)
    return is_first, is_last


def _make_fwd_kernel(num_heads, feat, nsteps, slope, tile, e_b, kb,
                     precision):
    def kernel(grp_ref, oth_ref, rows_ref, cols_ref, vals_ref, f1_ref,
               *rest):
        f2s, rest = rest[:kb], rest[kb:]
        hs, rest = rest[:kb], rest[kb:]
        o_ref, m_out_ref, l_out_ref, m_scr, l_scr, acc_scr = rest
        i = pl.program_id(0)
        is_first, is_last = _group_edges(i, grp_ref, nsteps, kb)

        @pl.when(is_first)
        def _():
            m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        f1 = f1_ref[...]
        for k in range(kb):
            mask = _densify_mask(rows_ref[k], cols_ref[k], vals_ref[k],
                                 tile, e_b)
            _attn_tile_update(mask, f1, f2s[k][...], hs[k][...],
                              m_scr, l_scr, acc_scr, num_heads, feat, slope,
                              precision)

        @pl.when(is_last)
        def _():
            o_ref[...] = _attn_finalize(acc_scr, l_scr, num_heads, feat)
            m_out_ref[...] = m_scr[...]
            l_out_ref[...] = l_scr[...]

    return kernel


def _make_bwd_row_kernel(num_heads, feat, nsteps, slope, tile, e_b, kb,
                         precision):
    def kernel(grp_ref, oth_ref, rows_ref, cols_ref, vals_ref,
               f1_ref, g_ref, m_ref, l_ref, d_ref, *rest):
        f2s, rest = rest[:kb], rest[kb:]
        hs, rest = rest[:kb], rest[kb:]
        df1_ref, acc_scr = rest
        i = pl.program_id(0)
        is_first, is_last = _group_edges(i, grp_ref, nsteps, kb)

        @pl.when(is_first)
        def _():
            acc_scr[...] = jnp.zeros_like(acc_scr)

        f1, g = f1_ref[...], g_ref[...]
        m, l, d = m_ref[...], l_ref[...], d_ref[...]
        for k in range(kb):
            mask = _densify_mask(rows_ref[k], cols_ref[k], vals_ref[k],
                                 tile, e_b)
            _bwd_row_update(mask, f1, f2s[k][...], hs[k][...], g, m, l, d,
                            acc_scr, num_heads, feat, slope, precision)

        @pl.when(is_last)
        def _():
            df1_ref[...] = acc_scr[...]

    return kernel


def _make_bwd_col_kernel(num_heads, feat, nsteps, slope, tile, e_b, kb,
                         precision):
    def kernel(grp_ref, oth_ref, rows_ref, cols_ref, vals_ref,
               f2_ref, h_ref, *rest):
        f1s, rest = rest[:kb], rest[kb:]
        gs, rest = rest[:kb], rest[kb:]
        ms, rest = rest[:kb], rest[kb:]
        ls, rest = rest[:kb], rest[kb:]
        ds, rest = rest[:kb], rest[kb:]
        dh_ref, df2_ref, dh_scr, df2_scr = rest
        i = pl.program_id(0)
        is_first, is_last = _group_edges(i, grp_ref, nsteps, kb)

        @pl.when(is_first)
        def _():
            dh_scr[...] = jnp.zeros_like(dh_scr)
            df2_scr[...] = jnp.zeros_like(df2_scr)

        f2, h = f2_ref[...], h_ref[...]
        for k in range(kb):
            # original (dest-row, src-col) orientation — grp is the SOURCE
            # tile in this pass, so the mask's dim 0 pairs with the slot
            # (dest-side) operands and dim 1 with f2/h
            mask = _densify_mask(rows_ref[k], cols_ref[k], vals_ref[k],
                                 tile, e_b)
            _bwd_col_update(mask, f1s[k][...], f2, h, gs[k][...],
                            ms[k][...], ls[k][...], ds[k][...],
                            dh_scr, df2_scr, num_heads, feat, slope,
                            precision)

        @pl.when(is_last)
        def _():
            dh_ref[...] = dh_scr[...]
            df2_ref[...] = df2_scr[...]

    return kernel


def _edge_specs(e_b, kb):
    return [
        pl.BlockSpec((kb, e_b), lambda i, gr, ot: (i, 0)),
        pl.BlockSpec((kb, e_b), lambda i, gr, ot: (i, 0)),
        pl.BlockSpec((kb, e_b), lambda i, gr, ot: (i, 0)),
    ]


def _grp_spec(shape, lo, kb):
    """Block indexed by the step's shared output tile (offset to the
    segment's local output range when ``lo`` > 0)."""
    if lo:
        return pl.BlockSpec(shape, lambda i, gr, ot: (gr[kb * i] - lo, 0))
    return pl.BlockSpec(shape, lambda i, gr, ot: (gr[kb * i], 0))


def _oth_slots(shape, kb):
    """kb auto-pipelined slot operands, one per chunk in the block."""
    return [
        pl.BlockSpec(shape, lambda i, gr, ot, k=k: (ot[kb * i + k], 0))
        for k in range(kb)
    ]


@functools.lru_cache(maxsize=None)
def _fwd_fn(nchunks, lo, span, tile, e_b, num_heads, feat, f_lane, h_pad,
            slope, interpret, prec_name):
    kb = _KB_FWD
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks // kb,),
        in_specs=(_edge_specs(e_b, kb)
                  + [_grp_spec((tile, f_lane), 0, kb)]        # f1
                  + _oth_slots((tile, f_lane), kb)            # f2 slots
                  + _oth_slots((tile, h_pad), kb)),           # h slots
        out_specs=(
            _grp_spec((tile, h_pad), lo, kb),
            _grp_spec((tile, f_lane), lo, kb),
            _grp_spec((tile, f_lane), lo, kb),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, f_lane), jnp.float32),
            pltpu.VMEM((tile, f_lane), jnp.float32),
            pltpu.VMEM((tile, h_pad), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_fwd_kernel(num_heads, feat, nchunks // kb, slope, tile, e_b,
                         kb, _PRECISIONS[prec_name]),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((span * tile, h_pad), jnp.float32),
            jax.ShapeDtypeStruct((span * tile, f_lane), jnp.float32),
            jax.ShapeDtypeStruct((span * tile, f_lane), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _bwd_row_fn(nchunks, lo, span, tile, e_b, num_heads, feat, f_lane,
                h_pad, slope, interpret, prec_name):
    kb = _KB_FWD
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks // kb,),
        in_specs=(_edge_specs(e_b, kb)
                  + [_grp_spec((tile, f_lane), 0, kb),        # f1
                     _grp_spec((tile, h_pad), 0, kb),         # g
                     _grp_spec((tile, f_lane), 0, kb),        # m
                     _grp_spec((tile, f_lane), 0, kb),        # l
                     _grp_spec((tile, f_lane), 0, kb)]        # d
                  + _oth_slots((tile, f_lane), kb)            # f2 slots
                  + _oth_slots((tile, h_pad), kb)),           # h slots
        out_specs=_grp_spec((tile, f_lane), lo, kb),
        scratch_shapes=[pltpu.VMEM((tile, f_lane), jnp.float32)],
    )
    return pl.pallas_call(
        _make_bwd_row_kernel(num_heads, feat, nchunks // kb, slope, tile,
                             e_b, kb, _PRECISIONS[prec_name]),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((span * tile, f_lane), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _bwd_col_fn(nchunks, lo, span, tile, e_b, num_heads, feat, f_lane,
                h_pad, slope, interpret, prec_name):
    kb = _KB_COL
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks // kb,),
        in_specs=(_edge_specs(e_b, kb)
                  + [_grp_spec((tile, f_lane), 0, kb),        # f2
                     _grp_spec((tile, h_pad), 0, kb)]         # h
                  + _oth_slots((tile, f_lane), kb)            # f1 slots
                  + _oth_slots((tile, h_pad), kb)             # g slots
                  + _oth_slots((tile, f_lane), kb)            # m slots
                  + _oth_slots((tile, f_lane), kb)            # l slots
                  + _oth_slots((tile, f_lane), kb)),          # d slots
        out_specs=(
            _grp_spec((tile, h_pad), lo, kb),
            _grp_spec((tile, f_lane), lo, kb),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, h_pad), jnp.float32),
            pltpu.VMEM((tile, f_lane), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_bwd_col_kernel(num_heads, feat, nchunks // kb, slope, tile,
                             e_b, kb, _PRECISIONS[prec_name]),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((span * tile, h_pad), jnp.float32),
            jax.ShapeDtypeStruct((span * tile, f_lane), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )


def _dims(ac: AttnCoo, num_heads: int, feat: int):
    n_pad = ac.n_tiles * ac.tile
    hf = num_heads * feat
    h_pad = max(128, -(-hf // 128) * 128)
    f_lane = max(128, -(-num_heads // 128) * 128)
    return n_pad, hf, h_pad, f_lane


def _pad_inputs(ac: AttnCoo, arrays, widths):
    n_pad = ac.n_tiles * ac.tile
    out = []
    for x, width in zip(arrays, widths):
        p = jnp.zeros((n_pad, width), jnp.float32)
        out.append(p.at[: x.shape[0], : x.shape[1]].set(
            x.astype(jnp.float32)))
    return out


def _run_segments(segs, fn_builder, args_for, n_outs):
    """Launch one pallas_call per segment; concat outputs along tiles."""
    parts = [[] for _ in range(n_outs)]
    for seg in segs:
        res = fn_builder(seg)(seg.grp, seg.oth, seg.rows, seg.cols,
                              seg.vals, *args_for(seg))
        if n_outs == 1:
            res = (res,)
        for j in range(n_outs):
            parts[j].append(res[j])
    outs = [p[0] if len(p) == 1 else jnp.concatenate(p, axis=0)
            for p in parts]
    return outs[0] if n_outs == 1 else tuple(outs)


def _coo_fwd_stats(ac, f1p, f2p, hp, num_heads, feat, slope, interpret,
                   precision="highest"):
    _, _, h_pad, f_lane = _dims(ac, num_heads, feat)
    kb = _KB_FWD

    def builder(seg):
        return _fwd_fn(int(seg.grp.shape[0]), seg.lo, seg.hi - seg.lo,
                       ac.tile, ac.e_b, num_heads, feat, f_lane, h_pad,
                       slope, interpret, precision)

    return _run_segments(
        ac.fwd, builder,
        lambda seg: (f1p,) + (f2p,) * kb + (hp,) * kb, 3)


def coo_gat_attention(ac: AttnCoo, f1, f2, h, *, num_heads: int, feat: int,
                      n_out: int, slope: float = 0.2,
                      interpret: bool = False, precision: str = "highest"):
    """Fused graph attention over COO-chunk tables (non-differentiable
    entry; see :func:`gat_attention_coo` for the custom-VJP one). Same
    contract as :func:`pallas_attention.bsr_gat_attention`. ``precision``:
    "highest" = 6-pass f32 head contractions (parity mode); "default" =
    single-pass bf16 with f32 accumulation (~6x fewer MXU FLOPs, ~4e-3
    relative error — the at-scale training mode)."""
    _, hf, h_pad, f_lane = _dims(ac, num_heads, feat)
    f1p, f2p, hp = _pad_inputs(ac, (f1, f2, h), (f_lane, f_lane, h_pad))
    out, _, _ = _coo_fwd_stats(ac, f1p, f2p, hp, num_heads, feat, slope,
                               interpret, precision)
    return out[:n_out, :hf]


def gat_attention_coo(ac: AttnCoo, f1, f2, h, *, num_heads: int, feat: int,
                      n_out: int, slope: float = 0.2,
                      interpret: bool = False, precision: str = "highest"):
    """Differentiable fused attention over COO-chunk tables (custom VJP:
    two-pass flash-style backward, column pass over the transpose tables).
    See :func:`coo_gat_attention` for the ``precision`` contract."""
    fn = _gat_attention_coo_vjp(ac, num_heads, feat, n_out, slope,
                                interpret, precision)
    return fn(f1, f2, h)


def _gat_attention_coo_vjp(ac, num_heads, feat, n_out, slope, interpret,
                           precision="highest"):
    _, hf, h_pad, f_lane = _dims(ac, num_heads, feat)

    @jax.custom_vjp
    def _apply(f1, f2, h):
        f1p, f2p, hp = _pad_inputs(ac, (f1, f2, h),
                                   (f_lane, f_lane, h_pad))
        out, _, _ = _coo_fwd_stats(ac, f1p, f2p, hp, num_heads, feat,
                                   slope, interpret, precision)
        return out[:n_out, :hf]

    def _apply_fwd(f1, f2, h):
        f1p, f2p, hp = _pad_inputs(ac, (f1, f2, h),
                                   (f_lane, f_lane, h_pad))
        out, m, l = _coo_fwd_stats(ac, f1p, f2p, hp, num_heads, feat,
                                   slope, interpret, precision)
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

        def row_builder(seg):
            return _bwd_row_fn(int(seg.grp.shape[0]), seg.lo,
                               seg.hi - seg.lo, ac.tile, ac.e_b, num_heads,
                               feat, f_lane, h_pad, slope, interpret,
                               precision)

        df1 = _run_segments(
            ac.fwd, row_builder,
            lambda seg: ((f1p, gp, m, l, dp)
                         + (f2p,) * _KB_FWD + (hp,) * _KB_FWD), 1)

        def col_builder(seg):
            return _bwd_col_fn(int(seg.grp.shape[0]), seg.lo,
                               seg.hi - seg.lo, ac.tile, ac.e_b, num_heads,
                               feat, f_lane, h_pad, slope, interpret,
                               precision)

        dh, df2 = _run_segments(
            ac.bwd, col_builder,
            lambda seg: ((f2p, hp) + (f1p,) * _KB_COL + (gp,) * _KB_COL
                         + (m,) * _KB_COL + (l,) * _KB_COL
                         + (dp,) * _KB_COL), 2)

        return (df1[:n_out, :num_heads], df2[:n_out, :num_heads],
                dh[:n_out, :hf])

    _apply.defvjp(_apply_fwd, _apply_bwd)
    return _apply
