"""Gather-based fused graph attention for the ultra-sparse regime.

The attention analogue of :mod:`pallas_gscatter` (VERDICT r3 task #1): at
120K nodes the COO-chunk attention kernel schedules ~25.3M edge slots for
1.32M edges (~5% occupancy) because its chunks are per (dest-tile,
src-tile) PAIR — at power-law sparsity nearly every pair holds a handful
of edges. This path splits the work at the same boundary the SpMM ladder
does:

  * **SDDMM + softmax (XLA, edge-major)**: attention logits are pure
    per-edge gathers of per-node scalars —
    ``logit_e = LeakyReLU(f1[row_e] + f2[col_e])`` — followed by
    per-destination segment max / sum over the CSR-sorted edge list. All
    O(E·H) scalars, riding the measured ~43GB/s random stream; no tile
    densification at all.
  * **combine (Pallas, MXU)**: ``out_i = Σ_e α_e · h[col_e]`` is exactly a
    gather-scatter SpMM with DYNAMIC per-edge values — the
    :mod:`pallas_gscatter` chunk tables are built once per graph
    (``build_gscatter_coo(return_slots=True)`` exposes the edge→slot map).
    Per-edge weights are lane-EXPANDED on the E-sized edge table with one
    MXU one-hot dot (:func:`_expand_edge_weights`) and reach the slot
    space as a near-sequential gather through the ``slot2edge`` inverse
    map, fused into the weighting multiply; the one-hot MXU scatter
    kernel is reused unchanged. (The previous slot-space fill + per-lane
    ``repeat`` lowered to a lane shuffle that DOMINATED the combine —
    20.7 of 29.2 ms at 120K, docs/bench_attn_parts.json parts_120k.)
    Chunks here are per destination 512-row stripe, so slot occupancy is
    ~90%+ instead of ~5%.

NEITHER direction runs any segment op: the whole attention is one custom
VJP (:func:`_make_attention`). The forward's softmax denominator comes out
of the same MXU combine pass via an augmented ones-column; the backward's
per-edge chain rule FACTORS per destination/source row, so df1/df2/dh are
three more combine passes (two augmented, one plain over transpose
tables) plus O(E·H) edge-major elementwise work — no E×H·feat SDDMM and
no ``segment_sum`` anywhere (XLA TPU scatters here are ~40× slower than
the equivalent gathers, docs/bench_attn_parts.json).

Because α MATERIALIZES per edge here (unlike the flash-style kernels),
this path also supports attention-coefficient dropout (reference
``baselines/GAT/utils/layers.py:53-100`` applies dropout to the softmaxed
coefficients), which the chunk kernels cannot express.

Precision contract matches the chunk kernel: ``highest`` = f32 gathers +
3-pass bf16-exact combine; ``default`` = bf16 gathered stream, one MXU
pass (~4e-3 relative error).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .pallas_gscatter import GScatter, _seg_fn, build_gscatter_coo, F_TILE


@struct.dataclass
class GatherAttn:
    """Fused-attention payload: gscatter chunk tables in both orientations
    plus the raw edge list (CSR order) and edge→slot maps.

    ``fwd`` tables group edges by destination 512-stripe (drive the
    forward combine and carry ``dh``'s gather source ordering); ``bwd``
    tables group the SAME edges by source stripe (transpose orientation,
    drive ``dh``). ``slot_fwd[k]`` / ``slot_bwd[k]`` locate CSR-order edge
    ``k`` in each table's global pre-padding slot space."""

    fwd: GScatter
    bwd: GScatter
    rows: jax.Array       # [E] int32 dest node per edge (CSR order)
    cols: jax.Array       # [E] int32 src node per edge
    slot_fwd: jax.Array   # [E] int32
    slot_bwd: jax.Array   # [E] int32
    # inverse maps: slot → edge index, padding slots → E (a sentinel row
    # of zeros appended to α at trace time). Filling the slot space is a
    # GATHER through these — XLA lowers the equivalent [E]→[slots]
    # .at[].set scatter ~40× slower (121 ms vs ~3 at 120K,
    # docs/bench_attn_parts.json)
    slot2edge_fwd: jax.Array  # [total_slots_fwd] int32
    slot2edge_bwd: jax.Array  # [total_slots_bwd] int32
    # slot-space edge endpoints: the edge at fwd slot s runs
    # rows_sf[s] → cols_sf[s] (padding slots → (0, 0), killed by the
    # chunk tables' zero vals). These let every per-edge score/weight be
    # computed DIRECTLY in slot order from small node-space tables — no
    # [E, H] intermediate (×16 HBM-padded) and no slot2edge weight gather
    # (docs/bench_attn_parts.json: that gather alone cost 14.7 ms at 120K
    # because its source table is E-sized)
    rows_sf: jax.Array = None  # [total_slots_fwd] int32
    cols_sf: jax.Array = None
    rows_sb: jax.Array = None  # [total_slots_bwd] int32
    cols_sb: jax.Array = None
    n: int = struct.field(pytree_node=False, default=0)
    num_edges: int = struct.field(pytree_node=False, default=0)
    # source-row count for RECTANGULAR supports (dest rows × source rows):
    # the distributed dest-stripe sharding attends local rows over the
    # concatenated [local | halo-recv] source space (parallel/attention.py).
    # 0 = square (n sources), the single-device case.
    n_src: int = struct.field(pytree_node=False, default=0)

    @property
    def num_src(self) -> int:
        return self.n_src or self.n

    @property
    def total_slots_fwd(self) -> int:
        return max(s.slot_hi for s in self.fwd.segments)

    @property
    def total_slots_bwd(self) -> int:
        return max(s.slot_hi for s in self.bwd.segments)


def build_gatherattn(csr, tile: int = 512, e_b: int = 128,
                     kb: int = 8) -> GatherAttn:
    """Host prep from the attention support matrix (mask semantics: any
    stored nonzero is an edge; values are ignored, matching the chunk
    kernels' ``mask = vals > 0``). Rectangular supports (n dest rows ×
    m source rows) are the distributed dest-stripe shards: f1 is indexed
    over dest rows, f2/h over source rows."""
    import scipy.sparse as sp

    csr = sp.csr_matrix(csr)
    n, m = csr.shape
    coo = csr.tocoo()
    r = coo.row.astype(np.int64)
    c = coo.col.astype(np.int64)
    ones = np.ones(len(r), np.float32)
    gs_f, slot_f = build_gscatter_coo(r, c, ones, (n, m), tile=tile,
                                      e_b=e_b, kb=kb, return_slots=True)
    gs_b, slot_b = build_gscatter_coo(c, r, ones, (m, n), tile=tile,
                                      e_b=e_b, kb=kb, return_slots=True)
    E = len(r)

    def inv(slots, total):
        s2e = np.full(total, E, np.int32)  # padding → sentinel zero row
        s2e[slots] = np.arange(E, dtype=np.int32)
        return jnp.asarray(s2e)

    def endpoints(slots, total):
        rs = np.zeros(total, np.int32)
        cs = np.zeros(total, np.int32)
        rs[slots] = r
        cs[slots] = c
        return jnp.asarray(rs), jnp.asarray(cs)

    tot_f = max(s.slot_hi for s in gs_f.segments)
    tot_b = max(s.slot_hi for s in gs_b.segments)
    rsf, csf = endpoints(slot_f, tot_f)
    rsb, csb = endpoints(slot_b, tot_b)
    return GatherAttn(
        fwd=gs_f, bwd=gs_b,
        rows=jnp.asarray(r, jnp.int32), cols=jnp.asarray(c, jnp.int32),
        slot_fwd=jnp.asarray(slot_f, jnp.int32),
        slot_bwd=jnp.asarray(slot_b, jnp.int32),
        slot2edge_fwd=inv(slot_f, tot_f),
        slot2edge_bwd=inv(slot_b, tot_b),
        rows_sf=rsf, cols_sf=csf, rows_sb=rsb, cols_sb=csb,
        n=n, num_edges=E, n_src=0 if m == n else m,
    )


def _sel_plain(num_heads: int, feat: int, f_pad: int) -> np.ndarray:
    """One-hot [H, f_pad]: lane ``l`` reads head ``l // feat`` (zeros past
    ``H·feat``) — the head-blocked plain layout."""
    lanes = np.arange(f_pad)
    return ((((lanes[None, :] // feat) == np.arange(num_heads)[:, None])
             & (lanes[None, :] < num_heads * feat))).astype(np.float32)


def _sel_aug_full(num_heads: int, feat: int, f_pad: int) -> np.ndarray:
    """One-hot [H, f_pad] for the AUGMENTED layout: ALL ``feat+1`` lanes
    of head ``h``'s block (features + trailing ones-column) read head
    ``h``."""
    f1p = feat + 1
    lanes = np.arange(f_pad)
    return ((((lanes[None, :] // f1p) == np.arange(num_heads)[:, None])
             & (lanes[None, :] < num_heads * f1p))).astype(np.float32)


def _sel_aug_feat(num_heads: int, feat: int, f_pad: int) -> np.ndarray:
    """Aug-layout one-hot covering ONLY the feature lanes (the dropout
    mask multiplies the numerator, never the trailing denominator)."""
    f1p = feat + 1
    lanes = np.arange(f_pad)
    oh = _sel_aug_full(num_heads, feat, f_pad)
    oh[:, (lanes % f1p) == feat] = 0.0
    return oh


def _trail_aug(num_heads: int, feat: int, f_pad: int) -> np.ndarray:
    """[1, f_pad] ones at the aug layout's trailing (denominator) lanes."""
    f1p = feat + 1
    lanes = np.arange(f_pad)
    t = ((lanes % f1p) == feat) & (lanes < num_heads * f1p)
    return t.astype(np.float32)[None, :]


def _expand_node(x: jax.Array, oh) -> jax.Array:
    """[n, H] per-node per-head values → [n, f_pad] lane expansion via an
    MXU one-hot dot (exact at HIGHEST: the one-hot operand is bf16-exact;
    a per-lane ``repeat`` lowers to a lane shuffle XLA executes ~8×
    slower — docs/bench_attn_parts.json parts_120k)."""
    return jnp.dot(x.astype(jnp.float32), jnp.asarray(oh),
                   precision=jax.lax.Precision.HIGHEST)


def _slicepad(arr: jax.Array, lo: int, hi: int, pad_to: int,
              pad_value=0) -> jax.Array:
    idx = jax.lax.slice_in_dim(arr, lo, hi, axis=0)
    if pad_to > hi - lo:
        cfg = [(0, pad_to - (hi - lo))] + [(0, 0)] * (arr.ndim - 1)
        idx = jnp.pad(idx, cfg, constant_values=pad_value)
    return idx


def _weighted_combine(gs: GScatter, wtables, wfn, xp: jax.Array,
                      exact: bool, interpret: bool) -> jax.Array:
    """``out = Aw @ x`` over gscatter tables with traced per-slot weights
    built PER SEGMENT by ``wfn(wtables, slot_lo, slot_hi, padded_len) →
    [padded_len, f_pad]``. The builder computes each segment's weight
    block directly in slot order from small node-space tables (slot-direct
    — no [E, H] ×16-HBM-padded intermediates, no E-sized-table gathers);
    ``wtables`` rides the inter-segment optimization_barrier so only one
    segment's multi-GB weight/gather transients are live at a time. ``xp``
    is [n, f_pad] f32 (exact) or bf16.
    Returns [rb_total*tile, f_pad] f32."""
    f_pad = xp.shape[1]
    parts = []
    tok = None
    for seg in gs.segments:
        if tok is not None:
            (xp_seg, wt_seg), _ = jax.lax.optimization_barrier(
                ((xp, wtables), tok))
        else:
            xp_seg, wt_seg = xp, wtables
        gathered = xp_seg[seg.cols]  # [padded_slots, f_pad]
        w = wfn(wt_seg, seg.slot_lo, seg.slot_hi, int(seg.cols.shape[0]))
        weighted = gathered * w.astype(gathered.dtype)
        fn = _seg_fn(int(seg.ctr.shape[0]), seg.rb_hi - seg.rb_lo, gs.tile,
                     gs.e_b, gs.kb, f_pad, exact, interpret)
        out_seg = fn(seg.ctr, seg.rows, seg.vals, weighted)
        parts.append(out_seg)
        tok = out_seg[0, 0]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _wfn_edge_table(wx: jax.Array, s2e: jax.Array, exact: bool):
    """Weight builder from an [E+1, f_pad] edge-expanded table routed
    through the slot2edge map (used where per-edge weights exist only as
    an explicit tensor, e.g. :func:`_make_combine`'s α input). The main
    attention path computes weights slot-direct instead — this builder's
    E-sized-table gather costs ~14.7 ms at 120K."""
    if not exact:
        wx = wx.astype(jnp.bfloat16)
    sentinel = wx.shape[0] - 1

    def fn(tabs, lo, hi, pad_to):
        wx_, s2e_ = tabs
        return wx_[_slicepad(s2e_, lo, hi, pad_to, sentinel)]

    return (wx, s2e), fn


def _scatter_alpha(slot2edge: jax.Array, alpha: jax.Array) -> jax.Array:
    """[E, H] per-edge values → [total_slots, H] padded slot space, as a
    GATHER through the precomputed inverse map (padding slots read the
    appended zero row). The direct ``.at[slot].set`` scatter lowers ~40×
    slower on this hardware (docs/bench_attn_parts.json)."""
    az = jnp.concatenate(
        [alpha, jnp.zeros((1, alpha.shape[1]), alpha.dtype)], axis=0)
    return az[slot2edge]


def _augx(x, xb, num_heads: int, feat: int) -> jax.Array:
    """[n, H·feat] features + [n, H] extra-column values → head-blocked
    [n, H·(feat+1)] layout for the augmented combine (forward passes put
    ones in the extra column to read off the softmax denominator; the
    backward's df2 pass puts gl there)."""
    n = x.shape[0]
    return jnp.concatenate(
        [x.astype(jnp.float32).reshape(n, num_heads, feat),
         xb.astype(jnp.float32)[:, :, None]], axis=2
    ).reshape(n, num_heads * (feat + 1))


def _make_attention(ga: GatherAttn, num_heads: int, feat: int,
                    slope: float, exact: bool, interpret: bool):
    """Whole-attention custom VJP: ``(f1, f2, h, m) → out [n, H·feat]``
    with NO segment ops in either direction and no E×H·feat SDDMM.

    Forward: one augmented combine (numerator + denominator in a single
    MXU pass; the softmax max is replaced by the shift-invariant bound
    ``LRelu(f1 + max f2)``, exact for softmax and its gradients).

    Backward: the per-edge chain
    ``ds_e = lrelu'(s_e)·p_e·(m_e·gN[r_e]·h[c_e] + gl[r_e])`` FACTORS per
    destination/source row, so the edge reductions become three more
    kernel passes instead of segment scatters:

      * ``dh = Σ_e wf_e·gN[r_e]`` — plain combine over transpose tables;
      * ``df1_i = gN_i·Ñ_i + gl_i·l̃_i`` with ``[Ñ|l̃] =
        aug-combine(q·m, q, h|ones)`` over the forward tables;
      * ``df2_j = h_j·T1_j + T2_j`` with ``[T1|T2] =
        aug-combine(q·m, q, gN|gl)`` over the transpose tables;

    where ``q = lrelu'·p`` (zeroed on clamped edges), ``gN = G/l̂``,
    ``gl = −(G·out)/l̂``. ``m`` is the attention-dropout mask (ones when
    inactive); its cotangent is returned as zeros (masks are not
    differentiated — bernoulli has no gradient path)."""
    hf = num_heads * feat
    f1p = feat + 1
    hf1 = num_heads * f1p
    f_pad_aug = max(F_TILE, -(-hf1 // F_TILE) * F_TILE)
    f_pad = max(F_TILE, -(-hf // F_TILE) * F_TILE)
    oh_plain = _sel_plain(num_heads, feat, f_pad)
    oh_aug = _sel_aug_full(num_heads, feat, f_pad_aug)
    oh_aug_feat = _sel_aug_feat(num_heads, feat, f_pad_aug)
    trail = _trail_aug(num_heads, feat, f_pad_aug)

    def _prep(x, width):
        xp = x.astype(jnp.float32)
        if width != xp.shape[1]:
            xp = jnp.pad(xp, ((0, 0), (0, width - xp.shape[1])))
        if not exact:
            xp = xp.astype(jnp.bfloat16)
        return xp

    def _node_tables(f1, f2, oh):
        """Lane-expanded node-space score tables: everything per-edge is
        then computable in SLOT order with three small-table row gathers
        — no [E, H] intermediates at all."""
        f1f, f2f = f1.astype(jnp.float32), f2.astype(jnp.float32)
        b = f1f + jnp.max(f2f, axis=0, keepdims=True)
        b = jnp.where(b >= 0, b, slope * b)
        return _expand_node(f1f, oh), _expand_node(f2f, oh), \
            _expand_node(b, oh)

    def _m_slots(m, slot2edge):
        """Dropout mask routed to slot space ([S, H]; only when a real
        mask is present — ones arrive as the static (1, 1) sentinel)."""
        if m.shape == (1, 1):
            return None
        return _scatter_alpha(slot2edge, m)

    def _score_wfn(rows_s, cols_s, mslots, oh_mask, aug: bool,
                   want_q: bool):
        """Slot-direct weight builder: per segment, gather the expanded
        node tables at the slot endpoints and evaluate the softmax chain
        in full-lane layout. ``aug``: trailing lanes carry the UNMASKED
        numerator weight (the denominator / ones-column); the mask factor
        multiplies feature lanes only."""
        def fn(tabs, lo, hi, pad_to):
            f1x, f2x, bx, rs_all, cs_all, ms = tabs
            rs = _slicepad(rs_all, lo, hi, pad_to)
            cs = _slicepad(cs_all, lo, hi, pad_to)
            sx = f1x[rs] + f2x[cs]
            zx = jnp.where(sx >= 0, sx, slope * sx) - bx[rs]
            px = jnp.exp(jnp.maximum(zx, -60.0))
            if want_q:  # q = lrelu'(s)·p, zeroed on clamped edges
                px = jnp.where(sx >= 0, 1.0, slope) \
                    * jnp.where(zx > -60.0, px, 0.0)
            if ms is not None:
                mseg = _slicepad(ms, lo, hi, pad_to)
                mx = _expand_node(mseg, oh_mask)
                if aug:
                    mx = mx + jnp.asarray(trail)
                px = px * mx
            return px

        return (rows_s, cols_s), fn

    def _run(gs, rows_s, cols_s, slot2edge, m, x, width, *, aug, want_q):
        f1x, f2x, bx = _tabs[("aug" if aug else "plain")]
        ms = _m_slots(m, slot2edge)
        (rc, cc), fn = _score_wfn(rows_s, cols_s, ms,
                                  oh_aug_feat if aug else oh_plain,
                                  aug, want_q)
        wtables = (f1x, f2x, bx, rc, cc, ms)
        return _weighted_combine(gs, wtables, fn, _prep(x, width), exact,
                                 interpret)

    def _ones_aug(h):
        return _augx(h, jnp.ones((h.shape[0], num_heads), jnp.float32),
                     num_heads, feat)

    _tabs = {}

    def _fwd_parts(f1, f2, h, m):
        _tabs["aug"] = _node_tables(f1, f2, oh_aug)
        out_aug = _run(ga.fwd, ga.rows_sf, ga.cols_sf, ga.slot2edge_fwd,
                       m, _ones_aug(h), f_pad_aug, aug=True,
                       want_q=False)[: ga.n, :hf1]
        oa = out_aug.reshape(-1, num_heads, f1p)
        l = oa[..., feat]
        lhat = jnp.where(l == 0, 1.0, l)
        out = (oa[..., :feat] / lhat[..., None]).reshape(-1, hf)
        return out, l

    @jax.custom_vjp
    def attn(f1, f2, h, m):
        return _fwd_parts(f1, f2, h, m)[0]

    def attn_fwd(f1, f2, h, m):
        out, l = _fwd_parts(f1, f2, h, m)
        return out, (f1, f2, h, m, l, out)

    def attn_bwd(res, G):
        f1, f2, h, m, l, out = res
        G = G.astype(jnp.float32)
        lhat = jnp.where(l == 0, 1.0, l)
        G3 = G.reshape(-1, num_heads, feat)
        out3 = out.astype(jnp.float32).reshape(-1, num_heads, feat)
        gN = (G3 / lhat[..., None]).reshape(-1, hf)
        gl = -jnp.sum(G3 * out3, axis=-1) / lhat
        _tabs["plain"] = _node_tables(f1, f2, oh_plain)
        _tabs["aug"] = _node_tables(f1, f2, oh_aug)
        # dh: transpose combine, weights p·m (source-row cotangents —
        # [num_src] rows on rectangular/distributed supports)
        dh = _run(ga.bwd, ga.rows_sb, ga.cols_sb, ga.slot2edge_bwd, m,
                  gN, f_pad, aug=False, want_q=False)[: ga.num_src, :hf]
        # df1 via forward tables; df2 via transpose tables — both weighted
        # (q·m | q) in the aug layout, recomputed slot-direct per space
        nt = _run(ga.fwd, ga.rows_sf, ga.cols_sf, ga.slot2edge_fwd, m,
                  _ones_aug(h), f_pad_aug, aug=True,
                  want_q=True)[: ga.n, :hf1]
        nt3 = nt.reshape(-1, num_heads, f1p)
        df1 = (jnp.sum(gN.reshape(-1, num_heads, feat) * nt3[..., :feat],
                       axis=-1) + gl * nt3[..., feat])
        tt = _run(ga.bwd, ga.rows_sb, ga.cols_sb, ga.slot2edge_bwd, m,
                  _augx(gN, gl, num_heads, feat), f_pad_aug, aug=True,
                  want_q=True)[: ga.num_src, :hf1]
        tt3 = tt.reshape(-1, num_heads, f1p)
        df2 = (jnp.sum(h.astype(jnp.float32).reshape(-1, num_heads, feat)
                       * tt3[..., :feat], axis=-1) + tt3[..., feat])
        return (df1.astype(f1.dtype), df2.astype(f2.dtype),
                dh.astype(h.dtype), jnp.zeros_like(m))

    attn.defvjp(attn_fwd, attn_bwd)
    return attn


def _make_combine(ga: GatherAttn, num_heads: int, feat: int, exact: bool,
                  interpret: bool):
    """custom-VJP combine: out[n, H*feat] from per-edge α [E, H] and
    projected features h [n, H*feat]."""
    hf = num_heads * feat
    f_pad = max(F_TILE, -(-hf // F_TILE) * F_TILE)

    def _prep_x(h):
        xp = h.astype(jnp.float32)
        if f_pad != hf:
            xp = jnp.pad(xp, ((0, 0), (0, f_pad - hf)))
        if not exact:
            xp = xp.astype(jnp.bfloat16)
        return xp

    oh_plain = _sel_plain(num_heads, feat, f_pad)

    def _alpha_table(alpha):
        """α [E, H] → [E+1, f_pad] lane-expanded edge table (zero sentinel
        row) for the slot2edge-routed builder — the explicit-α utility
        path; the fused attention computes weights slot-direct instead."""
        az = jnp.concatenate(
            [alpha.astype(jnp.float32), jnp.zeros((1, alpha.shape[1]),
                                                  jnp.float32)], axis=0)
        return _expand_node(az, oh_plain)

    @jax.custom_vjp
    def combine(alpha, h):
        tabs, fn = _wfn_edge_table(_alpha_table(alpha), ga.slot2edge_fwd,
                                   exact)
        out = _weighted_combine(ga.fwd, tabs, fn, _prep_x(h), exact,
                                interpret)
        return out[: ga.n, :hf]

    def combine_fwd(alpha, h):
        return combine(alpha, h), (alpha, h)

    def combine_bwd(res, g):
        alpha, h = res
        gf = g.astype(jnp.float32)
        # dh = (Aα)ᵀ @ g: same α, transpose tables (edges grouped by src)
        tabs, fn = _wfn_edge_table(_alpha_table(alpha), ga.slot2edge_bwd,
                                   exact)
        dh = _weighted_combine(ga.bwd, tabs, fn, _prep_x(gf), exact,
                               interpret)[: ga.num_src, :hf]
        # dα_e[h] = g[row_e, h·feat:..] · hproj[col_e, h·feat:..] — an
        # edge-major SDDMM: two gathers + per-head contraction
        gg = gf[ga.rows].reshape(ga.num_edges, num_heads, feat)
        gh = h.astype(jnp.float32)[ga.cols].reshape(
            ga.num_edges, num_heads, feat)
        dalpha = jnp.sum(gg * gh, axis=-1)
        return dalpha, dh.astype(h.dtype)

    combine.defvjp(combine_fwd, combine_bwd)
    return combine


def gat_attention_gather(ga: GatherAttn, f1, f2, h, *, num_heads: int,
                         feat: int, n_out: int, slope: float = 0.2,
                         interpret: bool = False,
                         precision: str = "highest",
                         attn_drop: float = 0.0, drop_key=None):
    """Fused multi-head graph attention, gather formulation. Same contract
    as :func:`pallas_attention_coo.gat_attention_coo` (f1/f2: [n, H]
    dest/src scores, h: [n, H·feat] projected features → [n_out, H·feat])
    plus optional attention-coefficient dropout (``attn_drop``/
    ``drop_key``), which the chunk kernels cannot express because their
    coefficients never materialize."""
    exact = precision == "highest"
    # Stability WITHOUT a segment max: softmax is invariant to any per-row
    # shift, so _make_attention uses the per-destination UPPER BOUND
    # b_i = LRelu(f1_i + max_j f2_j) (LeakyReLU is monotone; the max is a
    # global per-head scalar) — p = exp(logit − b) ≤ 1 never overflows.
    # Underflow would need a per-row logit spread > 60 (pre-activation
    # attention scores of magnitude ~60 = a diverged run); such edges'
    # α are clamped toward 0, which true softmax would also send → 0.
    # Neither direction runs ANY segment op: the softmax denominator, the
    # backward df1/df2 edge reductions (which factor per destination/
    # source row — see _make_attention), and dh all ride the one-hot MXU
    # combine kernel (docs/bench_attn_parts.json: the forward segment ops
    # alone were 40 of 47 ms; XLA TPU scatters are ~40× slower than the
    # equivalent gathers).
    m = jnp.ones((1, 1), jnp.float32)
    if attn_drop and drop_key is not None:
        keep = jax.random.bernoulli(drop_key, 1.0 - attn_drop,
                                    (ga.num_edges, f1.shape[1]))
        m = jnp.where(keep, 1.0 / (1.0 - attn_drop), 0.0)
    out = _make_attention(ga, num_heads, feat, slope, exact, interpret)(
        f1, f2, h, m)
    return out[:n_out]


def gather_attention_coefficients(ga: GatherAttn, f1, f2, *,
                                  slope: float = 0.2):
    """Per-edge softmaxed attention coefficients [E, H] (CSR edge order) —
    the materialized analogue of the segment path's captured α, available
    here because coefficients exist as a tensor (unlike the flash-style
    chunk kernels)."""
    rows, cols = ga.rows, ga.cols
    logit = f1.astype(jnp.float32)[rows] + f2.astype(jnp.float32)[cols]
    logit = jnp.where(logit >= 0, logit, slope * logit)
    m = jax.ops.segment_max(logit, rows, num_segments=ga.n,
                            indices_are_sorted=True)
    p = jnp.exp(logit - m[rows])
    l = jax.ops.segment_sum(p, rows, num_segments=ga.n,
                            indices_are_sorted=True)
    return p / l[rows]
