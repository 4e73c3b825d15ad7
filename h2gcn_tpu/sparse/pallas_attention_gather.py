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
    (``build_gscatter_coo(return_slots=True)`` exposes the edge→slot map)
    and α is scattered into the padded slot space at trace time; the
    weighting happens edge-major in XLA (per-head α broadcast over the
    head's feature slice), the one-hot MXU scatter kernel is reused
    unchanged. Chunks here are per destination 512-row stripe, so slot
    occupancy is ~90%+ instead of ~5%.

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

    tot_f = max(s.slot_hi for s in gs_f.segments)
    tot_b = max(s.slot_hi for s in gs_b.segments)
    return GatherAttn(
        fwd=gs_f, bwd=gs_b,
        rows=jnp.asarray(r, jnp.int32), cols=jnp.asarray(c, jnp.int32),
        slot_fwd=jnp.asarray(slot_f, jnp.int32),
        slot_bwd=jnp.asarray(slot_b, jnp.int32),
        slot2edge_fwd=inv(slot_f, tot_f),
        slot2edge_bwd=inv(slot_b, tot_b),
        n=n, num_edges=E, n_src=0 if m == n else m,
    )


def _weighted_combine(gs: GScatter, aw: jax.Array, xp: jax.Array,
                      num_heads: int, feat: int, exact: bool,
                      interpret: bool) -> jax.Array:
    """``out = Aα @ x`` over gscatter tables with traced per-edge per-head
    weights ``aw: [total_slots, H]`` (padding slots zero). ``xp`` is
    [n, f_pad] f32 (exact) or bf16. Returns [rb_total*tile, f_pad] f32."""
    f_pad = xp.shape[1]
    parts = []
    tok = None
    for seg in gs.segments:
        xp_seg = seg_aw = None
        if tok is not None:
            (xp_seg, seg_aw), _ = jax.lax.optimization_barrier(
                ((xp, aw), tok))
        else:
            xp_seg, seg_aw = xp, aw
        gathered = xp_seg[seg.cols]  # [padded_slots, f_pad]
        a = jax.lax.slice_in_dim(seg_aw, seg.slot_lo, seg.slot_hi, axis=0)
        pad = seg.cols.shape[0] - (seg.slot_hi - seg.slot_lo)
        if pad:
            a = jnp.pad(a, ((0, pad), (0, 0)))
        # per-head α broadcast over the head's feature slice, then padded
        # to the lane width; XLA fuses the repeat+pad into the multiply
        w = jnp.repeat(a, feat, axis=1)
        if f_pad != num_heads * feat:
            w = jnp.pad(w, ((0, 0), (0, f_pad - num_heads * feat)))
        weighted = gathered * w.astype(gathered.dtype)
        fn = _seg_fn(int(seg.ctr.shape[0]), seg.rb_hi - seg.rb_lo, gs.tile,
                     gs.e_b, gs.kb, f_pad, exact, interpret)
        out_seg = fn(seg.ctr, seg.rows, seg.vals, weighted)
        parts.append(out_seg)
        tok = out_seg[0, 0]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _scatter_alpha(slot2edge: jax.Array, alpha: jax.Array) -> jax.Array:
    """[E, H] per-edge values → [total_slots, H] padded slot space, as a
    GATHER through the precomputed inverse map (padding slots read the
    appended zero row). The direct ``.at[slot].set`` scatter lowers ~40×
    slower on this hardware (docs/bench_attn_parts.json)."""
    az = jnp.concatenate(
        [alpha, jnp.zeros((1, alpha.shape[1]), alpha.dtype)], axis=0)
    return az[slot2edge]


def _weighted_combine_aug(gs: GScatter, awf: jax.Array, awl: jax.Array,
                          xp_aug: jax.Array, num_heads: int, feat: int,
                          exact: bool, interpret: bool) -> jax.Array:
    """Augmented combine: per head, ``feat`` feature columns weighted by
    ``awf`` plus ONE trailing ones-column weighted by ``awl`` — so a
    single kernel pass yields both the softmax numerator and the
    denominator ``l_i = Σ_e p_e`` (the ones-column output). ``awf``/
    ``awl`` are [total_slots, H]; they differ only under attention
    dropout (numerator masked, denominator not)."""
    f1p = feat + 1
    f_pad = xp_aug.shape[1]
    parts = []
    tok = None
    for seg in gs.segments:
        if tok is not None:
            (xp_seg, af, al), _ = jax.lax.optimization_barrier(
                ((xp_aug, awf, awl), tok))
        else:
            xp_seg, af, al = xp_aug, awf, awl
        gathered = xp_seg[seg.cols]
        sl = slice(seg.slot_lo, seg.slot_hi)
        af = af[sl]
        al = al[sl]
        pad = seg.cols.shape[0] - (seg.slot_hi - seg.slot_lo)
        if pad:
            af = jnp.pad(af, ((0, pad), (0, 0)))
            al = jnp.pad(al, ((0, pad), (0, 0)))
        ns = af.shape[0]
        w = jnp.concatenate(
            [jnp.repeat(af, feat, axis=1).reshape(ns, num_heads, feat),
             al[:, :, None]], axis=2).reshape(ns, num_heads * f1p)
        if f_pad != num_heads * f1p:
            w = jnp.pad(w, ((0, 0), (0, f_pad - num_heads * f1p)))
        weighted = gathered * w.astype(gathered.dtype)
        fn = _seg_fn(int(seg.ctr.shape[0]), seg.rb_hi - seg.rb_lo, gs.tile,
                     gs.e_b, gs.kb, f_pad, exact, interpret)
        out_seg = fn(seg.ctr, seg.rows, seg.vals, weighted)
        parts.append(out_seg)
        tok = out_seg[0, 0]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


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
    rows, cols = ga.rows, ga.cols

    def _prep(x, width):
        xp = x.astype(jnp.float32)
        if width != xp.shape[1]:
            xp = jnp.pad(xp, ((0, 0), (0, width - xp.shape[1])))
        if not exact:
            xp = xp.astype(jnp.bfloat16)
        return xp

    def _edge_terms(f1, f2):
        f1f, f2f = f1.astype(jnp.float32), f2.astype(jnp.float32)
        s = f1f[rows] + f2f[cols]
        t = jnp.where(s >= 0, s, slope * s)
        b = f1f + jnp.max(f2f, axis=0, keepdims=True)
        b = jnp.where(b >= 0, b, slope * b)
        z = t - b[rows]
        live = z > -60.0  # f32-underflow guard; see gat_attention_gather
        p = jnp.exp(jnp.maximum(z, -60.0))
        return s, p, live

    def _ones_aug(h):
        return _augx(h, jnp.ones((h.shape[0], num_heads), jnp.float32),
                     num_heads, feat)

    def _fwd_parts(f1, f2, h, m):
        _, p, _ = _edge_terms(f1, f2)
        awf = _scatter_alpha(ga.slot2edge_fwd, p * m)
        awl = _scatter_alpha(ga.slot2edge_fwd, p)
        out_aug = _weighted_combine_aug(
            ga.fwd, awf, awl, _prep(_ones_aug(h), f_pad_aug),
            num_heads, feat, exact, interpret)[: ga.n, :hf1]
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
        s, p, live = _edge_terms(f1, f2)
        q = jnp.where(s >= 0, 1.0, slope) * jnp.where(live, p, 0.0)
        qm = q * m
        # dh: transpose combine, weights wf = p·m (source-row cotangents —
        # [num_src] rows on rectangular/distributed supports)
        aw_b = _scatter_alpha(ga.slot2edge_bwd, p * m)
        dh = _weighted_combine(ga.bwd, aw_b, _prep(gN, f_pad), num_heads,
                               feat, exact, interpret)[: ga.num_src, :hf]
        # df1 via forward tables
        nt = _weighted_combine_aug(
            ga.fwd, _scatter_alpha(ga.slot2edge_fwd, qm),
            _scatter_alpha(ga.slot2edge_fwd, q),
            _prep(_ones_aug(h), f_pad_aug),
            num_heads, feat, exact, interpret)[: ga.n, :hf1]
        nt3 = nt.reshape(-1, num_heads, f1p)
        df1 = (jnp.sum(gN.reshape(-1, num_heads, feat) * nt3[..., :feat],
                       axis=-1) + gl * nt3[..., feat])
        # df2 via transpose tables
        tt = _weighted_combine_aug(
            ga.bwd, _scatter_alpha(ga.slot2edge_bwd, qm),
            _scatter_alpha(ga.slot2edge_bwd, q),
            _prep(_augx(gN, gl, num_heads, feat), f_pad_aug),
            num_heads, feat, exact, interpret)[: ga.num_src, :hf1]
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

    @jax.custom_vjp
    def combine(alpha, h):
        aw = _scatter_alpha(ga.slot2edge_fwd, alpha)
        out = _weighted_combine(ga.fwd, aw, _prep_x(h), num_heads, feat,
                                exact, interpret)
        return out[: ga.n, :hf]

    def combine_fwd(alpha, h):
        return combine(alpha, h), (alpha, h)

    def combine_bwd(res, g):
        alpha, h = res
        gf = g.astype(jnp.float32)
        # dh = (Aα)ᵀ @ g: same α, transpose tables (edges grouped by src)
        aw_b = _scatter_alpha(ga.slot2edge_bwd, alpha)
        dh = _weighted_combine(ga.bwd, aw_b, _prep_x(gf), num_heads, feat,
                               exact, interpret)[: ga.num_src, :hf]
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
