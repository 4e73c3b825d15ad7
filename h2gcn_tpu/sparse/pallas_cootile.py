"""Pallas TPU kernel: COO-tile SpMM via on-the-fly tile densification.

The at-scale single-chip aggregation path for graphs whose BSR payload
explodes (huge unclustered graphs: at 250K nodes a 128-block BSR of a
random power-law Â₂ stores ~1 nnz per 64KB dense block). This kernel never
stores dense blocks: edges are chunked per ``T×T`` tile and each chunk
densifies ITSELF on the MXU with two one-hot mask contractions —

    gathered[e, :] = Σ_c 1[cols[e] = c] · x_tile[c, :]          (MXU)
    contrib[r, :]  = Σ_e 1[rows[e] = r] · vals[e]·gathered[e, :] (MXU)

so HBM traffic per chunk is 12·E_B bytes of edge data + the x tile
(amortized over all chunks of a tile row), instead of BSR's dense-block
payload. Replaces the reference's ``tf.sparse.sparse_dense_matmul``
(h2gcn/models/_layers.py:78-81) in the regime the reference could never
reach single-device.

Geometry: tiles are ``T×T``, chunks hold ``E_B`` edges, and one grid step
processes a ``KB``-chunk block — all three picked per matrix by
:func:`auto_geometry`'s measured two-roof cost model; chunk metadata
(tile row/col per chunk) rides the scalar-prefetch SMEM path. A v5e probe
(workbench/probe_step_overhead.py) showed ~0.63 µs of FIXED cost per grid
step (DMA descriptors + scalar bookkeeping; the mask build and MXU dots
add only ~0.64 µs combined), and the per-step cost stays ~0.5-0.7 µs as
the block deepens (workbench/probe_kb.py), so deeper blocks amortize it
almost linearly: the 250K-node Â₂ measured 227M → 266M → 289M edges/s at
kb = 8/16/32, with kb bounded by the VMEM the double-buffered slot x
tiles occupy. All kb chunks of a block must share one output tile row;
:func:`build_chunk_tables` pads every tile row's chunk list to a
multiple of ``kb`` with zero-valued filler chunks. Each chunk's x tile
arrives through its own slot operand (kb ``BlockSpec`` entries indexed
``tc[kb·i+k]``). SMEM is ~1MB, so the chunk list is split into segments
of ≤``_MAX_CHUNKS`` cut at tile-row boundaries — each segment is its own
``pallas_call`` writing a disjoint output row range.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

F_TILE = 128
_K = 8  # default chunks per grid step (kb); auto_geometry picks 8-64
_MAX_CHUNKS = 64 * 1024  # scalar-prefetch budget: 8B/chunk, SMEM ~1MB
# auto_geometry's slot-operand cap: 18MB admits the measured-best
# (512,128,kb=64)/bf16 at 17.3MB (250K ceiling probe, +2.5% over kb=32 —
# docs/bench_cootile_ceiling.json) while keeping untested >30MB corners
# (f32 kb=64 at t=512) out of the grid
_VMEM_BUDGET = 18 * 1024 * 1024
# hard scoped-VMEM ceiling passed to the compiler: the v5e has 128MB
# physical VMEM; the 16MB default is what historically blocked >2048
# tiles (mis-read as a hardware limit in r2 — see pallas_attention_coo)
_VMEM_LIMIT = 96 * 1024 * 1024

# Cost-model rates for auto_geometry: v5e public specs, bf16 MXU
# 197 TFLOP/s, exact mode ≈ 1/3 of it (the one-hot operand is exact in
# bf16, so only the dense side splits — 3 bf16 passes per contraction,
# see _onehot_dot_exact), HBM 819 GB/s. _STEP_OVERHEAD_S is the measured
# fixed cost of one grid STEP (DMA descriptors + scalar bookkeeping):
# a null-compute kernel with identical grid/DMA structure measured
# 0.63 µs/step on v5e (workbench/probe_step_overhead.py), invariant in
# (T, e_b) — the one-hot build + MXU dots together added only ~0.64 µs,
# i.e. the masks are effectively free next to the contraction. The
# _K-chunk block amortizes the step cost 8× per chunk.
_MXU_RATE = {"bf16": 197e12, "f32": 197e12 / 3}
_HBM_RATE = 819e9
_STEP_OVERHEAD_S = 0.7e-6
# Fraction of the x-tile DMA time the 8-chunk-block pipeline hides under
# the MXU contractions — fit on two on-chip sweeps (250K Â₂ + 131K probe,
# see auto_geometry's docstring); 0 recovers the serial one-chunk model.
_X_HIDE_FRAC = 0.55
# experimental knob: (buffer_count, use_lookahead) for the x slot operands
# (pl.Buffered multiple-buffering); None = pipeline default (double buffer).
# NOTE: this jax's XLA pipeline emitter rejects buffer_count > 2 and
# lookahead — kept for A/B probing on future runtimes.
_X_BUFFERING = None
# x-tile delivery: "slots" = kb auto-pipelined BlockSpec operands (the
# default); "manual" = in-kernel double-buffered async copies from HBM,
# with block i+1's copies started before block i's waits. A/B on the v5e
# (workbench/probe_xbuffering.py, 131K/8M probe): at kb=8 slots won
# (264M vs 242M edges/s at (512,128) — r2); the r3 rerun at the auto-kb
# geometries shows manual EDGING AHEAD at kb=32 (323M vs 298M at
# (512,128,kb32); tie at (1024,256,kb16)) — 32 slot operands saturate
# the pipeline scheduler where 2-deep manual copies don't. Kept on
# "slots" pending a geometry-conditional rule; rerun the probe before
# flipping.
_X_MODE = "slots"


def _padded_chunk_count(row_of_tile, counts, n_rb, e_b, kb=_K) -> int:
    """Chunks :func:`build_chunk_tables` emits: per-tile ceil division,
    every tile row padded to a multiple of ``kb`` (empty rows get one full
    filler block). Shared by the cost model and the bench byte models."""
    per_row = np.bincount(row_of_tile, weights=-(-counts // e_b),
                          minlength=n_rb)
    per_row = np.where(per_row == 0, kb, -(-per_row // kb) * kb)
    return int(per_row.sum())


def model_chunk_count(csr, tile: int, e_b: int, kb: int = _K) -> int:
    """:func:`_padded_chunk_count` from a scipy matrix (bench roofline)."""
    import scipy.sparse as sp

    coo = sp.coo_matrix(csr)
    ncb = -(-coo.shape[1] // tile)
    n_rb = -(-coo.shape[0] // tile)
    uniq, counts = np.unique(
        coo.row.astype(np.int64) // tile * ncb + coo.col // tile,
        return_counts=True)
    return _padded_chunk_count(uniq // ncb, counts, n_rb, e_b, kb)


_GEO_CACHE_PATH = None  # resolved lazily; None disables (no writable dir)


def _geo_cache_file():
    global _GEO_CACHE_PATH
    if _GEO_CACHE_PATH is None:
        import os
        from pathlib import Path

        base = Path(os.environ.get("H2GCN_TPU_CACHE",
                                   Path.home() / ".cache" / "h2gcn_tpu"))
        try:
            base.mkdir(parents=True, exist_ok=True)
            _GEO_CACHE_PATH = base / "auto_geometry.json"
        except OSError:
            _GEO_CACHE_PATH = False
    return _GEO_CACHE_PATH or None


def _geo_cache_load(key):
    path = _geo_cache_file()
    if path is None or not path.exists():
        return None
    import json

    try:
        hit = json.loads(path.read_text()).get(key)
    except (OSError, ValueError):
        return None
    return tuple(hit) if hit else None


def _geo_cache_store(key, val):
    path = _geo_cache_file()
    if path is None:
        return
    import json

    try:
        data = json.loads(path.read_text()) if path.exists() else {}
    except (OSError, ValueError):
        data = {}
    data[key] = list(val)
    try:
        path.write_text(json.dumps(data, indent=1, sort_keys=True))
    except OSError:
        pass


def auto_geometry(csr, f: int = 64, dtype: str = "bf16",
                  tile_cands=(256, 512, 1024, 2048),
                  e_b_cands=(128, 256, 512),
                  kb_cands=(8, 16, 32, 64)) -> Tuple[int, int, int]:
    """Pick ``(tile, e_b, kb)`` minimizing a two-roof cost model.

    Results persist on disk keyed by the matrix signature
    ``(n, m, nnz, f, dtype, cands)`` (``~/.cache/h2gcn_tpu``, override via
    ``H2GCN_TPU_CACHE``) — at the 1M/34M-nnz scale the per-candidate tile
    histograms cost minutes through this container's numpy, and the pick
    is deterministic per matrix shape, so it runs once per (graph, mode)
    rather than once per process.

    Per chunk the kernel spends ``4·e_b·tile·f_pad`` MXU FLOPs (two one-hot
    contractions) and the HBM side pays one ``tile×f_pad`` x-tile read per
    CHUNK (each of a block's 8 slot operands DMAs its own tile) plus 12
    bytes per (padded) edge slot; each 8-chunk grid step additionally pays
    the measured fixed ``_STEP_OVERHEAD_S``. The two roofs pull in opposite
    directions:

    * **MXU roof**: once chunks are full (``edges/tile ≫ e_b``) compute is
      ``≈ 4·nnz·tile·f_pad`` — grows linearly in T, so a compute-bound
      workload wants the SMALLEST tile (and when chunks are mostly padding,
      the smallest e_b);
    * **HBM roof**: chunk count falls as T and e_b grow (denser tiles →
      fuller chunks), so the per-chunk x-tile traffic favors geometries
      whose chunks are FULL — large e_b on dense tile grids, large T where
      doubling T better than halves the visited-tile count.

    Chunk counts model :func:`build_chunk_tables` exactly: per-tile
    ceil-division, every tile row padded to a multiple of ``_K`` (missing
    rows get a full filler block). Geometries whose slot operands would
    exceed the VMEM budget (8 double-buffered x tiles + the output block)
    are skipped.

    The per-geometry cost is ``mxu + step + (1-_X_HIDE_FRAC)·x_dma +
    edge_dma + out_flush``. With the one-chunk-per-step kernel the x DMAs
    were fully serial (a pure sum model calibrated within ~10%); the
    8-chunk-block kernel overlaps them partially — two on-chip sweeps
    (250K/25M-nnz Â₂, six geometries, and the 131K/8M probe) fit
    ``measured ≈ mxu + step + 0.45·x_dma`` to within 4-10% and reproduce
    the measured ranking exactly, where the serial sum wrongly preferred
    (1024,256) over the measured-best (512,128) (205M vs 225M edges/s at
    250K). Neither a pure ``max()`` (drifts to oversized tiles) nor a pure
    sum survives contact with the pipeline's actual schedule; the hidden
    fraction is an empirical v5e constant — re-fit it via
    workbench/geo_sweep.py on other generations.
    """
    import scipy.sparse as sp

    coo = sp.coo_matrix(csr)
    n, m = coo.shape
    # The cost model depends on per-candidate tile-occupancy histograms,
    # so the cache key must see sparsity STRUCTURE, not just shape/nnz —
    # e.g. natural vs cluster-reordered orderings of the same matrix have
    # identical (n, m, nnz) but different occupied-tile counts. Fingerprint
    # the 512-row tile histogram (cheap, order-sensitive, collision-safe
    # enough for a perf cache).
    import hashlib

    fp = hashlib.sha1(
        np.bincount((coo.row.astype(np.int64) // 512 * (-(-m // 512))
                     + coo.col.astype(np.int64) // 512) % (1 << 20),
                    minlength=1 << 20).tobytes()).hexdigest()[:12]
    key = (f"{n}x{m}/nnz{coo.nnz}/f{f}/{dtype}/t{tile_cands}/"
           f"e{e_b_cands}/k{kb_cands}/s{fp}")
    hit = _geo_cache_load(key)
    if hit is not None:
        return hit
    f_pad = max(F_TILE, -(-f // F_TILE) * F_TILE)
    xbytes = 2 if dtype == "bf16" else 4
    mxu = _MXU_RATE[dtype]
    row = coo.row.astype(np.int64)
    col = coo.col.astype(np.int64)
    best, best_cost = (512, 512, _K), np.inf
    for t in tile_cands:
        ncb = -(-m // t)
        n_rb = -(-n // t)
        uniq = counts = row_of_tile = None
        for kb in kb_cands:
            vmem = (kb * t * F_TILE * xbytes * 2  # slot x tiles, dbl-buffered
                    + 2 * t * F_TILE * 4)         # output block
            if vmem > _VMEM_BUDGET:
                continue
            if uniq is None:
                uniq, counts = np.unique(row // t * ncb + col // t,
                                         return_counts=True)
                row_of_tile = uniq // ncb
            for e_b in e_b_cands:
                chunks = _padded_chunk_count(row_of_tile, counts, n_rb, e_b,
                                             kb)
                steps = chunks // kb
                compute = (steps * _STEP_OVERHEAD_S
                           + chunks * 4.0 * e_b * t * f_pad / mxu)
                x_dma = chunks * t * f_pad * xbytes / _HBM_RATE
                hbm = (chunks * e_b * 12        # edge slots (rows/cols/vals)
                       + n_rb * t * f_pad * 4.0  # output flush, f32
                       ) / _HBM_RATE
                cost = compute + (1.0 - _X_HIDE_FRAC) * x_dma + hbm
                if cost < best_cost:
                    best, best_cost = (t, e_b, kb), cost
    _geo_cache_store(key, best)
    return best


def _auto_e_b(coo, tile: int, ncb: int) -> int:
    """Chunk size from mean edges per visited tile (≤50% padding target)."""
    if coo.nnz == 0:
        return 128
    n_tiles = np.unique((coo.row // tile).astype(np.int64) * ncb
                        + coo.col // tile).size
    mean = coo.nnz / max(n_tiles, 1)
    for cand in (128, 256):
        if mean <= cand * 1.5:
            return cand
    return 512


@struct.dataclass
class CooTileSegment:
    ctr: jax.Array   # [nchunks] int32 tile-row (relative to rb_lo)
    ctc: jax.Array   # [nchunks] int32 tile-col
    rows: jax.Array  # [nchunks, E_B] int32 tile-local dest rows
    cols: jax.Array  # [nchunks, E_B] int32 tile-local src cols
    vals: jax.Array  # [nchunks, E_B] float32
    rb_lo: int = struct.field(pytree_node=False)
    rb_hi: int = struct.field(pytree_node=False)


@struct.dataclass
class CooTile:
    segments: Tuple[CooTileSegment, ...]
    tile: int = struct.field(pytree_node=False)
    e_b: int = struct.field(pytree_node=False)
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    kb: int = struct.field(pytree_node=False, default=_K)


def build_chunk_tables(csr, tile: int = 512, e_b: int | None = 512,
                       kb: int = _K):
    """Host prep (fully vectorized, numpy-only): sort edges by
    (tile_row, tile_col), chunk to fixed ``E_B`` groups, and add filler
    chunks so every tile row initializes its output block.

    ``e_b=None`` auto-sizes the chunk to the graph's tile density: on
    hyper-sparse regimes (huge graphs where the mean visited tile holds
    ~100 edges) a 512-edge chunk is ~80% padding — per-edge MXU FLOPs are
    e_b-independent, so a smaller chunk only removes wasted work.

    Returns ``(ctr, ctc, rows, cols, vals, n_rb, e_b)`` with
    ``rows/cols/vals`` of shape ``[nchunks, e_b]`` — the raw single-segment
    chunk tables used by :func:`build_cootile` (which also SMEM-segments
    them) and by the distributed halo-cootile builder (which stacks them
    per shard)."""
    import scipy.sparse as sp

    csr = sp.csr_matrix(csr)
    coo = csr.tocoo()
    n, m = csr.shape
    n_rb = -(-n // tile)
    ncb = -(-m // tile)
    if e_b is None:
        e_b = _auto_e_b(coo, tile, ncb)

    # one flat (tile_row, tile_col) key; intra-tile edge order is
    # irrelevant to the kernel (chunks accumulate), so a single argsort
    # replaces a 4-key lexsort — ~3x cheaper host prep at 10M+ edges
    key = ((coo.row // tile).astype(np.int64) * ncb
           + coo.col // tile)
    order = np.argsort(key, kind="stable")
    r = coo.row[order].astype(np.int64)
    c = coo.col[order].astype(np.int64)
    v = coo.data[order].astype(np.float32)
    tile_key = key[order]

    uniq, starts, counts = np.unique(tile_key, return_index=True,
                                     return_counts=True)
    chunks_per_tile = -(-counts // e_b)
    chunk_offset = np.concatenate([[0], np.cumsum(chunks_per_tile)])
    nchunks = int(chunk_offset[-1])

    if nchunks:
        pos_in_tile = np.arange(len(r)) - np.repeat(starts, counts)
        chunk_id = np.repeat(chunk_offset[:-1], counts) + pos_in_tile // e_b
        slot = chunk_id * e_b + pos_in_tile % e_b
    else:
        slot = np.zeros(0, np.int64)

    ctr = np.repeat((uniq // ncb).astype(np.int32), chunks_per_tile)
    ctc = np.repeat((uniq % ncb).astype(np.int32), chunks_per_tile)
    # filler chunks: every tile ROW needs >=1 chunk (output init)
    missing = np.setdiff1d(np.arange(n_rb, dtype=np.int32), ctr)
    total = nchunks + len(missing)
    rows = np.zeros(total * e_b, np.int32)
    cols = np.zeros(total * e_b, np.int32)
    vals = np.zeros(total * e_b, np.float32)
    rows[slot] = r % tile
    cols[slot] = c % tile
    vals[slot] = v
    ctr = np.concatenate([ctr, missing])
    ctc = np.concatenate([ctc, np.zeros(len(missing), np.int32)])
    order2 = np.argsort(ctr, kind="stable")
    ctr, ctc = ctr[order2], ctc[order2]
    rows = rows.reshape(total, e_b)[order2]
    cols = cols.reshape(total, e_b)[order2]
    vals = vals.reshape(total, e_b)[order2]

    # pad every tile row's chunk list to a multiple of kb: one grid step
    # processes a kb-chunk block and writes ONE output tile row, so blocks
    # must never straddle a row change. Fillers carry vals=0 (they
    # accumulate nothing) and repeat the row's last tile col so a pure-
    # filler block re-maps already-resident x tiles where possible.
    counts_r = np.bincount(ctr, minlength=n_rb)  # >=1 per row (fillers)
    pad_r = (-counts_r) % kb
    if pad_r.any():
        last = np.cumsum(counts_r) - 1           # each row's last chunk
        fill_ctr = np.repeat(np.arange(n_rb, dtype=np.int32), pad_r)
        fill_ctc = ctc[last][fill_ctr]
        npad = len(fill_ctr)
        ctr = np.concatenate([ctr, fill_ctr])
        ctc = np.concatenate([ctc, fill_ctc])
        rows = np.concatenate([rows, np.zeros((npad, e_b), np.int32)])
        cols = np.concatenate([cols, np.zeros((npad, e_b), np.int32)])
        vals = np.concatenate([vals, np.zeros((npad, e_b), np.float32)])
        order3 = np.argsort(ctr, kind="stable")
        ctr, ctc = ctr[order3], ctc[order3]
        rows, cols, vals = rows[order3], cols[order3], vals[order3]
    return ctr, ctc, rows, cols, vals, n_rb, e_b


def build_cootile(csr, tile: int | None = None, e_b: int | None = None,
                  dtype: str = "bf16", kb: int | None = None) -> CooTile:
    """Chunk tables (:func:`build_chunk_tables`) → SMEM-budget segments,
    staged on device ONCE. ``tile=None`` picks the full ``(tile, e_b)``
    geometry from :func:`auto_geometry`'s two-roof cost model (``dtype``
    names the precision mode the matrix will run under — f32-HIGHEST's
    3-pass MXU cost shifts the optimum toward smaller tiles); an explicit
    ``tile`` with ``e_b=None`` keeps the legacy padding-driven
    :func:`_auto_e_b` choice."""
    import scipy.sparse as sp

    csr = sp.csr_matrix(csr)
    n, m = csr.shape
    if tile is None:
        auto_t, auto_eb, auto_kb = auto_geometry(csr, dtype=dtype)
        tile = auto_t
        if e_b is None:
            e_b = auto_eb
        if kb is None:
            kb = auto_kb
    if kb is None:
        # explicit tile, no kb: deepest block whose double-buffered slot
        # x tiles stay inside the VMEM budget (step cost amortizes ~kb x)
        xbytes = 2 if dtype == "bf16" else 4
        kb = max((k for k in (8, 16, 32, 64)
                  if k * tile * F_TILE * xbytes * 2
                  + 2 * tile * F_TILE * 4 <= _VMEM_BUDGET), default=8)
    ctr, ctc, rows, cols, vals, _, e_b = build_chunk_tables(csr, tile, e_b,
                                                            kb)
    total = len(ctr)

    # segments: <= _MAX_CHUNKS each, cut only at tile-row boundaries. Per-
    # row padding in build_chunk_tables makes every row's chunk count a
    # multiple of kb, so every row-boundary cut (and thus every segment)
    # stays kb-block aligned.
    row_starts = np.flatnonzero(np.diff(ctr, prepend=-1))
    segments = []
    lo = 0
    while lo < total:
        hi = min(lo + _MAX_CHUNKS, total)
        if hi < total:
            cut = row_starts[(row_starts > lo) & (row_starts <= hi)]
            if len(cut):
                hi = int(cut[-1])
            else:
                # one tile row alone exceeds the budget: extend to the next
                # row boundary (splitting a row would double-write its
                # output block) — SMEM can overrun only for a >64M-edge
                # single tile row, far past any real workload
                nxt = row_starts[row_starts > lo]
                hi = int(nxt[0]) if len(nxt) else total
        rb_lo, rb_hi = int(ctr[lo]), int(ctr[hi - 1]) + 1
        assert (hi - lo) % kb == 0
        sl = slice(lo, hi)
        segments.append(CooTileSegment(
            ctr=jnp.asarray(ctr[sl] - rb_lo),
            ctc=jnp.asarray(ctc[sl]),
            rows=jnp.asarray(rows[sl]),
            cols=jnp.asarray(cols[sl]),
            vals=jnp.asarray(vals[sl]),
            rb_lo=rb_lo, rb_hi=rb_hi,
        ))
        lo = hi
    return CooTile(segments=tuple(segments), tile=tile, e_b=e_b,
                   n_rows=n, n_cols=m, kb=kb)


def _onehot_dot_exact(oh_bf16, dense_f32):
    """``onehot @ dense`` at f32 fidelity in 3 bf16 MXU passes.

    A 0/1 one-hot matrix is EXACTLY representable in bf16, so only the
    dense operand needs splitting: three bf16 terms carry ~3×8 mantissa
    bits ≈ f32's 24, and each partial product is exact (1.0 × bf16 term)
    under the MXU's f32 accumulation. Generic f32 matmuls can't exploit
    this — HIGHEST must split BOTH operands (6+ passes); selection
    contractions need only 3.
    """
    acc = None
    rem = dense_f32
    for _ in range(3):
        part = rem.astype(jnp.bfloat16)
        rem = rem - part.astype(jnp.float32)
        term = jnp.dot(oh_bf16, part, preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return acc


def _block_compute(tile, e_b, exact, get_x, rows_ref, cols_ref, vals_ref,
                   kb=_K):
    """Sum of the block's ``kb`` chunks' contributions to its output tile
    row. ``get_x(k)`` yields chunk k's (tile, F_TILE) x tile."""
    iota_ec = jax.lax.broadcasted_iota(jnp.int32, (e_b, tile), 1)
    iota_te = jax.lax.broadcasted_iota(jnp.int32, (tile, e_b), 0)
    acc = None
    for k in range(kb):  # unrolled
        cols = cols_ref[k]
        rows = rows_ref[k]
        vals = vals_ref[k]
        col_oh = (cols[:, None] == iota_ec)
        row_oh = (iota_te == rows[None, :])
        if exact:
            gathered = _onehot_dot_exact(col_oh.astype(jnp.bfloat16),
                                         get_x(k).astype(jnp.float32))
            gathered = gathered * vals[:, None]
            contrib = _onehot_dot_exact(row_oh.astype(jnp.bfloat16),
                                        gathered)
        else:
            gathered = jnp.dot(col_oh.astype(jnp.bfloat16),
                               get_x(k).astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
            gathered = gathered * vals[:, None]
            contrib = jnp.dot(row_oh.astype(jnp.bfloat16),
                              gathered.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        acc = contrib if acc is None else acc + contrib
    return acc


def _make_kernel(tile, e_b, compute_dtype, kb=_K):
    """Slot-operand variant: ``kb`` auto-pipelined x BlockSpec operands."""
    from jax.experimental import pallas as pl

    exact = compute_dtype == jnp.float32

    def kernel(ctr_ref, ctc_ref, rows_ref, cols_ref, vals_ref, *xs_o):
        xs, o_ref = xs_o[:kb], xs_o[kb]
        i = pl.program_id(1)  # block index: chunks [kb*i, kb*(i+1))
        prev = ctr_ref[jnp.maximum(kb * i - 1, 0)]
        first = jnp.logical_or(i == 0, ctr_ref[kb * i] != prev)

        acc = _block_compute(tile, e_b, exact, lambda k: xs[k][...],
                             rows_ref, cols_ref, vals_ref, kb)

        @pl.when(first)
        def _():
            o_ref[...] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            o_ref[...] = o_ref[...] + acc

    return kernel


def _make_kernel_manual(tile, e_b, compute_dtype, kb=_K):
    """Manual-DMA variant: x stays in HBM (``memory_space=ANY``, shaped
    ``[ncb, tile, f_pad]``); the kernel double-buffers each block's 8 x
    tiles through VMEM scratch with explicit async copies, starting block
    i+1's copies before block i's waits. Measured SLOWER than the
    auto-pipelined slot operands on the v5e (242M vs 264M edges/s at
    (512,128) — see ``_X_MODE``); kept as an experimental path for
    runtimes where the pipeline emitter schedules slot DMAs serially."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    exact = compute_dtype == jnp.float32

    def kernel(ctr_ref, ctc_ref, rows_ref, cols_ref, vals_ref, x_hbm,
               o_ref, x_buf, sems):
        i = pl.program_id(1)
        j = pl.program_id(0)
        nsteps = pl.num_programs(1)
        prev = ctr_ref[jnp.maximum(kb * i - 1, 0)]
        first = jnp.logical_or(i == 0, ctr_ref[kb * i] != prev)

        def copy(b, k, slot):
            tc = ctc_ref[kb * b + k]
            return pltpu.make_async_copy(
                x_hbm.at[tc, :, pl.ds(j * F_TILE, F_TILE)],
                x_buf.at[slot, k],
                sems.at[slot, k],
            )

        def start_block(b, slot):
            for k in range(kb):
                copy(b, k, slot).start()

        @pl.when(i == 0)
        def _():
            start_block(0, 0)

        @pl.when(i + 1 < nsteps)
        def _():
            start_block(i + 1, (i + 1) % 2)

        slot = i % 2
        for k in range(kb):
            copy(i, k, slot).wait()

        acc = _block_compute(tile, e_b, exact, lambda k: x_buf[slot, k],
                             rows_ref, cols_ref, vals_ref, kb)

        @pl.when(first)
        def _():
            o_ref[...] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            o_ref[...] = o_ref[...] + acc

    return kernel


@functools.lru_cache(maxsize=None)
def _seg_fn(nchunks, rb_span, tile, e_b, f_pad, dtype_name, interpret,
            x_mode="slots", kb=_K):
    """Cached pallas_call construction — a fresh pallas_call per invocation
    would defeat jax's compile cache (new closure identity => new trace =>
    seconds of recompile per call)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    compute_dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
    x_dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
    assert nchunks % kb == 0
    grid = (f_pad // F_TILE, nchunks // kb)
    edge_specs = [
        pl.BlockSpec((kb, e_b), lambda j, i, tr, tc: (i, 0)),
        pl.BlockSpec((kb, e_b), lambda j, i, tr, tc: (i, 0)),
        pl.BlockSpec((kb, e_b), lambda j, i, tr, tc: (i, 0)),
    ]
    out_spec = pl.BlockSpec((tile, F_TILE),
                            lambda j, i, tr, tc: (tr[kb * i], j))
    if x_mode == "manual":
        kernel = _make_kernel_manual(tile, e_b, compute_dtype, kb)
        in_specs = edge_specs + [pl.BlockSpec(memory_space=pltpu.ANY)]
        scratch = [
            pltpu.VMEM((2, kb, tile, F_TILE), x_dtype),
            pltpu.SemaphoreType.DMA((2, kb)),
        ]
    else:
        x_kw = {}
        if _X_BUFFERING is not None:
            x_kw["pipeline_mode"] = pl.Buffered(*_X_BUFFERING)
        kernel = _make_kernel(tile, e_b, compute_dtype, kb)
        in_specs = edge_specs + [
            pl.BlockSpec((tile, F_TILE),
                         lambda j, i, tr, tc, k=k: (tc[kb * i + k], j),
                         **x_kw)
            for k in range(kb)
        ]
        scratch = []
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((rb_span * tile, f_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )


def cootile_spmm(ct: CooTile, x: jax.Array, *, precision: str = "highest",
                 interpret: bool = False) -> jax.Array:
    """``A @ x`` for a :class:`CooTile`. ``x``: [m, F] → [n, F] float32."""
    tile, e_b, kb = ct.tile, ct.e_b, ct.kb
    m, f = x.shape
    f_pad = max(F_TILE, -(-f // F_TILE) * F_TILE)
    m_pad = -(-m // tile) * tile
    xp = x
    if m_pad != m or f_pad != f:
        xp = jnp.zeros((m_pad, f_pad), x.dtype).at[:m, :f].set(x)
    dtype_name = "float32" if precision == "highest" else "bfloat16"
    if dtype_name == "bfloat16":
        # the x-tile reads are the kernel's dominant HBM traffic (one
        # tile×F_TILE block per visited tile); storing x in bf16 halves
        # them. f32 accumulation is unchanged — same contract as the
        # dense/BSR backends' bf16 payload mode.
        xp = xp.astype(jnp.bfloat16)
    x_mode = _X_MODE
    if x_mode == "manual":
        # HBM-resident tile stack for the kernel's explicit async copies
        xr = xp.reshape(m_pad // tile, tile, f_pad)
        x_args = (xr,)
    else:
        # the kb slot operands all view the same padded x; their BlockSpecs
        # index different tiles (tc[kb*i+k]) per grid step
        x_args = (xp,) * kb
    parts = []
    for seg in ct.segments:
        fn = _seg_fn(seg.ctr.shape[0], seg.rb_hi - seg.rb_lo, tile, e_b,
                     f_pad, dtype_name, interpret, x_mode, kb)
        parts.append(fn(seg.ctr, seg.ctc, seg.rows, seg.cols, seg.vals,
                        *x_args))
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return out[: ct.n_rows, :f]
