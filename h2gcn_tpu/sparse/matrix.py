"""Device-resident sparse matrices with TPU-tuned SpMM backends.

The reference framework does all sparse aggregation through
``tf.sparse.sparse_dense_matmul`` on eager tensors (reference:
h2gcn/models/_layers.py:45-81). On TPU there is no native SpMM, so this module
implements a :class:`SparseMatrix` container with three interchangeable
execution backends, chosen per matrix at construction time:

``dense``
    The adjacency is materialized once as a dense (optionally padded) array
    and aggregation is a plain MXU matmul. For graphs below ~8K nodes this is
    the fastest option on TPU by a wide margin — the MXU turns the whole
    aggregation into a few hundred microseconds of systolic-array work.

``bsr``
    Block-sparse rows: the matrix is tiled into ``B×B`` (default 128×128)
    blocks and only nonzero blocks are kept. A Pallas kernel streams blocks
    through VMEM and accumulates row-block outputs on the MXU
    (see :mod:`h2gcn_tpu.sparse.pallas_spmm`). Scales to graphs where the
    dense form no longer fits or wastes bandwidth.

``segment``
    Pure-XLA gather + ``segment_sum`` over padded COO edges. Fully general
    fallback; also the reference semantics oracle for the other two.

All shapes are static: COO edge arrays are padded to a bucket size so jit
never recompiles across hop matrices of similar size, and padding entries are
in-bounds indices with zero values (they contribute exactly 0).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Edge-array padding bucket: multiples of 8 * 128 keep the VPU lanes full and
# bound the number of distinct compiled shapes.
_NNZ_BUCKET = 1024
# Node counts at or below this use the cached-dense MXU backend by default.
_DENSE_AUTO_MAX_DIM = 8192
_DEFAULT_BLOCK = 128


def _auto_backend(n, m, nnz, coo, block_size, platform=None,
                  precision="highest"):
    """Pick a backend for ``backend='auto'``.

    The dense/BSR/cootile ladder is an MXU economics model — it only
    applies on accelerators. On CPU hosts (tests, CI, CPU-only sweeps) the
    n² dense payload is strictly worse than segment sums for graph-sparse
    matrices, so auto resolves to ``segment`` there.
    """
    if platform is None:
        import jax

        platform = jax.default_backend()
    if platform == "cpu":
        return "segment"
    density = nnz / max(n * m, 1)
    if max(n, m) <= _DENSE_AUTO_MAX_DIM:
        return "dense"
    if max(n, m) <= 4 * _DENSE_AUTO_MAX_DIM and density >= 0.01:
        # dense-ish mid-size matrices (e.g. exact-2-hop neighborhoods
        # of heterophily graphs): the MXU matmul beats block-sparse
        return "dense"
    # BSR is only economical with real block occupancy: count the nonzero
    # 128-blocks. Measured niche (docs/bench_bsr_niche.json — 40K SBM,
    # cluster-reordered, p_in sweep): in f32/HIGHEST mode BSR edges out
    # cootile from ~90 nnz/block (248 vs 223 M e/s) and is 1.5-2.7x above
    # 140; in bf16 cootile's densification stays ahead until ~250
    # nnz/block (occ 138: cootile 633 vs bsr 489; occ 368: bsr 1302 vs
    # 669; occ 1009: bsr 3467 vs 735). Below the crossover — or when the
    # dense-block payload would dwarf the edge data — fall through to the
    # payload-free ladder.
    ncb = -(-m // block_size)
    nb = np.unique(
        (coo.row // block_size).astype(np.int64) * ncb
        + coo.col // block_size
    ).size
    payload_bytes = nb * block_size * block_size * 4
    occ128 = nnz / max(nb, 1)
    if payload_bytes <= 4e9 and occ128 >= (
            90 if precision == "highest" else 250):
        return "bsr"
    # cootile vs gscatter at ultra-sparse occupancy — PRECISION-AWARE
    # (measured on the 1M-node 34M-nnz Â₂, workbench/probe_bigtile_1m.py +
    # probe runs): in bf16 mode cootile's tile densification stays ahead
    # (82-106M e/s vs gscatter 71M — the XLA gather is random-access-bound
    # at ~43GB/s), but in the f32-exact mode cootile pays 3x MXU on
    # mostly-padding tiles and collapses to ~18M e/s while gscatter's
    # 3-pass split of an edge-major stream holds 67M.
    t = 512
    ntc = -(-m // t)
    occ512 = np.unique(
        (coo.row // t).astype(np.int64) * ntc + coo.col // t).size
    occ = nnz / max(occ512, 1)
    if occ >= 32:
        return "cootile"
    if occ < 4:
        # nothing-per-tile regime (1M SBM Â₂: 1.4 nnz/512-tile): every
        # tile path drowns in per-tile fixed cost; the XLA segment path's
        # ~70M edges/s constant rate wins outright (docs/bench_large_1m_sbm)
        return "segment"
    return "gscatter" if precision == "highest" else "cootile"


@struct.dataclass
class BSR:
    """Block-sparse-row representation: only nonzero B×B blocks are stored.

    Blocks are sorted by (block_row, block_col); every block row is guaranteed
    to contain at least one block (host construction inserts zero filler
    blocks) so the Pallas kernel writes every output tile.
    """

    blocks: jax.Array       # [nb, B, B] float — dense block payloads
    block_rows: jax.Array   # [nb] int32, ascending
    block_cols: jax.Array   # [nb] int32
    # host-precomputed column-major visit order (static per graph): the
    # schedule for transpose-direction passes (e.g. the fused-attention
    # backward), so no on-device sort is needed
    colmajor_order: jax.Array = None  # [nb] int32
    block_size: int = struct.field(pytree_node=False, default=128)
    n_row_blocks: int = struct.field(pytree_node=False, default=1)
    n_col_blocks: int = struct.field(pytree_node=False, default=1)

    @property
    def num_blocks(self) -> int:
        return self.blocks.shape[0]


@struct.dataclass
class SparseMatrix:
    """Padded-COO sparse matrix with optional cached dense / BSR backends.

    ``rows`` is sorted ascending (CSR edge order). Padding entries use
    ``rows = shape[0]-1``, ``cols = shape[1]-1`` and ``vals = 0`` so they are
    in-bounds no-ops for both gather and scatter.
    """

    rows: jax.Array                   # [nnz_pad] int32, sorted
    cols: jax.Array                   # [nnz_pad] int32
    vals: jax.Array                   # [nnz_pad] float32
    dense: Optional[jax.Array]        # cached dense [n, m] or None
    bsr: Optional[BSR]                # block-sparse payload or None
    bsr_t: Optional[BSR]              # BSR of the transpose (for VJP) or None
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)
    # host-precomputed CSC-order permutation of the padded COO arrays
    # (static per graph) — transpose_view's edge ordering without an
    # on-device sort; None for symmetric matrices (transpose == self)
    t_perm: Optional[jax.Array] = None
    coot: Optional[object] = None     # CooTile payload (pallas_cootile) or None
    coot_t: Optional[object] = None   # CooTile of the transpose or None
    # AttnCoo payload (pallas_attention_coo) or None — the scale-capable
    # fused-attention chunk tables (backend="attn")
    attn: Optional[object] = None
    # GScatter payloads (pallas_gscatter) — the ultra-sparse SpMM backend
    # (XLA gather + one-hot MXU scatter; backend="gscatter")
    gsc: Optional[object] = None
    gsc_t: Optional[object] = None
    backend: str = struct.field(pytree_node=False, default="segment")
    symmetric: bool = struct.field(pytree_node=False, default=False)
    # "highest" = full f32 on the MXU (6 bf16 passes, activation-parity
    # mode); "default" = single-pass MXU. For throughput, combine "default"
    # with bf16 payload storage (from_scipy(payload_dtype="bfloat16")):
    # the adjacency is read once in half the bytes and accumulated in f32 —
    # the HBM-bound aggregation runs ~6-10x faster at ~1e-3 relative error.
    precision: str = struct.field(pytree_node=False, default="highest")

    # ------------------------------------------------------------------ util
    @property
    def nnz_padded(self) -> int:
        return self.rows.shape[0]

    def todense(self) -> jax.Array:
        if self.dense is not None:
            return self.dense
        out = jnp.zeros(self.shape, dtype=self.vals.dtype)
        return out.at[self.rows, self.cols].add(self.vals)

    def to_scipy(self):
        import scipy.sparse as sp

        if self.backend == "dense" and self.dense is not None:
            # dense payload is authoritative (COO is a trimmed placeholder)
            return sp.csr_matrix(np.asarray(self.dense, dtype=np.float32))
        r = np.asarray(self.rows)[: self.nnz]
        c = np.asarray(self.cols)[: self.nnz]
        v = np.asarray(self.vals)[: self.nnz]
        return sp.coo_matrix((v, (r, c)), shape=self.shape).tocsr()

    def transpose_view(self) -> "SparseMatrix":
        """A SparseMatrix computing ``Aᵀ @ x`` — used by the SpMM VJP."""
        if self.symmetric:
            return self
        order = (self.t_perm if self.t_perm is not None
                 else jnp.argsort(self.cols, stable=True))
        return SparseMatrix(
            rows=self.cols[order],
            cols=self.rows[order],
            vals=self.vals[order],
            dense=None if self.dense is None else self.dense.T,
            bsr=self.bsr_t,
            bsr_t=self.bsr,
            coot=self.coot_t,
            coot_t=self.coot,
            gsc=self.gsc_t,
            gsc_t=self.gsc,
            # attn payloads are orientation-specific and the fused-attention
            # VJP is self-contained (never dispatches through a transposed
            # view), so the view intentionally carries attn=None; normalize
            # the backend tag so no caller sees backend='attn' without a
            # payload.
            shape=(self.shape[1], self.shape[0]),
            nnz=self.nnz,
            backend="segment" if self.backend == "attn" else self.backend,
            symmetric=False,
            precision=self.precision,
        )

    # ------------------------------------------------------------ construction
    @classmethod
    def from_scipy(
        cls,
        mat,
        *,
        backend: str = "auto",
        block_size: int = _DEFAULT_BLOCK,
        dtype=np.float32,
        build_transpose: Optional[bool] = None,
        precision: str = "highest",
        payload_dtype: str = "float32",
        attn_tile: int = 256,
        attn_impl: str = "coo",
    ) -> "SparseMatrix":
        """Build from any scipy sparse matrix (host-side).

        ``backend='auto'`` caches a dense copy for small matrices and a BSR
        payload for large ones; ``segment`` keeps only the COO arrays;
        ``attn`` keeps the COO arrays plus the O(nnz) fused-attention chunk
        tables (pallas_attention_coo) — the GAT payload for graphs whose
        dense-block BSR would explode. ``payload_dtype='bfloat16'`` stores
        the dense/BSR payload in bf16 (throughput mode — f32 accumulation,
        ~1e-3 relative error).
        """
        import scipy.sparse as sp

        csr = sp.csr_matrix(mat).astype(dtype)
        csr.sum_duplicates()
        n, m = csr.shape
        coo = csr.tocoo()
        nnz = coo.nnz
        symmetric = bool(n == m and (abs(csr - csr.T)).nnz == 0)

        if backend == "auto":
            backend = _auto_backend(n, m, nnz, coo, block_size,
                                    precision=precision)

        if backend == "dense":
            # the dense payload is authoritative; keep only no-op COO
            # placeholders so the pytree (and per-dispatch arg marshalling)
            # stays small
            pad = 8
            rows = np.full(pad, n - 1, dtype=np.int32)
            cols = np.full(pad, m - 1, dtype=np.int32)
            vals = np.zeros(pad, dtype=dtype)
        else:
            pad = max(_NNZ_BUCKET,
                      int(math.ceil(max(nnz, 1) / _NNZ_BUCKET)) * _NNZ_BUCKET)
            rows = np.full(pad, n - 1, dtype=np.int32)
            cols = np.full(pad, m - 1, dtype=np.int32)
            vals = np.zeros(pad, dtype=dtype)
            rows[:nnz] = coo.row
            cols[:nnz] = coo.col
            vals[:nnz] = coo.data

        dense = None
        bsr = None
        bsr_t = None
        pdt = jnp.bfloat16 if payload_dtype == "bfloat16" else jnp.float32
        coot = None
        coot_t = None
        if backend == "dense":
            dense = jnp.asarray(csr.toarray()).astype(pdt)
        elif backend == "bsr":
            bsr = _build_bsr(csr, block_size, pdt)
            if build_transpose is None:
                build_transpose = not symmetric
            if build_transpose:
                bsr_t = _build_bsr(sp.csr_matrix(csr.T), block_size, pdt)
        elif backend == "cootile":
            # on-the-fly tile densification (pallas_cootile.py) — the
            # at-scale path when BSR block occupancy is hopeless
            from .pallas_cootile import build_cootile

            geo_dtype = "f32" if precision == "highest" else "bf16"
            coot = build_cootile(csr, dtype=geo_dtype)
            if build_transpose is None:
                build_transpose = not symmetric
            if build_transpose:
                coot_t = build_cootile(sp.csr_matrix(csr.T), dtype=geo_dtype)

        attn = None
        if backend == "attn":
            if attn_impl == "gather":
                from .pallas_attention_gather import build_gatherattn

                attn = build_gatherattn(csr)
            else:
                from .pallas_attention_coo import build_attn_coo

                attn = build_attn_coo(csr, tile=attn_tile)
        gsc = None
        gsc_t = None
        if backend == "gscatter":
            from .pallas_gscatter import build_gscatter

            gsc = build_gscatter(csr)
            if build_transpose is None:
                build_transpose = not symmetric
            if build_transpose:
                gsc_t = build_gscatter(sp.csr_matrix(csr.T))

        t_perm = None
        if not symmetric:
            t_perm = jnp.asarray(
                np.argsort(cols, kind="stable").astype(np.int32)
            )
        return cls(
            rows=jnp.asarray(rows),
            cols=jnp.asarray(cols),
            vals=jnp.asarray(vals),
            dense=dense,
            bsr=bsr,
            bsr_t=bsr_t,
            coot=coot,
            coot_t=coot_t,
            attn=attn,
            gsc=gsc,
            gsc_t=gsc_t,
            t_perm=t_perm,
            shape=(n, m),
            nnz=nnz,
            backend=backend,
            symmetric=symmetric,
            precision=precision,
        )


def _build_bsr(csr, block_size: int, payload_dtype=None) -> BSR:
    """Tile a scipy CSR matrix into dense B×B blocks (host-side).

    Inserts an all-zero block into every empty block row so that the Pallas
    kernel initializes every output tile.
    """
    import scipy.sparse as sp

    B = block_size
    n, m = csr.shape
    n_rb = max(1, -(-n // B))
    n_cb = max(1, -(-m // B))
    padded = sp.csr_matrix(csr, copy=False)
    padded.resize((n_rb * B, n_cb * B))
    sbsr = padded.tobsr(blocksize=(B, B))
    sbsr.sort_indices()

    counts = np.diff(sbsr.indptr)
    block_rows = np.repeat(np.arange(n_rb, dtype=np.int32), counts)
    block_cols = sbsr.indices.astype(np.int32)
    blocks = np.asarray(sbsr.data, dtype=csr.dtype)

    # Zero filler blocks guarantee every block ROW and every block COLUMN
    # appears at least once: forward kernels write each output row tile, and
    # transpose-direction passes (e.g. the attention backward) write each
    # column tile. Fillers are all-zero payloads — numerically inert.
    empty_rows = np.where(counts == 0)[0].astype(np.int32)
    present_cols = np.unique(block_cols)
    empty_cols = np.setdiff1d(
        np.arange(n_cb, dtype=np.int32), present_cols
    ).astype(np.int32)
    n_fill = empty_rows.size + empty_cols.size
    if n_fill:
        blocks = np.concatenate(
            [blocks, np.zeros((n_fill, B, B), dtype=blocks.dtype)], axis=0
        )
        block_rows = np.concatenate(
            [block_rows, empty_rows,
             np.zeros(empty_cols.size, dtype=np.int32)]
        )
        block_cols = np.concatenate(
            [block_cols, np.zeros(empty_rows.size, dtype=np.int32),
             empty_cols]
        )
        order = np.lexsort((block_cols, block_rows))
        blocks, block_rows, block_cols = blocks[order], block_rows[order], block_cols[order]

    dev_blocks = jnp.asarray(blocks)
    if payload_dtype is not None:
        dev_blocks = dev_blocks.astype(payload_dtype)
    colmajor = np.lexsort((block_rows, block_cols)).astype(np.int32)
    return BSR(
        blocks=dev_blocks,
        block_rows=jnp.asarray(block_rows),
        block_cols=jnp.asarray(block_cols),
        colmajor_order=jnp.asarray(colmajor),
        block_size=B,
        n_row_blocks=n_rb,
        n_col_blocks=n_cb,
    )


def device_sparse(mat, *, backend: str = "auto", **kw) -> SparseMatrix:
    """Convenience wrapper: scipy → device SparseMatrix."""
    return SparseMatrix.from_scipy(mat, backend=backend, **kw)


# ---------------------------------------------------------------------------
# SpMM: y = A @ x  with backend dispatch and a custom VJP (dx = Aᵀ @ g).
# ---------------------------------------------------------------------------


def _spmm_segment(sm: SparseMatrix, x: jax.Array) -> jax.Array:
    gathered = x[sm.cols] * sm.vals[:, None].astype(x.dtype)
    return jax.ops.segment_sum(
        gathered, sm.rows, num_segments=sm.shape[0], indices_are_sorted=True
    )


def _spmm_impl(sm: SparseMatrix, x: jax.Array) -> jax.Array:
    if sm.backend == "dense" and sm.dense is not None:
        prec = (jax.lax.Precision.HIGHEST if sm.precision == "highest"
                else jax.lax.Precision.DEFAULT)
        a = sm.dense
        xx = x.astype(a.dtype) if a.dtype == jnp.bfloat16 else x
        return jnp.dot(
            a, xx, preferred_element_type=x.dtype, precision=prec,
        )
    if sm.backend == "bsr" and sm.bsr is not None:
        if jax.default_backend() not in ("tpu", "gpu"):
            # Pallas kernels need an accelerator backend; CPU (tests,
            # virtual meshes) reduces via the segment path
            return _spmm_segment(sm, x)
        from .pallas_spmm import bsr_spmm

        return bsr_spmm(sm.bsr, x, n_out=sm.shape[0],
                        precision=sm.precision)
    if sm.backend == "cootile" and sm.coot is not None:
        if jax.default_backend() != "tpu":
            return _spmm_segment(sm, x)
        from .pallas_cootile import cootile_spmm

        return cootile_spmm(sm.coot, x, precision=sm.precision)
    if sm.backend == "gscatter" and sm.gsc is not None:
        if jax.default_backend() != "tpu":
            return _spmm_segment(sm, x)
        from .pallas_gscatter import gscatter_spmm

        return gscatter_spmm(sm.gsc, x, precision=sm.precision)
    return _spmm_segment(sm, x)


@jax.custom_vjp
def spmm(sm: SparseMatrix, x: jax.Array) -> jax.Array:
    """``A @ x`` for a 2-D ``x`` of shape ``[m, F]`` → ``[n, F]``.

    Differentiable in ``x`` (cotangent ``Aᵀ @ g``); the matrix itself is
    treated as a constant (adjacency structure is not trained).
    """
    return _spmm_impl(sm, x)


def _spmm_fwd(sm, x):
    return _spmm_impl(sm, x), sm


def _spmm_bwd(sm, g):
    smT = sm.transpose_view()
    if smT.backend == "bsr" and smT.bsr is None:
        # No transpose BSR payload was built; fall back to the segment path.
        smT = smT.replace(backend="segment")
    if smT.backend == "cootile" and smT.coot is None:
        smT = smT.replace(backend="segment")
    if smT.backend == "gscatter" and smT.gsc is None:
        smT = smT.replace(backend="segment")
    dx = _spmm_impl(smT, g)
    zero_sm = jax.tree_util.tree_map(jnp.zeros_like, sm)
    return zero_sm, dx


spmm.defvjp(_spmm_fwd, _spmm_bwd)
