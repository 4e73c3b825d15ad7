"""Distributed SpMM: edge-partitioned aggregation under ``shard_map``.

Partitioning scheme (the TPU replacement for the reference's single-device
``tf.sparse.sparse_dense_matmul``, SURVEY.md §2 parallelism table):

* nodes are padded to ``n_pad = D · n_local`` and row-sharded: device ``d``
  owns rows ``[d·n_local, (d+1)·n_local)`` of every matrix and the matching
  slice of the feature/activation arrays;
* each device owns ALL edges targeting its rows (a 1-D edge partition by
  destination), stored as padded COO with local row ids and global col ids;
* aggregation all-gathers the node features over the mesh axis (ICI ring)
  and reduces locally — the transpose (backward) is automatically a
  ``psum_scatter``, so gradients route back to the owning shard without any
  hand-written collective.

``dist_spmm`` is what :meth:`NetworkModel.apply` dispatches to when a hop
matrix is a :class:`DistSparseMatrix`, so the same model code runs single-
and multi-chip.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .mesh import GRAPH_AXIS

_EDGE_BUCKET = 1024


@struct.dataclass
class DistSparseMatrix:
    """Row-sharded sparse matrix, as seen INSIDE a shard_map body.

    ``rows`` are local (0..n_local-1); ``cols`` are global (0..n_global-1).
    The leading device axis has already been consumed by shard_map.
    """

    rows: jax.Array  # [E_pad] int32 local destination rows, sorted
    cols: jax.Array  # [E_pad] int32 global source columns
    vals: jax.Array  # [E_pad] float32
    n_local: int = struct.field(pytree_node=False)
    n_global: int = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False, default=GRAPH_AXIS)


@struct.dataclass
class ShardedMatrix:
    """Host-side container: per-device edge arrays with a leading device axis.

    Pass through shard_map with ``P(axis)`` on the leading axis, then call
    :meth:`local` inside the body.
    """

    rows: jax.Array  # [D, E_pad]
    cols: jax.Array  # [D, E_pad]
    vals: jax.Array  # [D, E_pad]
    n_local: int = struct.field(pytree_node=False)
    n_global: int = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False, default=GRAPH_AXIS)

    def local(self) -> DistSparseMatrix:
        return DistSparseMatrix(
            rows=self.rows[0],
            cols=self.cols[0],
            vals=self.vals[0],
            n_local=self.n_local,
            n_global=self.n_global,
            axis=self.axis,
        )


def shard_matrix(
    mat, num_shards: int, axis: str = GRAPH_AXIS
) -> Tuple[ShardedMatrix, int]:
    """Row-partition a scipy square matrix into ``num_shards`` edge shards.

    Returns (sharded matrix, n_pad). Every shard's edge list is padded to the
    same static size (in-bounds no-op entries), keeping shapes uniform across
    devices.
    """
    import scipy.sparse as sp

    csr = sp.csr_matrix(mat).astype(np.float32)
    n = csr.shape[0]
    n_local = -(-n // num_shards)
    n_pad = n_local * num_shards

    shards = []
    max_e = 1
    for d in range(num_shards):
        lo, hi = d * n_local, min((d + 1) * n_local, n)
        block = csr[lo:hi].tocoo() if lo < n else sp.coo_matrix((0, n))
        shards.append(block)
        max_e = max(max_e, block.nnz)
    e_pad = int(math.ceil(max_e / _EDGE_BUCKET)) * _EDGE_BUCKET

    rows = np.full((num_shards, e_pad), n_local - 1, dtype=np.int32)
    cols = np.full((num_shards, e_pad), 0, dtype=np.int32)
    vals = np.zeros((num_shards, e_pad), dtype=np.float32)
    for d, block in enumerate(shards):
        order = np.lexsort((block.col, block.row))
        e = block.nnz
        rows[d, :e] = block.row[order]
        cols[d, :e] = block.col[order]
        vals[d, :e] = block.data[order]

    return (
        ShardedMatrix(
            rows=jnp.asarray(rows),
            cols=jnp.asarray(cols),
            vals=jnp.asarray(vals),
            n_local=n_local,
            n_global=n_pad,
            axis=axis,
        ),
        n_pad,
    )


def dist_spmm(dsm: DistSparseMatrix, x_local: jax.Array) -> jax.Array:
    """``A @ x`` over the mesh: all-gather features, reduce local edges.

    ``x_local``: [n_local, F] (this device's node shard). Returns the local
    output shard [n_local, F]. The all_gather rides the ICI ring; XLA
    overlaps it with independent work where possible. Backward pass:
    transpose(all_gather) = psum_scatter — contributions to remote nodes
    flow back to their owners automatically.
    """
    x_global = jax.lax.all_gather(x_local, dsm.axis, axis=0, tiled=True)
    gathered = x_global[dsm.cols] * dsm.vals[:, None].astype(x_local.dtype)
    return jax.ops.segment_sum(
        gathered, dsm.rows, num_segments=dsm.n_local, indices_are_sorted=True
    )


@struct.dataclass
class RingShardedMatrix:
    """Row-sharded matrix with edges grouped by source chunk, for the ring
    schedule: device d's edges are split into P groups by which device owns
    the source columns. Leading axis = device (consumed by shard_map).

    ``cols`` are LOCAL to the source chunk (0..n_local-1).
    """

    rows: jax.Array  # [D, P, E_pad] int32 local dest rows, sorted per group
    cols: jax.Array  # [D, P, E_pad] int32 chunk-local source cols
    vals: jax.Array  # [D, P, E_pad] float32
    n_local: int = struct.field(pytree_node=False)
    n_global: int = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False, default=GRAPH_AXIS)

    @property
    def num_shards(self) -> int:
        return self.rows.shape[1]

    def local(self) -> "RingShardedMatrix":
        """Strip the device axis inside a shard_map body."""
        return RingShardedMatrix(
            rows=self.rows[0], cols=self.cols[0], vals=self.vals[0],
            n_local=self.n_local, n_global=self.n_global, axis=self.axis,
        )


def shard_matrix_ring(
    mat, num_shards: int, axis: str = GRAPH_AXIS
) -> Tuple[RingShardedMatrix, int]:
    """Partition rows AND group each row-shard's edges by source chunk."""
    import scipy.sparse as sp

    csr = sp.csr_matrix(mat).astype(np.float32)
    n = csr.shape[0]
    n_local = -(-n // num_shards)
    n_pad = n_local * num_shards

    chunks = [[None] * num_shards for _ in range(num_shards)]
    max_e = 1
    for d in range(num_shards):
        lo, hi = d * n_local, min((d + 1) * n_local, n)
        block = csr[lo:hi] if lo < n else sp.csr_matrix((0, n))
        for s in range(num_shards):
            clo, chi = s * n_local, min((s + 1) * n_local, n)
            sub = block[:, clo:chi].tocoo()
            chunks[d][s] = sub
            max_e = max(max_e, sub.nnz)
    e_pad = int(math.ceil(max_e / _EDGE_BUCKET)) * _EDGE_BUCKET

    rows = np.full((num_shards, num_shards, e_pad), n_local - 1, np.int32)
    cols = np.zeros((num_shards, num_shards, e_pad), np.int32)
    vals = np.zeros((num_shards, num_shards, e_pad), np.float32)
    for d in range(num_shards):
        for s in range(num_shards):
            sub = chunks[d][s]
            order = np.lexsort((sub.col, sub.row))
            e = sub.nnz
            rows[d, s, :e] = sub.row[order]
            cols[d, s, :e] = sub.col[order]
            vals[d, s, :e] = sub.data[order]

    return (
        RingShardedMatrix(
            rows=jnp.asarray(rows), cols=jnp.asarray(cols),
            vals=jnp.asarray(vals), n_local=n_local, n_global=n_pad,
            axis=axis,
        ),
        n_pad,
    )


def dist_spmm_ring(rsm: RingShardedMatrix, x_local: jax.Array) -> jax.Array:
    """``A @ x`` with a ring schedule: node chunks rotate around the mesh via
    ``ppermute`` while each device reduces the edges whose sources are in
    the chunk it currently holds — comm/compute overlap instead of a full
    all-gather, and peak memory O(n_local·F) instead of O(n·F).

    Called INSIDE shard_map; leading device axis already consumed
    (``rsm.rows``: [P, E]).
    """
    p = rsm.rows.shape[0]
    my = jax.lax.axis_index(rsm.axis)

    def partial(chunk_idx, x_chunk):
        r = jnp.take(rsm.rows, chunk_idx, axis=0)
        c = jnp.take(rsm.cols, chunk_idx, axis=0)
        v = jnp.take(rsm.vals, chunk_idx, axis=0)
        gathered = x_chunk[c] * v[:, None].astype(x_chunk.dtype)
        return jax.ops.segment_sum(
            gathered, r, num_segments=rsm.n_local, indices_are_sorted=True
        )

    out = partial(my, x_local)
    buf = x_local
    perm = [(i, (i + 1) % p) for i in range(p)]
    for step in range(1, p):
        buf = jax.lax.ppermute(buf, rsm.axis, perm=perm)
        src = (my - step) % p
        out = out + partial(src, buf)
    return out


@struct.dataclass
class HaloShardedMatrix:
    """Row-sharded matrix with precomputed boundary (halo) exchange tables.

    The true scalable design: instead of gathering ALL node features
    (all_gather) or rotating full chunks (ring), every device exchanges only
    the boundary rows its neighbors actually reference — one ``all_to_all``
    of ``[D, H, F]`` where ``H`` is the max per-pair halo size.

    Edges are pre-split into INTERIOR (source column owned by this shard —
    reduced straight from ``x_local``, no dependence on the exchange) and
    HALO edges (columns pre-remapped into the receive buffer). The interior
    reduce is data-independent of the all_to_all, so XLA's latency-hiding
    scheduler hides the exchange under it (SURVEY §7 "boundary-exchange
    overlap"; independence is asserted by tests/test_parallel.py's
    jaxpr-dependency test).

    Leading axis = device (consumed by shard_map).
    """

    rows_int: jax.Array   # [D, Ei_pad] int32 local dest rows, sorted
    cols_int: jax.Array   # [D, Ei_pad] int32 LOCAL source cols
    vals_int: jax.Array   # [D, Ei_pad] float32
    rows_halo: jax.Array  # [D, Eh_pad] int32 local dest rows, sorted
    cols_halo: jax.Array  # [D, Eh_pad] int32 indices into the recv buffer
    vals_halo: jax.Array  # [D, Eh_pad] float32
    send_idx: jax.Array   # [D(owner), D(dest), H] int32 local rows to send
    n_local: int = struct.field(pytree_node=False)
    n_global: int = struct.field(pytree_node=False)
    halo: int = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False, default=GRAPH_AXIS)

    def local(self) -> "HaloShardedMatrix":
        return HaloShardedMatrix(
            rows_int=self.rows_int[0], cols_int=self.cols_int[0],
            vals_int=self.vals_int[0], rows_halo=self.rows_halo[0],
            cols_halo=self.cols_halo[0], vals_halo=self.vals_halo[0],
            send_idx=self.send_idx[0],
            n_local=self.n_local, n_global=self.n_global, halo=self.halo,
            axis=self.axis,
        )


def shard_matrix_halo(
    mat, num_shards: int, axis: str = GRAPH_AXIS
) -> Tuple[HaloShardedMatrix, int]:
    """Row-partition + boundary-exchange tables (host-side precompute)."""
    import scipy.sparse as sp

    csr = sp.csr_matrix(mat).astype(np.float32)
    n = csr.shape[0]
    n_local = -(-n // num_shards)
    n_pad = n_local * num_shards
    D = num_shards

    blocks = []
    needed = [[None] * D for _ in range(D)]  # needed[d][s] = global cols
    max_ei, max_eh, max_h = 1, 1, 1
    for d in range(D):
        lo, hi = d * n_local, min((d + 1) * n_local, n)
        block = csr[lo:hi].tocoo() if lo < n else sp.coo_matrix((0, n))
        blocks.append(block)
        src_shard = block.col // n_local
        max_ei = max(max_ei, int((src_shard == d).sum()))
        max_eh = max(max_eh, int((src_shard != d).sum()))
        for s in range(D):
            if s == d:
                needed[d][s] = np.empty(0, dtype=block.col.dtype)
                continue  # interior columns never travel
            u = np.unique(block.col[src_shard == s])
            needed[d][s] = u
            max_h = max(max_h, len(u))
    ei_pad = int(math.ceil(max_ei / _EDGE_BUCKET)) * _EDGE_BUCKET
    eh_pad = int(math.ceil(max_eh / _EDGE_BUCKET)) * _EDGE_BUCKET
    h_pad = int(math.ceil(max_h / 8)) * 8

    rows_int = np.full((D, ei_pad), n_local - 1, np.int32)
    cols_int = np.zeros((D, ei_pad), np.int32)
    vals_int = np.zeros((D, ei_pad), np.float32)
    rows_halo = np.full((D, eh_pad), n_local - 1, np.int32)
    cols_halo = np.zeros((D, eh_pad), np.int32)
    vals_halo = np.zeros((D, eh_pad), np.float32)
    send_idx = np.zeros((D, D, h_pad), np.int32)

    for d in range(D):
        block = blocks[d]
        order = np.lexsort((block.col, block.row))
        r, c, v = block.row[order], block.col[order], block.data[order]
        src_shard = c // n_local

        interior = src_shard == d
        ei = int(interior.sum())
        rows_int[d, :ei] = r[interior]
        cols_int[d, :ei] = c[interior] - d * n_local
        vals_int[d, :ei] = v[interior]

        # remap each halo edge's global col into the recv-buffer layout
        # [src_shard * h_pad + position within needed[d][src_shard]]
        hsel = ~interior
        ch = c[hsel]
        remapped = np.zeros(len(ch), np.int64)
        sh = src_shard[hsel]
        for s in range(D):
            sel = sh == s
            if not sel.any():
                continue
            pos = np.searchsorted(needed[d][s], ch[sel])
            remapped[sel] = s * h_pad + pos
        eh = int(hsel.sum())
        rows_halo[d, :eh] = r[hsel]
        cols_halo[d, :eh] = remapped
        vals_halo[d, :eh] = v[hsel]
        # what THIS shard must send to each destination: dest's needed rows
        for dest in range(D):
            u = needed[dest][d]
            send_idx[d, dest, : len(u)] = u - d * n_local

    return (
        HaloShardedMatrix(
            rows_int=jnp.asarray(rows_int), cols_int=jnp.asarray(cols_int),
            vals_int=jnp.asarray(vals_int),
            rows_halo=jnp.asarray(rows_halo),
            cols_halo=jnp.asarray(cols_halo),
            vals_halo=jnp.asarray(vals_halo),
            send_idx=jnp.asarray(send_idx),
            n_local=n_local, n_global=n_pad, halo=h_pad, axis=axis,
        ),
        n_pad,
    )


def dist_spmm_halo(hsm: HaloShardedMatrix, x_local: jax.Array) -> jax.Array:
    """``A @ x`` with boundary-only exchange and comm/compute overlap.

    Schedule: (1) launch the all_to_all of the send rows; (2) reduce the
    interior edges from ``x_local`` — this consumes no exchanged data, so the
    collective's latency hides under it; (3) reduce the halo edges from the
    receive buffer and add. Comm volume is O(D·H·F) per device — the halo
    size, not the graph size — and self-rows never travel."""
    send = x_local[hsm.send_idx]  # [D, H, F]
    recv = jax.lax.all_to_all(send, hsm.axis, split_axis=0, concat_axis=0)

    g_int = x_local[hsm.cols_int] * hsm.vals_int[:, None].astype(x_local.dtype)
    out = jax.ops.segment_sum(
        g_int, hsm.rows_int, num_segments=hsm.n_local, indices_are_sorted=True
    )

    flat = recv.reshape(-1, x_local.shape[-1])  # [D*H, F]
    g_halo = flat[hsm.cols_halo] * hsm.vals_halo[:, None].astype(x_local.dtype)
    return out + jax.ops.segment_sum(
        g_halo, hsm.rows_halo, num_segments=hsm.n_local,
        indices_are_sorted=True
    )


@struct.dataclass
class CooTileTables:
    """Stacked (or shard-local) single-segment COO-tile chunk tables.

    Host-built with a leading device axis on every array leaf
    (``[D, C]`` / ``[D, C, E_B]``); ``local()`` drops it inside shard_map.
    """

    ctr: jax.Array   # [D, C] int32 tile-row per chunk (nondecreasing)
    ctc: jax.Array   # [D, C] int32 tile-col per chunk
    rows: jax.Array  # [D, C, E_B] int32 tile-local dest rows
    cols: jax.Array  # [D, C, E_B] int32 tile-local src cols
    vals: jax.Array  # [D, C, E_B] float32
    n_rb: int = struct.field(pytree_node=False)
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    tile: int = struct.field(pytree_node=False)
    e_b: int = struct.field(pytree_node=False)

    def local(self) -> "CooTileTables":
        return self.replace(ctr=self.ctr[0], ctc=self.ctc[0],
                            rows=self.rows[0], cols=self.cols[0],
                            vals=self.vals[0])


def _ct_run(tb: CooTileTables, x: jax.Array) -> jax.Array:
    """Run the COO-tile Pallas kernel on shard-local chunk tables."""
    from ..sparse.pallas_cootile import CooTile, CooTileSegment, cootile_spmm

    seg = CooTileSegment(ctr=tb.ctr, ctc=tb.ctc, rows=tb.rows, cols=tb.cols,
                         vals=tb.vals, rb_lo=0, rb_hi=tb.n_rb)
    ct = CooTile(segments=(seg,), tile=tb.tile, e_b=tb.e_b,
                 n_rows=tb.n_rows, n_cols=tb.n_cols)
    # Pallas needs an accelerator; the CPU test mesh runs interpret mode
    return cootile_spmm(ct, x, precision="highest",
                        interpret=jax.default_backend() not in ("tpu", "gpu"))


@jax.custom_vjp
def _ct_pair_spmm(fwd_tb: CooTileTables, bwd_tb: CooTileTables,
                  x: jax.Array) -> jax.Array:
    """``A_local @ x`` through the COO-tile kernel, differentiable in ``x``
    (cotangent ``A_localᵀ @ g`` through the pre-built transpose tables —
    same custom-VJP shape as :func:`h2gcn_tpu.sparse.matrix.spmm`)."""
    return _ct_run(fwd_tb, x)


def _ct_pair_fwd(fwd_tb, bwd_tb, x):
    return _ct_run(fwd_tb, x), (fwd_tb, bwd_tb)


def _ct_pair_bwd(res, g):
    fwd_tb, bwd_tb = res
    dx = _ct_run(bwd_tb, g)
    return (jax.tree_util.tree_map(jnp.zeros_like, fwd_tb),
            jax.tree_util.tree_map(jnp.zeros_like, bwd_tb), dx)


_ct_pair_spmm.defvjp(_ct_pair_fwd, _ct_pair_bwd)


@struct.dataclass
class HaloCooTileMatrix:
    """Halo-sharded matrix whose local reduces run on the MXU.

    Same partition + boundary all_to_all as :class:`HaloShardedMatrix`, but
    the interior and halo edge sets are stored as COO-tile chunk tables
    (pallas_cootile.py) instead of flat gather/segment-sum COO — each
    device's local aggregation densifies its edge chunks on the MXU, so the
    distributed path inherits the blocked kernel's edges/s instead of the
    segment fallback's. Transposed tables ride along for the custom VJP.
    """

    send_idx: jax.Array          # [D(owner), D(dest), H] int32
    int_fwd: CooTileTables       # [n_local, n_local] interior edges
    int_bwd: CooTileTables       # interiorᵀ
    halo_fwd: CooTileTables      # [n_local, D·H] over the recv buffer
    halo_bwd: CooTileTables      # haloᵀ: [D·H, n_local]
    n_local: int = struct.field(pytree_node=False)
    n_global: int = struct.field(pytree_node=False)
    halo: int = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False, default=GRAPH_AXIS)

    def local(self) -> "HaloCooTileMatrix":
        return self.replace(
            send_idx=self.send_idx[0],
            int_fwd=self.int_fwd.local(), int_bwd=self.int_bwd.local(),
            halo_fwd=self.halo_fwd.local(), halo_bwd=self.halo_bwd.local(),
        )


def _stack_chunk_tables(mats, tile, e_b) -> CooTileTables:
    """Per-shard scipy matrices → uniform stacked chunk tables.

    Chunk counts differ per shard; pad every shard to the max (rounded to a
    multiple of 8 for the 8-chunk DMA blocks) with chunks parked on the last
    tile row carrying zero values — the same fill rule as build_cootile's
    segment padding, so they accumulate nothing."""
    from ..sparse.pallas_cootile import _MAX_CHUNKS, build_chunk_tables

    per = [build_chunk_tables(m, tile, e_b) for m in mats]
    n_rb = per[0][5]
    cmax = max(len(p[0]) for p in per)
    assert all(p[6] == e_b for p in per)
    cmax = int(math.ceil(cmax / 8)) * 8
    if cmax > _MAX_CHUNKS:
        raise ValueError(
            f"halo-cootile shard needs {cmax} chunks (> {_MAX_CHUNKS} SMEM "
            "budget) — raise e_b, use more shards, or mode='halo'")
    ctr = np.full((len(per), cmax), n_rb - 1, np.int32)
    ctc = np.zeros((len(per), cmax), np.int32)
    rows = np.zeros((len(per), cmax, e_b), np.int32)
    cols = np.zeros((len(per), cmax, e_b), np.int32)
    vals = np.zeros((len(per), cmax, e_b), np.float32)
    for d, (tr, tc, r, c, v, rb, _eb) in enumerate(per):
        assert rb == n_rb
        k = len(tr)
        ctr[d, :k], ctc[d, :k] = tr, tc
        rows[d, :k], cols[d, :k], vals[d, :k] = r, c, v
    n, m = mats[0].shape
    return CooTileTables(
        ctr=jnp.asarray(ctr), ctc=jnp.asarray(ctc), rows=jnp.asarray(rows),
        cols=jnp.asarray(cols), vals=jnp.asarray(vals),
        n_rb=n_rb, n_rows=n, n_cols=m, tile=tile, e_b=e_b,
    )


def shard_matrix_halo_cootile(
    mat, num_shards: int, axis: str = GRAPH_AXIS,
    tile: int = 512, e_b: int = 512,
) -> Tuple[HaloCooTileMatrix, int]:
    """Halo partition (:func:`shard_matrix_halo`) re-expressed as COO-tile
    chunk tables so the local reduces run on the MXU."""
    import scipy.sparse as sp

    hsm, n_pad = shard_matrix_halo(mat, num_shards, axis)
    D = num_shards
    n_local, h_pad = hsm.n_local, hsm.halo

    def to_csr(rows, cols, vals, shape):
        m = sp.coo_matrix(
            (np.asarray(vals), (np.asarray(rows), np.asarray(cols))),
            shape=shape).tocsr()
        m.eliminate_zeros()  # padding slots carry explicit zeros
        return m

    ints, halos = [], []
    for d in range(D):
        ints.append(to_csr(hsm.rows_int[d], hsm.cols_int[d], hsm.vals_int[d],
                           (n_local, n_local)))
        halos.append(to_csr(hsm.rows_halo[d], hsm.cols_halo[d],
                            hsm.vals_halo[d], (n_local, D * h_pad)))
    return (
        HaloCooTileMatrix(
            send_idx=hsm.send_idx,
            int_fwd=_stack_chunk_tables(ints, tile, e_b),
            int_bwd=_stack_chunk_tables(
                [sp.csr_matrix(m.T) for m in ints], tile, e_b),
            halo_fwd=_stack_chunk_tables(halos, tile, e_b),
            halo_bwd=_stack_chunk_tables(
                [sp.csr_matrix(m.T) for m in halos], tile, e_b),
            n_local=n_local, n_global=hsm.n_global, halo=h_pad, axis=axis,
        ),
        n_pad,
    )


def dist_spmm_halo_cootile(hcm: HaloCooTileMatrix,
                           x_local: jax.Array) -> jax.Array:
    """``A @ x`` with boundary-only exchange and MXU-blocked local reduces.

    Same schedule as :func:`dist_spmm_halo` — launch the all_to_all, reduce
    interior edges (independent of the exchange, so XLA hides the
    collective under it), then reduce halo edges from the recv buffer —
    with both reduces on the COO-tile Pallas kernel."""
    send = x_local[hcm.send_idx]  # [D, H, F]
    recv = jax.lax.all_to_all(send, hcm.axis, split_axis=0, concat_axis=0)

    out = _ct_pair_spmm(hcm.int_fwd, hcm.int_bwd, x_local)
    flat = recv.reshape(-1, x_local.shape[-1])  # [D*H, F]
    return out + _ct_pair_spmm(hcm.halo_fwd, hcm.halo_bwd, flat)


def pad_nodes(arr: np.ndarray, n_pad: int) -> np.ndarray:
    """Zero-pad the leading (node) axis to ``n_pad``."""
    if arr.shape[0] == n_pad:
        return arr
    pad_width = [(0, n_pad - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad_width)


def shard_hops(mats: List, num_shards: int, axis: str = GRAPH_AXIS,
               mode: str = "allgather"):
    """Shard a list of hop matrices; returns (list of shards, n_pad).

    ``mode='allgather'`` → :class:`ShardedMatrix` (one all_gather per SpMM);
    ``mode='ring'`` → :class:`RingShardedMatrix` (ppermute ring with
    comm/compute overlap, O(n_local·F) peak memory);
    ``mode='halo'`` → :class:`HaloShardedMatrix` (boundary-only all_to_all,
    comm volume scales with the halo, not the graph);
    ``mode='halo-cootile'`` → :class:`HaloCooTileMatrix` (same exchange,
    local reduces on the COO-tile MXU kernel).
    """
    builder = {"allgather": shard_matrix, "ring": shard_matrix_ring,
               "halo": shard_matrix_halo,
               "halo-cootile": shard_matrix_halo_cootile}[mode]
    out = []
    n_pad = None
    for m in mats:
        sm, n_pad = builder(m, num_shards, axis)
        out.append(sm)
    return out, n_pad
