"""Distributed GAT: dest-stripe-sharded gather attention under shard_map.

The reference GAT (``baselines/GAT/utils/layers.py:53-100``) is strictly
single-device; this module is the at-scale path the reference never had —
the attention analogue of :mod:`.dist`'s halo SpMM (VERDICT r4 task #1).

Partitioning (reusing the halo machinery's scheme):

* nodes are padded to ``n_pad = D·n_local`` and row-sharded — device ``d``
  owns destination rows ``[d·n_local, (d+1)·n_local)`` and the matching
  slice of the feature/activation arrays;
* each device owns ALL attention edges targeting its rows; edge source
  columns are remapped into the CONCATENATED source space
  ``[local rows | halo recv buffer]`` (``n_cat = n_local + D·h_pad``),
  exactly like :class:`.dist.HaloSharded Matrix`'s halo columns;
* per layer, each device projects its local ``x`` shard (``h = xW``,
  ``f1 = h·a1``, ``f2 = h·a2``) and exchanges ONLY the boundary rows of
  ``[f2 | h]`` via one ``all_to_all`` — comm volume is
  ``D·h_pad·(H + H·feat)`` floats per device, the HIDDEN width, not the
  input features and not the graph size;
* the local attention is one RECTANGULAR gather-attention call
  (:func:`..sparse.pallas_attention_gather.gat_attention_gather` over
  ``[n_local × n_cat]`` tables) — softmax per local destination row is
  exact because every in-edge of an owned row is local by construction.
  The whole-attention custom VJP runs unchanged; cotangents for received
  halo rows flow back to their owners through the ``all_to_all``
  transpose automatically.

Per-shard gather tables are padded to uniform static shapes (steps,
edges, slots) and stacked with a leading device axis so one
:class:`DistGatherAttn` pytree flows through ``shard_map`` with
``P(axis)`` on every leaf — the same container pattern as
:class:`.dist.HaloCooTileMatrix`.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..sparse.pallas_attention_gather import GatherAttn
from ..sparse.pallas_gscatter import GScatter, GScatterSegment
from .mesh import GRAPH_AXIS


@struct.dataclass
class StackedGatherTables:
    """One orientation's gscatter chunk tables for every shard, padded to
    uniform static shapes, leading axis = device (consumed by shard_map).
    Strippable into a single-segment :class:`GScatter` via
    :func:`_local_gs`."""

    ctr: jax.Array    # [D, nsteps] int32
    rows: jax.Array   # [D, nsteps*kb, e_b] int32
    cols: jax.Array   # [D, nsteps*kb*e_b] int32
    vals: jax.Array   # [D, nsteps*kb, e_b] float32
    s2e: jax.Array    # [D, nsteps*kb*e_b] int32 slot→edge (pad → e_pad)
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    rb: int = struct.field(pytree_node=False)


def _local_gs(t: StackedGatherTables, tile: int, e_b: int,
              kb: int) -> GScatter:
    """Stacked tables (device axis already consumed) → GScatter."""
    nslots = int(t.cols.shape[-1])
    seg = GScatterSegment(
        ctr=t.ctr, rows=t.rows, cols=t.cols, vals=t.vals,
        rb_lo=0, rb_hi=t.rb, slot_lo=0, slot_hi=nslots,
    )
    return GScatter(segments=(seg,), tile=tile, e_b=e_b, kb=kb,
                    n_rows=t.n_rows, n_cols=t.n_cols)


@struct.dataclass
class DistAttnShard:
    """Per-device view inside the shard_map body: the rectangular local
    :class:`GatherAttn` plus this shard's halo send table. Duck-types the
    ``adj`` argument of :class:`DistGATNetwork` (carries ``.attn`` so the
    GATNetwork fused-path dispatch recognizes the gather payload)."""

    attn: GatherAttn
    send_idx: jax.Array   # [D, h_pad] int32 local rows to send per dest
    n_local: int = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False, default=GRAPH_AXIS)


@struct.dataclass
class DistGatherAttn:
    """Host-side container: stacked per-shard attention tables with a
    leading device axis on every array leaf; ``local()`` strips it inside
    the shard_map body (the :class:`.dist.HaloCooTileMatrix` pattern)."""

    send_idx: jax.Array           # [D(owner), D(dest), h_pad] int32
    fwd: StackedGatherTables      # [n_local × n_cat] dest-stripe tables
    bwd: StackedGatherTables      # transpose: [n_cat × n_local]
    rows_e: jax.Array             # [D, e_pad] int32 local dest row per edge
    cols_e: jax.Array             # [D, e_pad] int32 concat-space source col
    s2e_pass: jax.Array           # placeholder-free: unused, kept 0-size
    n_local: int = struct.field(pytree_node=False)
    n_cat: int = struct.field(pytree_node=False)
    h_pad: int = struct.field(pytree_node=False)
    e_pad: int = struct.field(pytree_node=False)
    tile: int = struct.field(pytree_node=False, default=512)
    e_b: int = struct.field(pytree_node=False, default=128)
    kb: int = struct.field(pytree_node=False, default=8)
    axis: str = struct.field(pytree_node=False, default=GRAPH_AXIS)

    def local(self) -> DistAttnShard:
        ga = GatherAttn(
            fwd=_local_gs(
                StackedGatherTables(
                    ctr=self.fwd.ctr[0], rows=self.fwd.rows[0],
                    cols=self.fwd.cols[0], vals=self.fwd.vals[0],
                    s2e=self.fwd.s2e[0], n_rows=self.fwd.n_rows,
                    n_cols=self.fwd.n_cols, rb=self.fwd.rb),
                self.tile, self.e_b, self.kb),
            bwd=_local_gs(
                StackedGatherTables(
                    ctr=self.bwd.ctr[0], rows=self.bwd.rows[0],
                    cols=self.bwd.cols[0], vals=self.bwd.vals[0],
                    s2e=self.bwd.s2e[0], n_rows=self.bwd.n_rows,
                    n_cols=self.bwd.n_cols, rb=self.bwd.rb),
                self.tile, self.e_b, self.kb),
            rows=self.rows_e[0], cols=self.cols_e[0],
            slot_fwd=self.s2e_pass[0], slot_bwd=self.s2e_pass[0],
            slot2edge_fwd=self.fwd.s2e[0], slot2edge_bwd=self.bwd.s2e[0],
            n=self.n_local, num_edges=self.e_pad, n_src=self.n_cat,
        )
        return DistAttnShard(attn=ga, send_idx=self.send_idx[0],
                             n_local=self.n_local, axis=self.axis)


def _pack_shard_tables(gas, orient: str, n_rows: int, n_cols: int,
                       e_pads, tile: int, e_b: int,
                       kb: int) -> StackedGatherTables:
    """Pad each shard's single-segment tables to uniform step count (+ one
    guaranteed all-zero DEAD step so padding edges have somewhere inert to
    point) and stack with a leading device axis."""
    segs = [getattr(ga, orient).segments for ga in gas]
    for s in segs:
        if len(s) != 1:
            raise ValueError(
                "distributed gather attention needs single-segment shard "
                f"tables ({len(s)} segments built) — use more shards or a "
                "larger gscatter step cap")
    segs = [s[0] for s in segs]
    rb = segs[0].rb_hi
    assert all(s.rb_lo == 0 and s.rb_hi == rb for s in segs)
    nsteps = max(int(s.ctr.shape[0]) for s in segs) + 1  # +1 = dead step
    D = len(segs)
    ctr = np.zeros((D, nsteps), np.int32)
    rows = np.zeros((D, nsteps * kb, e_b), np.int32)
    cols = np.zeros((D, nsteps * kb * e_b), np.int32)
    vals = np.zeros((D, nsteps * kb, e_b), np.float32)
    s2e = np.empty((D, nsteps * kb * e_b), np.int32)
    for d, (ga, seg) in enumerate(zip(gas, segs)):
        k = int(seg.ctr.shape[0])
        ctr[d, :k] = np.asarray(seg.ctr)
        ctr[d, k:] = ctr[d, k - 1]  # repeat-last: accumulates zeros
        rows[d, : k * kb] = np.asarray(seg.rows)
        cols[d, : k * kb * e_b] = np.asarray(seg.cols)
        vals[d, : k * kb] = np.asarray(seg.vals)
        # slot→edge inverse in the UNIFORM slot space: padding edges and
        # dead slots all read the sentinel zero row (index e_pad)
        s2e[d] = e_pads
        slot = np.asarray(ga.slot_fwd if orient == "fwd" else ga.slot_bwd)
        s2e[d, slot] = np.arange(len(slot), dtype=np.int32)
    return StackedGatherTables(
        ctr=jnp.asarray(ctr), rows=jnp.asarray(rows), cols=jnp.asarray(cols),
        vals=jnp.asarray(vals), s2e=jnp.asarray(s2e),
        n_rows=n_rows, n_cols=n_cols, rb=rb,
    )


def shard_attention_gather(
    support, num_shards: int, axis: str = GRAPH_AXIS,
    tile: int = 512, e_b: int = 128, kb: int = 8,
) -> Tuple[DistGatherAttn, int]:
    """Row-partition the (self-looped) attention support into dest-stripe
    shards with halo-exchange tables (host-side precompute).

    Returns ``(dist payload, n_pad)``. Mask semantics match
    :func:`..sparse.pallas_attention_gather.build_gatherattn`: any stored
    nonzero is an edge."""
    import scipy.sparse as sp

    from ..sparse.pallas_attention_gather import build_gatherattn

    csr = sp.csr_matrix(support)
    n = csr.shape[0]
    assert csr.shape[1] == n, "attention support must be square"
    D = num_shards
    n_local = -(-n // D)
    n_pad = n_local * D

    blocks, needed = [], [[None] * D for _ in range(D)]
    max_h = 1
    for d in range(D):
        lo, hi = d * n_local, min((d + 1) * n_local, n)
        block = csr[lo:hi].tocoo() if lo < n else sp.coo_matrix((0, n))
        blocks.append(block)
        src = block.col // n_local
        for s in range(D):
            if s == d:
                needed[d][s] = np.empty(0, np.int64)
                continue
            u = np.unique(block.col[src == s]).astype(np.int64)
            needed[d][s] = u
            max_h = max(max_h, len(u))
    h_pad = int(math.ceil(max_h / 8)) * 8
    n_cat = n_local + D * h_pad

    send_idx = np.zeros((D, D, h_pad), np.int32)
    gas, e_sizes = [], []
    for d in range(D):
        block = blocks[d]
        src = block.col // n_local
        remapped = np.where(
            src == d, block.col - d * n_local, 0).astype(np.int64)
        for s in range(D):
            sel = src == s
            if s == d or not sel.any():
                continue
            pos = np.searchsorted(needed[d][s], block.col[sel])
            remapped[sel] = n_local + s * h_pad + pos
        local = sp.csr_matrix(
            (np.ones(block.nnz, np.float32), (block.row, remapped)),
            shape=(n_local, n_cat))
        local.sum_duplicates()
        gas.append(build_gatherattn(local, tile=tile, e_b=e_b, kb=kb))
        e_sizes.append(local.nnz)
        for dest in range(D):
            u = needed[dest][d]
            send_idx[d, dest, : len(u)] = u - d * n_local

    e_pad = max(int(math.ceil(max(e_sizes) / 8)) * 8, 8)
    rows_e = np.zeros((D, e_pad), np.int32)
    cols_e = np.zeros((D, e_pad), np.int32)
    for d, ga in enumerate(gas):
        E = int(ga.num_edges)
        rows_e[d, :E] = np.asarray(ga.rows)
        cols_e[d, :E] = np.asarray(ga.cols)
    return (
        DistGatherAttn(
            send_idx=jnp.asarray(send_idx),
            fwd=_pack_shard_tables(gas, "fwd", n_local, n_cat, e_pad,
                                   tile, e_b, kb),
            bwd=_pack_shard_tables(gas, "bwd", n_cat, n_local, e_pad,
                                   tile, e_b, kb),
            rows_e=jnp.asarray(rows_e), cols_e=jnp.asarray(cols_e),
            s2e_pass=jnp.zeros((D, 1), jnp.int32),
            n_local=n_local, n_cat=n_cat, h_pad=h_pad, e_pad=e_pad,
            tile=tile, e_b=e_b, kb=kb, axis=axis,
        ),
        n_pad,
    )


from ..models.GAT import GATNetwork  # noqa: E402  (no import cycle:
# models.GAT → _runtime pulls parallel only lazily inside
# _initialize_distributed)


class DistGATNetwork(GATNetwork):
    """GATNetwork whose fused layers run dest-stripe-sharded attention.

    Same params pytree, same runtime model interface, same math as the
    single-device :class:`~h2gcn_tpu.models.GAT.GATNetwork` with the
    gather payload (``tests/test_dist_attention.py`` pins gradient
    parity); differs only in WHERE tensors live: ``x`` is this device's
    node shard, and each layer exchanges only the boundary rows of the
    projected ``[f2 | h]`` before a rectangular local attention call."""

    def __init__(self, *a, **kw):
        kw["fused_attention"] = True  # the dist path IS the fused path
        super().__init__(*a, **kw)

    @classmethod
    def from_single(cls, model: GATNetwork) -> "DistGATNetwork":
        """Clone a configured single-device GATNetwork's hyperparameters
        (the params pytree is shared verbatim)."""
        return cls(
            model.num_classes, hid_units=model.hid_units,
            n_heads=model.n_heads, in_drop=model.in_drop,
            attn_drop=model.attn_drop, residual=model.residual,
            l2_coef=model.l2_coef,
            fused_precision=model.fused_precision,
        )

    def _fused_layer(self, heads, x, adj, *, training, rng, layer_idx,
                     residual=False, capture_alpha=None):
        if capture_alpha is not None:
            raise NotImplementedError(
                "attention-coefficient capture is single-chip only "
                "(run without --mesh_shards for the parity harness)")
        from ..nn.ops import dropout as _dropout
        from ..sparse.pallas_attention_gather import gat_attention_gather

        h_parts, f1_parts, f2_parts, xd_parts = [], [], [], []
        for hi, p in enumerate(heads):
            # identical dropout structure / per-head keys to the
            # single-device fused layer (models/GAT.py); rng is already
            # per-device folded by the distributed train step
            key = (jax.random.fold_in(rng, layer_idx * 1000 + hi)
                   if rng is not None else None)
            xd = _dropout(x, self.in_drop, key, 0, training=training)
            xd_parts.append(xd)
            hk = jnp.matmul(xd, p["W"], precision=jax.lax.Precision.HIGHEST)
            f1_parts.append(hk @ p["a1"] + p["b1"])
            f2_parts.append(hk @ p["a2"] + p["b2"])
            h_parts.append(_dropout(hk, self.in_drop, key, 2,
                                    training=training))
        feat = h_parts[0].shape[1]
        nh = len(heads)
        f1 = jnp.stack(f1_parts, axis=1)           # [n_local, H] stays local
        payload = jnp.concatenate(
            [jnp.stack(f2_parts, axis=1),
             jnp.concatenate(h_parts, axis=1)], axis=1)
        # ONE boundary exchange carries both the per-source attention
        # factor f2 and the projected features h — D·h_pad·(H + H·feat)
        # floats per device per layer, the hidden width, not the graph
        cat = halo_concat(adj, payload)            # [n_cat, H + H·feat]
        f2c, hc = cat[:, :nh], cat[:, nh:]
        interpret = jax.default_backend() not in ("tpu", "gpu")
        drop_key = (jax.random.fold_in(rng, layer_idx * 1000 + 777)
                    if rng is not None and training and self.attn_drop
                    else None)
        out = gat_attention_gather(
            adj.attn, f1, f2c, hc, num_heads=nh, feat=feat,
            n_out=adj.n_local, interpret=interpret,
            precision=self.fused_precision,
            attn_drop=self.attn_drop if training else 0.0,
            drop_key=drop_key,
        )
        outs = []
        for k, p in enumerate(heads):
            o = out[:, k * feat:(k + 1) * feat] + p["bias"]
            if residual:
                xd = xd_parts[k]
                if "Wres" in p:
                    o = o + jnp.matmul(
                        xd, p["Wres"], precision=jax.lax.Precision.HIGHEST,
                    ) + p["bres"]
                else:
                    o = o + xd
            outs.append(o)
        return outs

    def get_embeddings(self, params, adj, x, adjhops):
        h = x
        n_layers = len(params["layers"])
        for li, heads in enumerate(params["layers"][:-1]):
            outs = self._fused_layer(
                heads, h, adj, training=False, rng=None, layer_idx=li,
                residual=self.residual and li < n_layers - 1)
            h = jnp.concatenate([jax.nn.elu(o) for o in outs], axis=1)
        return h


def halo_concat(shard: DistAttnShard, payload: jax.Array) -> jax.Array:
    """Boundary exchange: local payload rows → ``[n_cat, W]`` concat space.

    ``send = payload[send_idx]`` is [D, h_pad, W]; the ``all_to_all``
    routes slice ``dest`` to device ``dest``, so the receive buffer's row
    ``s·h_pad + pos`` is source-shard ``s``'s ``pos``-th needed row —
    exactly the layout the shard's remapped columns index. Differentiable:
    the transpose all_to_all routes halo cotangents back to their owners.
    """
    send = payload[shard.send_idx]
    recv = jax.lax.all_to_all(send, shard.axis, split_axis=0, concat_axis=0)
    return jnp.concatenate(
        [payload, recv.reshape(-1, payload.shape[1])], axis=0)
