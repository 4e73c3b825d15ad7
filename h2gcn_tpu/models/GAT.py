"""GAT / SpGAT baseline (Veličković et al., ICLR 2018).

Reference semantics (baselines/GAT/):
  * sparse attention head (utils/layers.py:53-100): ``h = XW``; per-edge
    logit ``leakyrelu(a₁ᵀh_i + a₂ᵀh_j)`` over the self-looped adjacency;
    per-destination sparse softmax; attention dropout; ``Σ α_ij h_j + bias``
    then ELU;
  * 8 concatenated heads of width 8 in layer 1, 1 averaged head at the
    output (execute_cora_sparse.py:18-19);
  * Adam lr 0.005, L2 ``5e-4·Σ½‖θ‖²`` over all weights (base_gattn.py:12-26),
    input/attention dropout 0.6, patience-100 early stopping tracking both
    best val acc and best val loss (execute_cora_sparse.py:200-230).

TPU design: the attention is SDDMM + segment-softmax over padded COO edges —
gathers and segment reductions with static shapes, the whole multi-head layer
inside one jit. Padded edges carry ``-inf`` logits so they vanish in the
softmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.metrics import masked_softmax_cross_entropy
from ..sparse import transforms
from . import _runtime


def segment_softmax(logits, segment_ids, num_segments, valid):
    """Numerically-stable softmax over edges grouped by destination row."""
    logits = jnp.where(valid, logits, -jnp.inf)
    seg_max = jax.ops.segment_max(
        logits, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.where(valid, jnp.exp(logits - seg_max[segment_ids]), 0.0)
    denom = jax.ops.segment_sum(
        ex, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )
    return ex / jnp.maximum(denom[segment_ids], 1e-16)


class GATNetwork:
    """Multi-head graph attention with the runtime model interface.

    The attention support (self-looped adjacency) arrives per call as the
    ``adj`` SparseMatrix — edges are jit ARGUMENTS, not model-held constants,
    so compiled programs stay small on large graphs.
    """

    def __init__(self, num_classes, *,
                 hid_units=(8,), n_heads=(8, 1), in_drop=0.6, attn_drop=0.6,
                 residual=False, l2_coef=5e-4, fused_attention=False,
                 fused_precision="highest"):
        self.num_classes = num_classes
        # fused Pallas attention: used when the adjacency carries a BSR
        # payload (sparse/pallas_attention.py, small graphs) or COO-chunk
        # tables (sparse/pallas_attention_coo.py, the O(nnz) at-scale
        # payload) and no per-coefficient state is needed (attention
        # dropout off or eval, no coefficient capture)
        self.fused_attention = fused_attention
        # "highest" = 6-pass f32 head contractions (parity); "default" =
        # single-pass bf16 w/ f32 accumulation (~6x fewer MXU FLOPs,
        # ~4e-3 relative error) — COO-chunk path only
        self.fused_precision = fused_precision
        self.hid_units = list(hid_units)
        self.n_heads = list(n_heads)
        self.in_drop = in_drop
        self.attn_drop = attn_drop
        self.residual = residual
        self.l2_coef = l2_coef
        self.embedding_ind = None
        self.output_ind = None
        self.last_attn_coefs = None

    @property
    def num_layers(self):
        return len(self.hid_units) + 1

    def init(self, rng, input_dim: int, num_hops: int = 1):
        glorot = jax.nn.initializers.glorot_uniform()
        layers = []
        dims = [input_dim] + [h * k for h, k in
                              zip(self.hid_units, self.n_heads[:-1])]
        out_dims = self.hid_units + [self.num_classes]
        n_layers = len(out_dims)
        for li, (din, dout) in enumerate(zip(dims, out_dims)):
            heads = []
            for hi in range(self.n_heads[li] if li < len(self.n_heads) else 1):
                k = jax.random.fold_in(rng, li * 100 + hi)
                head = {
                    "W": glorot(jax.random.fold_in(k, 0), (din, dout),
                                jnp.float32),
                    "a1": glorot(jax.random.fold_in(k, 1), (dout, 1),
                                 jnp.float32)[:, 0],
                    "a2": glorot(jax.random.fold_in(k, 2), (dout, 1),
                                 jnp.float32)[:, 0],
                    "b1": jnp.zeros((), jnp.float32),
                    "b2": jnp.zeros((), jnp.float32),
                    "bias": jnp.zeros((dout,), jnp.float32),
                }
                if self.residual and li < n_layers - 1 and din != dout:
                    # learned 1x1 projection for the residual when dims
                    # differ (reference utils/layers.py:94-99 conv1d)
                    head["Wres"] = glorot(jax.random.fold_in(k, 3),
                                          (din, dout), jnp.float32)
                    head["bres"] = jnp.zeros((dout,), jnp.float32)
                heads.append(head)
            layers.append(heads)
        return {"layers": layers}

    def _attn_head(self, p, x, adj, *, training, key, capture_alpha=None,
               residual=False):
        rows, cols = adj.rows, adj.cols
        edge_valid = adj.vals > 0  # padding entries carry value 0
        n = adj.shape[0]

        from ..nn.ops import dropout as _dropout

        def dropout(v, rate, salt):
            return _dropout(v, rate, key, salt, training=training)

        x = dropout(x, self.in_drop, 0)
        h = jnp.matmul(x, p["W"], precision=jax.lax.Precision.HIGHEST)
        f1 = h @ p["a1"] + p["b1"]
        f2 = h @ p["a2"] + p["b2"]
        e = jax.nn.leaky_relu(f1[rows] + f2[cols], 0.2)
        alpha = segment_softmax(e, rows, n, edge_valid)
        alpha = dropout(alpha, self.attn_drop, 1)
        h = dropout(h, self.in_drop, 2)
        out = jax.ops.segment_sum(
            alpha[:, None] * h[cols], rows,
            num_segments=n, indices_are_sorted=True,
        )
        out = out + p["bias"]
        if residual:
            # pre-activation residual (reference utils/layers.py:94-99);
            # uses the post-input-dropout x, as the reference reassigns seq
            if "Wres" in p:
                out = out + jnp.matmul(
                    x, p["Wres"], precision=jax.lax.Precision.HIGHEST
                ) + p["bres"]
            else:
                out = out + x
        if capture_alpha is not None:
            capture_alpha.append(alpha)
        return out

    def _fused_layer(self, heads, x, adj, *, training, rng, layer_idx,
                 residual=False, capture_alpha=None):
        """All heads of one layer through the fused Pallas attention kernel."""
        from ..nn.ops import dropout as _dropout

        h_parts, f1_parts, f2_parts, xd_parts = [], [], [], []
        for hi, p in enumerate(heads):
            # same dropout structure and per-head keys as the unfused path:
            # logits come from the PRE-dropout transform; only the
            # aggregated features get the second dropout
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
        interpret = jax.default_backend() not in ("tpu", "gpu")
        from ..sparse.pallas_attention_gather import GatherAttn

        if isinstance(getattr(adj, "attn", None), GatherAttn):
            from ..sparse.pallas_attention_gather import gat_attention_gather

            # α materializes per edge on this path, so coefficient dropout
            # IS expressible (unlike the flash-style chunk kernels); one
            # layer-folded key drives the [E, H] mask
            drop_key = (jax.random.fold_in(rng, layer_idx * 1000 + 777)
                        if rng is not None and training and self.attn_drop
                        else None)
            out = gat_attention_gather(
                adj.attn,
                jnp.stack(f1_parts, axis=1),
                jnp.stack(f2_parts, axis=1),
                jnp.concatenate(h_parts, axis=1),
                num_heads=len(heads), feat=feat, n_out=x.shape[0],
                interpret=interpret, precision=self.fused_precision,
                attn_drop=self.attn_drop if training else 0.0,
                drop_key=drop_key,
            )
            if capture_alpha is not None:
                # α exists as a per-edge tensor here — the at-scale capture
                # path (the unfused segment composition faults past ~100K
                # nodes on this runtime); [E, H] → [H, E] like the unfused
                # per-head stack
                from ..sparse.pallas_attention_gather import (
                    gather_attention_coefficients)

                capture_alpha.append(gather_attention_coefficients(
                    adj.attn, jnp.stack(f1_parts, axis=1),
                    jnp.stack(f2_parts, axis=1)).T)
        elif getattr(adj, "attn", None) is not None:
            from ..sparse.pallas_attention_coo import gat_attention_coo

            out = gat_attention_coo(
                adj.attn,
                jnp.stack(f1_parts, axis=1),
                jnp.stack(f2_parts, axis=1),
                jnp.concatenate(h_parts, axis=1),
                num_heads=len(heads), feat=feat, n_out=x.shape[0],
                interpret=interpret, precision=self.fused_precision,
            )
        else:
            from ..sparse.pallas_attention import gat_attention

            out = gat_attention(
                adj.bsr,
                jnp.stack(f1_parts, axis=1),
                jnp.stack(f2_parts, axis=1),
                jnp.concatenate(h_parts, axis=1),
                num_heads=len(heads), feat=feat, n_out=x.shape[0],
                interpret=interpret,
            )
        outs = []
        for k, p in enumerate(heads):
            o = out[:, k * feat:(k + 1) * feat] + p["bias"]
            if residual:
                xd = xd_parts[k]
                if "Wres" in p:
                    o = o + jnp.matmul(
                        xd, p["Wres"], precision=jax.lax.Precision.HIGHEST
                    ) + p["bres"]
                else:
                    o = o + xd
            outs.append(o)
        return outs

    def apply(self, params, adj, x, adjhops, *, training=False, rng=None,
              capture=None, **kw):
        h = x
        n_layers = len(params["layers"])
        # the fused kernel carries a custom VJP (two-pass flash-style
        # backward), so it trains too; attention-coefficient dropout is the
        # one thing it cannot express (coefficients never materialize)
        from ..sparse.pallas_attention_gather import GatherAttn

        is_gather = isinstance(getattr(adj, "attn", None), GatherAttn)
        use_fused = (
            self.fused_attention
            and (getattr(adj, "bsr", None) is not None
                 or getattr(adj, "attn", None) is not None)
            # the gather payload materializes α per edge, so BOTH
            # coefficient dropout and coefficient capture work fused
            # (the chunk/BSR kernels must fall back to the segment path)
            and (capture is None or is_gather)
            and (not training or self.attn_drop == 0 or is_gather)
        )
        # NOTE (r3): the 16MB "VMEM operand budget" guard that used to live
        # here was a misdiagnosis — both kernels stream their tiles through
        # VMEM; the real scale limit was the BSR's dense-block payload,
        # which build_gat_adjacency now avoids by routing large graphs to
        # the O(nnz) COO-chunk payload (backend="attn") at construction.
        # attention coefficients for EVERY layer and head (the reference's
        # getAttnCoeff returns a per-attention-layer list, H2GCN.py:355-360)
        all_alphas = [] if capture is not None else None
        for li, heads in enumerate(params["layers"]):
            layer_residual = self.residual and li < n_layers - 1
            if use_fused:
                outs = self._fused_layer(heads, h, adj, training=training,
                                         rng=rng, layer_idx=li,
                                         residual=layer_residual,
                                         capture_alpha=all_alphas)
                if li < n_layers - 1:
                    h = jnp.concatenate([jax.nn.elu(o) for o in outs], axis=1)
                else:
                    h = sum(outs) / len(outs)
                if capture is not None:
                    capture[f"activations/{li}-gat"] = h
                continue
            outs = []
            layer_alphas = [] if capture is not None else None
            for hi, p in enumerate(heads):
                key = (jax.random.fold_in(rng, li * 1000 + hi)
                       if rng is not None else None)
                outs.append(self._attn_head(
                    p, h, adj, training=training, key=key,
                    capture_alpha=layer_alphas, residual=layer_residual,
                ))
            if capture is not None:
                all_alphas.append(jnp.stack(layer_alphas))
            if li < n_layers - 1:
                # residual already applied per head, pre-activation
                h = jnp.concatenate([jax.nn.elu(o) for o in outs], axis=1)
            else:
                h = sum(outs) / len(outs)  # output heads averaged, no act
            if capture is not None:
                capture[f"activations/{li}-gat"] = h
        if capture is not None:
            self.last_attn_coefs = all_alphas
        return h

    def get_embeddings(self, params, adj, x, adjhops):
        h = x
        for heads in params["layers"][:-1]:
            h = jnp.concatenate(
                [jax.nn.elu(self._attn_head(p, h, adj, training=False,
                                            key=None))
                 for p in heads], axis=1)
        return h

    def l2_loss(self, params):
        # l2_coef · Σ ½‖θ‖² over every trainable tensor (tf.nn.l2_loss halves;
        # the reference's name-based bias exclusion matches nothing in
        # practice — quirk preserved, base_gattn.py:14-18).
        total = sum(
            jnp.sum(jnp.square(leaf))
            for leaf in jax.tree_util.tree_leaves(params)
        )
        return self.l2_coef * 0.5 * total

    def loss(self, params, logits, labels, mask):
        return masked_softmax_cross_entropy(logits, labels, mask) + self.l2_loss(
            params
        )


class GATPatienceController:
    """Reference GAT early stopping: stop after ``patience`` epochs with
    neither a new best val_acc nor a new best val_loss
    (execute_cora_sparse.py:200-230). Consumes the epoch stats dict."""

    def __init__(self, patience):
        self.patience = patience
        self.vacc_mx = -np.inf
        self.vlss_mn = np.inf
        self.curr_step = 0

    def __call__(self, epoch_stats) -> bool:
        vacc = float(epoch_stats["val_acc"])
        vlss = float(epoch_stats["val_loss"])
        if vacc >= self.vacc_mx or vlss <= self.vlss_mn:
            self.vacc_mx = max(vacc, self.vacc_mx)
            self.vlss_mn = min(vlss, self.vlss_mn)
            self.curr_step = 0
            return False
        self.curr_step += 1
        return self.patience > 0 and self.curr_step >= self.patience


def add_subparser_args(parser):
    group = parser.add_argument_group("GAT Model Arguments (GAT.py)")
    group.add_argument("--lr", default=0.005, type=float)
    group.add_argument("--l2_coef", default=0.0005, type=float)
    group.add_argument("--hid_units", default=[8], nargs="*", type=int)
    group.add_argument("--n_heads", default=[8, 1], nargs="*", type=int)
    group.add_argument("--in_drop", default=0.6, type=float)
    group.add_argument("--attn_drop", default=0.6, type=float)
    group.add_argument("--residual", default=False, action="store_true")
    group.add_argument("--nhood", default=1, type=float,
                       help="Attention neighborhood radius: k-hop "
                            "reachability mask (1 = standard GAT; inf = "
                            "attention over all node pairs). Reference "
                            "dense-GAT adj_to_bias semantics "
                            "(utils/process.py:15-32, execute_cora.py)")
    group.add_argument("--patience", default=100, type=int)
    group.add_argument("--fused_attention", action="store_true",
                       help="Use the fused Pallas attention kernel "
                            "(SDDMM+softmax+aggregate in one pass); "
                            "falls back to the segment path when attention "
                            "dropout is active or coefficients are captured")
    group.add_argument("--fused_precision", default="highest",
                       choices=["highest", "default"],
                       help="Head-contraction precision of the COO-chunk "
                            "fused kernel: highest = 6-pass f32 (parity), "
                            "default = 1-pass bf16 w/ f32 accumulation "
                            "(~6x fewer MXU FLOPs, ~4e-3 rel err)")
    group.add_argument("--attn_impl", default="auto",
                       choices=["auto", "coo", "gather"],
                       help="At-scale fused-attention payload when the BSR "
                            "budget is exceeded: coo = flash-style COO-chunk "
                            "kernel (no E-sized intermediates), gather = "
                            "edge-major SDDMM + gather-scatter combine "
                            "(also expresses --attn_drop). auto routes to "
                            "gather — it wins fwd and fwd+bwd at every "
                            "measured occupancy (docs/bench_attn_scale.json) "
                            "— unless its E-sized edge streams would exceed "
                            "the HBM budget, where coo takes over")
    group.add_argument("--optimizer", type=str, default="adam")
    group.add_argument("--no_feature_normalize", action="store_true")
    group.add_argument("--best_val_criteria", choices=["val_acc", "val_loss"],
                       default="val_acc")
    group.add_argument("--save_activations", action="store_true")
    group.add_argument("--save_predictions", nargs="+", type=bool, default=True)
    parser.function_hooks["argparse"].append(argparse_callback)


class _StatsPatience:
    """Adapter: the runtime calls controller(val_loss); GAT's controller needs
    the full stats dict, which it reads from args.objects each epoch."""

    def __init__(self, args, inner):
        self.args = args
        self.inner = inner

    def __call__(self, _val_loss):
        return self.inner(self.args.objects["epoch_stats"])


def build_attention_support(dataset, nhood):
    """k-hop self-looped reachability support (reference utils/process.py:
    15-32 adj_to_bias / :122-131 preprocess_adj_bias)."""
    import numpy as _np
    import scipy.sparse as _sp

    if _np.isinf(nhood):
        n = dataset.num_samples
        if n * n > 250_000_000:
            # all-ones attention support is an n^2 materialization (reference
            # adj_to_bias semantics) — refuse past ~1GB instead of silently
            # exhausting host memory on a large graph
            raise ValueError(
                f"--nhood inf builds a dense {n}x{n} all-pairs support "
                f"({n * n:,} entries) — use a finite --nhood at this scale")
        return _sp.csr_matrix(_np.ones((n, n), _np.float32))
    if nhood == 1:
        return transforms.add_eye(dataset.sparse_adj)
    hops = transforms.nhood_split(dataset.sparse_adj, int(nhood))
    return transforms.add_eye(sum(hops[1:]))


# dense-block BSR payload budget: past this the fused attention rides the
# O(nnz) COO-chunk tables instead (benched 18-22x the segment composition
# at 90K nodes; the BSR payload there would be ~32GB)
_BSR_PAYLOAD_BUDGET_BYTES = 256 * 1024 * 1024


# COO-chunk vs gather adjudication (workbench/bench_attn_scale.py /
# docs/bench_attn_scale.json): the gather path wins fwd AND fwd+bwd at
# every measured occupancy — ultra-sparse 6.7-8 nnz per occupied
# (dest,src) 256-pair (25-37× fwd, the chunk kernel runs ~5% edge-slot
# occupancy there) and the dense-chunk 107 nnz/pair regime at 40K/7.7M
# nnz (one-harness re-run r5: fwd 370 vs 504 ms; fwd+bwd 950 vs 1319 ms
# bf16, 1346 vs 1669 f32 — the round-4 'backward fails to compile'
# verdict was a transient relay fault). auto therefore routes
# past-BSR-budget graphs to gather UNLESS its E-sized edge streams would
# exhaust HBM (estimated below) — the chunk kernel holds no E-sized
# intermediates, so it is both the auto fallback at extreme E and always
# reachable via --attn_impl coo.

# HBM budget for the gather payload's live edge streams (v5e has 16GB;
# leave headroom for params/activations/fragmentation)
_GATHER_STREAM_BUDGET_BYTES = 8 * 1024 ** 3


def _gather_stream_bytes(n: int, nnz: int, heads: int = 8,
                         feat_pad: int = 128) -> int:
    """Conservative estimate of the gather payload's resident + peak-live
    HBM bytes (the quantity the COO-chunk kernel avoids by construction).

    Components, per :mod:`..sparse.pallas_attention_gather`:
      * chunk tables in BOTH orientations: rows/vals [slots] + cols [slots]
        (12B/slot) plus slot2edge inverse maps (4B/slot), ×2;
      * edge-major [E, H] f32 streams during fwd+bwd (p, q, q·m, dropout
        mask, α fills — ~6 live at peak) plus the CSR edge list (8B/edge);
      * ONE segment's gathered feature buffer ([seg_slots, feat_pad] f32 —
        segments are sequenced by optimization_barrier so only ~one is
        live), where seg_slots is capped by the gscatter _MAX_STEPS bound.
    Slot count is estimated at ~115% of nnz plus per-stripe filler blocks
    (measured occupancies run 0.87-0.99, docs/bench_attn_scale.json).
    """
    slots = int(nnz * 1.15) + (-(-n // 512)) * 8 * 128
    per_slot = 2 * (12 + 4) + heads * 4 * 2      # tables ×2 + live α fills
    per_edge = heads * 4 * 6 + 8                 # edge-major streams + list
    seg_slots = min(slots, 2048 * 8 * 128)       # _MAX_STEPS·kb·e_b
    gathered = seg_slots * feat_pad * 4
    return slots * per_slot + nnz * per_edge + gathered


def build_gat_adjacency(support, fused_attention: bool,
                        block_size: int = 256, attn_impl: str = "auto"):
    """Fused-path payload selection at construction time.

    Small graphs keep the dense-block BSR (fastest measured kernel at 10K:
    13.3 ms vs 40.1 at 128-blocks); graphs whose BSR payload would exceed
    the budget carry O(nnz) tables instead — the gather payload (edge-major
    SDDMM + gather-scatter combine), which wins fwd and fwd+bwd at every
    measured chunk occupancy; ``attn_impl="coo"`` forces the flash-style
    COO-chunk kernel (no E-sized intermediates). All retain the full COO
    arrays so the segment path runs off the same tensor."""
    import scipy.sparse as _sp

    from ..sparse import SparseMatrix

    if not fused_attention:
        return SparseMatrix.from_scipy(support, backend="segment",
                                       block_size=128)
    coo = _sp.coo_matrix(support)
    ncb = -(-support.shape[1] // block_size)
    pair_keys = ((coo.row // block_size).astype(np.int64) * ncb
                 + coo.col // block_size)
    nb = np.unique(pair_keys).size
    payload = nb * block_size * block_size * 4
    # an EXPLICIT impl choice overrides the BSR budget route (useful for
    # forcing the at-scale payloads on small graphs in tests/benches)
    if attn_impl != "auto" or payload > _BSR_PAYLOAD_BUDGET_BYTES:
        if attn_impl == "auto":
            # gather wins at every measured occupancy, but it materializes
            # E-sized intermediates — when those would exhaust HBM, auto
            # falls back to the COO-chunk kernel (flash-style: no E-sized
            # buffers at all)
            attn_impl = ("coo"
                         if _gather_stream_bytes(support.shape[0], coo.nnz)
                         > _GATHER_STREAM_BUDGET_BYTES else "gather")
        return SparseMatrix.from_scipy(support, backend="attn",
                                       attn_tile=block_size,
                                       attn_impl=attn_impl)
    return SparseMatrix.from_scipy(support, backend="bsr",
                                   block_size=block_size)


def argparse_callback(args):
    dataset = args.objects["dataset"]
    if not args.no_feature_normalize:
        dataset.row_normalize_features()
    tensors = dataset.get_tensors(backend="segment")
    tensors.adj_hops = []
    # attention support replaces the raw adjacency in the tensor dict so it
    # flows into the jitted step as an argument
    support = build_attention_support(dataset, args.nhood)
    tensors.adj = build_gat_adjacency(support, args.fused_attention,
                                      attn_impl=getattr(args, "attn_impl",
                                                        "auto"))
    args.objects["tensors"] = vars(tensors)

    model = GATNetwork(
        dataset.num_labels,
        hid_units=args.hid_units, n_heads=args.n_heads,
        in_drop=args.in_drop, attn_drop=args.attn_drop,
        residual=args.residual, l2_coef=args.l2_coef,
        fused_attention=args.fused_attention,
        fused_precision=args.fused_precision,
    )
    controller = _StatsPatience(args, GATPatienceController(args.patience))
    _runtime.initialize_model(
        args, model, args.optimizer, args.lr, controller,
        seed=getattr(args, "random_seed", None),
    )
