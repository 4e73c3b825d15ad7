"""GraphSAGE baseline (Hamilton et al. 2017), supervised, mean aggregator.

Reference semantics (baselines/graphsage-simple/graphsage/):
  * MeanAggregator — uniform sampling of ``num_sample`` neighbors WITHOUT
    replacement (all neighbors when degree < k), mean of their embeddings
    (aggregators.py:30-64);
  * Encoder — ``ReLU(W · concat(self, neigh))`` (encoders.py:34-52), two
    stacked encoders, hidden 128;
  * SupervisedGraphSage — linear scorer, CE loss over a 256-node train
    minibatch per step, SGD lr 0.7 (model.py:63-162);
  * Concat (+JK) variant — classifier over ``concat(enc1, enc2)``
    (model.py:24-41).

TPU design: neighbor lists live in a padded ELL table ``[N, Dmax]``; per-node
without-replacement sampling is a ``top_k`` over PRNG scores (exactly uniform,
fully inside jit, no host RNG); each layer aggregates full-graph so the whole
step is one XLA program. The reference's per-batch Python sampling loops
(aggregators.py:38-44) have no jit equivalent — this is the idiomatic
replacement flagged in SURVEY.md §7 "hard parts".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..nn.metrics import masked_softmax_cross_entropy
from . import _runtime


@struct.dataclass
class ELLGraph:
    """Padded ELL neighbor table — flows through jitted steps as an argument
    (not a model-held constant) via the ``adj`` tensor slot.

    ``mean_adj`` / ``mean_adj_gcn`` are optional row-normalized sparse
    matrices (``D⁻¹A`` / ``D'⁻¹(A+I)``) carrying the FULL-NEIGHBOR mean
    through the SpMM ladder: on skewed graphs the ELL formulation of
    full-neighbor aggregation materializes an [N·Dmax, F] gather (256GB
    at 120K/dmax=4165 — measured infeasible, docs/bench_graphsage.json),
    while the same mean as ``D⁻¹A·x`` is one SpMM at any scale."""

    table: jax.Array  # [N, Dmax] int32 neighbor ids
    valid: jax.Array  # [N, Dmax] bool
    nnz: int = struct.field(pytree_node=False)
    mean_adj: object = None        # SparseMatrix D⁻¹A or None
    mean_adj_gcn: object = None    # SparseMatrix D'⁻¹(A+I) or None

    @property
    def shape(self):
        n = self.table.shape[0]
        return (n, n)

    def to_scipy(self):
        import scipy.sparse as sp

        t = np.asarray(self.table)
        v = np.asarray(self.valid)
        rows = np.repeat(np.arange(t.shape[0]), t.shape[1])[v.ravel()]
        cols = t.ravel()[v.ravel()]
        return sp.csr_matrix(
            (np.ones(rows.size, np.float32), (rows, cols)), shape=self.shape
        )


def build_neighbor_table(adj_csr):
    """Padded ELL neighbor table [N, Dmax] + validity mask from CSR
    (native C++ builder when available)."""
    from ..native import build_ell

    table, valid = build_ell(adj_csr)
    return jnp.asarray(table), jnp.asarray(valid)


class GraphSAGENetwork:
    """Two-layer supervised GraphSAGE with the runtime model interface.

    The neighbor table arrives per call as the ``adj`` argument
    (:class:`ELLGraph`) so large tables are jit arguments, not constants.
    """

    def __init__(self, num_classes, *, hid_units=128,
                 num_samples=(5, 5), concat_jk=False, gcn_aggregator=False,
                 gcn_encoder=False):
        self.num_classes = num_classes
        self.hid_units = hid_units
        self.num_samples = list(num_samples)
        self.concat_jk = concat_jk
        self.gcn_aggregator = gcn_aggregator
        self.gcn_encoder = gcn_encoder
        self.embedding_ind = None
        self.output_ind = None

    @property
    def num_layers(self):
        return 3

    def init(self, rng, input_dim: int, num_hops: int = 1):
        glorot = jax.nn.initializers.glorot_uniform()
        mult = 1 if self.gcn_encoder else 2
        dims1 = (mult * input_dim, self.hid_units)
        dims2 = (mult * self.hid_units, self.hid_units)
        out_in = self.hid_units * (2 if self.concat_jk else 1)
        return {
            "W1": glorot(jax.random.fold_in(rng, 0), dims1, jnp.float32),
            "W2": glorot(jax.random.fold_in(rng, 1), dims2, jnp.float32),
            "Wout": glorot(jax.random.fold_in(rng, 2),
                           (out_in, self.num_classes), jnp.float32),
        }

    # ---------------------------------------------------------------- layers
    def _sampled_mean(self, ell, feats, key, num_sample):
        """Mean of ≤``num_sample`` uniformly-sampled (w/o replacement)
        neighbors per node; nodes with fewer neighbors use all of them.
        Full-neighbor mode (``num_sample`` ≤ 0 / ≥ dmax) rides the SpMM
        ladder when the row-normalized matrix is attached — identical
        math (``D⁻¹A·x``; zero-degree rows → 0 both ways) without the
        [N·Dmax, F] ELL gather that explodes on skewed graphs."""
        eff_dmax = ell.table.shape[1] + (1 if self.gcn_aggregator else 0)
        full = num_sample is None or num_sample <= 0 \
            or num_sample >= eff_dmax
        madj = ell.mean_adj_gcn if self.gcn_aggregator else ell.mean_adj
        if full and madj is not None:
            from ..sparse.matrix import spmm

            return spmm(madj, feats)
        table, valid = ell.table, ell.valid
        if self.gcn_aggregator:
            self_col = jnp.arange(table.shape[0], dtype=table.dtype)[:, None]
            table = jnp.concatenate([table, self_col], axis=1)
            valid = jnp.concatenate(
                [valid, jnp.ones((table.shape[0], 1), bool)], axis=1
            )
        dmax = table.shape[1]
        if num_sample is None or num_sample <= 0 or num_sample >= dmax:
            sel, sel_valid = table, valid  # full-neighbor mean
        else:
            scores = jax.random.uniform(key, table.shape)
            scores = jnp.where(valid, scores, -jnp.inf)
            top_scores, top_idx = jax.lax.top_k(scores, num_sample)
            sel = jnp.take_along_axis(table, top_idx, axis=1)
            sel_valid = jnp.isfinite(top_scores)
        gathered = feats[sel] * sel_valid[..., None].astype(feats.dtype)
        count = jnp.maximum(sel_valid.sum(axis=1, keepdims=True), 1)
        return gathered.sum(axis=1) / count.astype(feats.dtype)

    def _encode(self, ell, w, feats, key, num_sample):
        neigh = self._sampled_mean(ell, feats, key, num_sample)
        combined = neigh if self.gcn_encoder else jnp.concatenate(
            [feats, neigh], axis=1
        )
        return jax.nn.relu(
            jnp.matmul(combined, w, precision=jax.lax.Precision.HIGHEST)
        )

    # ----------------------------------------------------------------- apply
    def apply(self, params, adj, x, adjhops, *, training=False, rng=None,
              capture=None, **kw):
        # The reference samples in BOTH train and eval; eval here uses a
        # fixed key so model selection is deterministic.
        key = rng if rng is not None else jax.random.PRNGKey(0)
        h1 = self._encode(adj, params["W1"], x, jax.random.fold_in(key, 0),
                          self.num_samples[0])
        h2 = self._encode(adj, params["W2"], h1, jax.random.fold_in(key, 1),
                          self.num_samples[1])
        if capture is not None:
            capture["activations/0-enc1"] = h1
            capture["activations/1-enc2"] = h2
        embeds = jnp.concatenate([h1, h2], axis=1) if self.concat_jk else h2
        return jnp.matmul(embeds, params["Wout"],
                          precision=jax.lax.Precision.HIGHEST)

    def get_embeddings(self, params, adj, x, adjhops):
        key = jax.random.PRNGKey(0)
        return self._encode(adj, params["W1"], x, key, self.num_samples[0])

    def l2_loss(self, params):
        return jnp.float32(0.0)  # reference uses no weight decay

    def loss(self, params, logits, labels, mask):
        return masked_softmax_cross_entropy(logits, labels, mask)


def add_subparser_args(parser):
    group = parser.add_argument_group("GraphSAGE Model Arguments (GRAPHSAGE.py)")
    group.add_argument("--batch_size", default=256, type=int)
    group.add_argument("--lr", "--learning_rate", default=0.7, type=float)
    group.add_argument("--hid_units", default=128, type=int)
    group.add_argument("--num_samples", nargs="+", default=[5, 5], type=int,
                       help="Neighbor sample fan-out per layer; 0 or "
                            "negative = all neighbors (full-neighbor mode)")
    group.add_argument("--gcn_encoder", action="store_true")
    group.add_argument("--gcn_aggregator", action="store_true")
    group.add_argument("--model_class", choices=[
        "SupervisedGraphSage", "SupervisedGraphSageConcat"],
        default="SupervisedGraphSage")
    group.add_argument("--optimizer", type=str, default="sgd")
    group.add_argument("--early_stopping", type=int, default=0)
    group.add_argument("--best_val_criteria", choices=["val_acc", "val_loss"],
                       default="val_acc")
    group.add_argument("--save_activations", action="store_true")
    group.add_argument("--save_predictions", nargs="+", type=bool, default=True)
    parser.function_hooks["argparse"].append(argparse_callback)


def build_mean_adjacencies(adj_csr, *, gcn: bool, backend: str = "auto"):
    """Row-normalized full-neighbor mean operators for :class:`ELLGraph`
    (``D⁻¹A`` and, for the GCN aggregator, ``D'⁻¹(A+I)``) on the shared
    SpMM ladder. Zero-degree rows stay all-zero (mean of nothing = 0,
    matching the ELL path's max(count, 1) guard)."""
    import scipy.sparse as sp

    from ..sparse import SparseMatrix

    a = sp.csr_matrix(adj_csr).astype(np.float32)
    if gcn:
        a = a + sp.eye(a.shape[0], format="csr", dtype=np.float32)
    deg = np.asarray(a.sum(axis=1)).ravel()
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    return SparseMatrix.from_scipy(
        sp.diags(inv) @ a, backend=backend)


def argparse_callback(args):
    dataset = args.objects["dataset"]
    tensors = dataset.get_tensors(backend="segment")
    tensors.adj_hops = []
    # the ELL neighbor table rides the adj tensor slot into the jitted steps
    table, valid = build_neighbor_table(dataset.sparse_adj.tocsr())
    # full-neighbor fan-outs (0) aggregate through the SpMM ladder — the
    # ELL gather for full neighborhoods explodes on skewed graphs
    mean_adj = mean_adj_gcn = None
    if any(s <= 0 for s in args.num_samples):
        mean_adj = build_mean_adjacencies(
            dataset.sparse_adj, gcn=False)
        if args.gcn_aggregator:
            mean_adj_gcn = build_mean_adjacencies(
                dataset.sparse_adj, gcn=True)
    tensors.adj = ELLGraph(table=table, valid=valid,
                           mean_adj=mean_adj, mean_adj_gcn=mean_adj_gcn,
                           nnz=int(dataset.sparse_adj.nnz))
    args.objects["tensors"] = vars(tensors)

    model = GraphSAGENetwork(
        dataset.num_labels,
        hid_units=args.hid_units,
        num_samples=args.num_samples,
        concat_jk=(args.model_class == "SupervisedGraphSageConcat"),
        gcn_aggregator=args.gcn_aggregator,
        gcn_encoder=args.gcn_encoder,
    )
    _runtime.initialize_model(
        args, model, args.optimizer, args.lr, args.early_stopping,
        seed=getattr(args, "random_seed", None),
    )

    # Minibatch semantics: each epoch trains on a random subset of
    # ``batch_size`` train nodes (reference model.py:130-137) — implemented by
    # re-masking before every epoch (same shapes → no recompilation).
    full_train_mask = np.asarray(tensors.train_mask).astype(bool)
    train_idx = np.where(full_train_mask)[0]
    if args.batch_size and args.batch_size < len(train_idx):
        batch_rng = np.random.RandomState(getattr(args, "random_seed", 123) or 123)

        def subsample_batch(epoch, args):
            pick = batch_rng.choice(train_idx, args.batch_size, replace=False)
            mask = np.zeros_like(full_train_mask)
            mask[pick] = True
            t = args.objects["tensors"]
            t["train_mask"] = jnp.asarray(mask.astype(np.float32))
            y = np.zeros_like(np.asarray(t["y_all"]))
            y[mask] = np.asarray(t["y_all"])[mask]
            t["y_train"] = jnp.asarray(y)

        args.objects["pre_epoch_callbacks"].append(subsample_batch)