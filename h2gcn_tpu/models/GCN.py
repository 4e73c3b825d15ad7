"""GCN baseline family: GCN / GCN-Cheby / GCN+JK (Concat2) / MLP.

Kipf & Welling GCN semantics (reference: baselines/gcn/gcn/models.py,
layers.py, train.py) expressed on this framework's sparse core and layer
program:

* ``gcn``      — dropout → XW → ÂZ → ReLU, twice (Â = sym_norm(A+I));
  weight decay ``5e-4 · ½‖W₁‖²`` on the FIRST layer only (tf.nn.l2_loss
  halves; reference models.py:176-181).
* ``cheby``    — per-support weights ``Σₖ Tₖ(L̃) Z Wₖ`` via the
  [stack hops → flatten → one wide dense] identity (exactly equal because
  SpMM is linear). ``--cheby_eigenvalue 2`` reproduces the reference's
  fixed-eigenvalue option (baselines/gcn/gcn/utils.py:82-107).
* ``concat2``  — the paper's GCN+JK: Dense→GC→GC, concat of the last three
  activations, dense classifier (reference models.py:208-263).
* ``mlp``      — two dense layers, no aggregation.

Default hyperparameters follow the reference ``train.py`` flags
(hidden1=16, dropout=0.5, lr=0.01, weight_decay=5e-4, epochs=200,
10-epoch mean-window early stopping).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn
from ..nn.dsl import Layer
from ..sparse import transforms
from ..sparse.transforms import NType
from . import _runtime


class BeliefPropagationNetwork:
    """Linearized belief propagation over the graph (runtime interface).

    ``beliefs = softmax(Σ_i S_i · log(X·H_i + ε) + log(X + ε))`` with a
    fixed (non-trainable) class-compatibility matrix H. The reference defines
    this layer (baselines/gcn/gcn/layers.py:196-251) but its model class is
    missing (the latent ImportError at train.py:10) — here it actually runs.
    Use with ``--feature_configs labels`` one-hot label priors.
    """

    def __init__(self, num_classes, h_matrix=None, homophily=None):
        import scipy.linalg

        self.num_classes = num_classes
        if h_matrix is None:
            if homophily is not None:
                off = ((1 - homophily)
                       / max(num_classes - 1, 1))
                h_matrix = (homophily * np.eye(num_classes)
                            + off * (np.ones((num_classes, num_classes))
                                     - np.eye(num_classes)))
            elif num_classes == 5:  # the reference's default circulant
                h_matrix = scipy.linalg.circulant([0, 2 / 6, 1 / 6, 1 / 6, 2 / 6])
            else:
                h_matrix = (np.ones((num_classes, num_classes))
                            - np.eye(num_classes)) / max(num_classes - 1, 1)
        self.h_matrix = jnp.asarray(np.asarray(h_matrix, np.float32))
        self.embedding_ind = None
        self.output_ind = None

    @property
    def num_layers(self):
        return 1

    def init(self, rng, input_dim, num_hops=1):
        assert input_dim == self.num_classes, (
            "BP expects one-hot label priors (--feature_configs labels)")
        return {"dummy": jnp.zeros((1,), jnp.float32)}  # no trainable params

    def apply(self, params, adj, x, adjhops, *, training=False, rng=None,
              capture=None, **kw):
        from ..nn.model import _aggregate

        eps = 1e-7
        message = jnp.log(
            jnp.matmul(x, self.h_matrix,
                       precision=jax.lax.Precision.HIGHEST) + eps
        )
        total = 0.0
        for support in adjhops:
            total = total + _aggregate(support, message)
        belief = total + jnp.log(x + eps)
        out = jax.nn.softmax(belief, axis=-1)
        if capture is not None:
            capture["activations/0-belief_propagation"] = out
        return out

    def get_embeddings(self, params, adj, x, adjhops):
        raise NotImplementedError

    def l2_loss(self, params):
        return jnp.float32(0.0)

    def loss(self, params, logits, labels, mask):
        from ..nn.metrics import masked_softmax_cross_entropy

        return masked_softmax_cross_entropy(logits, labels, mask)


def add_subparser_args(parser):
    group = parser.add_argument_group("GCN Model Arguments (GCN.py)")
    group.add_argument("--variant",
                       choices=["gcn", "cheby", "concat2", "cheby_concat2",
                                "mlp", "bp"],
                       default="gcn")
    group.add_argument("--hidden1", type=int, default=16)
    group.add_argument("--dropout", type=float, default=0.5)
    group.add_argument("--lr", "--learning_rate", type=float, default=0.01,
                       dest="lr")
    group.add_argument("--weight_decay", type=float, default=5e-4)
    group.add_argument("--early_stopping", type=int, default=10)
    group.add_argument("--max_degree", type=int, default=3,
                       help="Chebyshev polynomial order (cheby variant)")
    group.add_argument("--cheby_eigenvalue", type=float, default=2,
                       help="Fixed largest Laplacian eigenvalue. 2 is the "
                            "reference's effective default: its train.py "
                            "dispatch (utils.py:82-107 default) never "
                            "reaches the ARPACK path. Pass a negative "
                            "value to compute it with ARPACK instead.")
    group.add_argument("--bp_homophily", type=float, default=None,
                       help="Class-compatibility homophily for the bp "
                            "variant (None → reference circulant/uniform)")
    group.add_argument("--optimizer", type=str, default="adam")
    group.add_argument("--best_val_criteria", choices=["val_acc", "val_loss"],
                       default="val_acc")
    group.add_argument("--save_activations", action="store_true")
    group.add_argument("--save_predictions", nargs="+", type=bool, default=True)
    group.add_argument("--sparse_backend",
                       choices=["auto", "dense", "bsr", "cootile", "gscatter", "segment"],
                       default="auto")
    group.add_argument("--reorder", choices=["none", "rcm", "cluster"],
                       default="none",
                       help="Tile-clustering node permutation (see H2GCN "
                            "--reorder); layout-only, outputs restored to "
                            "original node order on save")
    parser.function_hooks["argparse"].append(argparse_callback)


def build_layer_setups(variant, hidden, dropout, num_labels):
    """Layer program per variant. ``l2_scale=0.5`` on the first parametric
    layer reproduces the reference's tf.nn.l2_loss-halved first-layer-only
    weight decay."""
    D, M, G, V, R, C = (Layer.DROPOUT, Layer.DENSE, Layer.GCN,
                        Layer.VECTORIZE, Layer.RELU, Layer.CONCAT)

    def dense(units, out=False, l2=0.0, tag=None):
        conf = dict(units=units, use_bias=False, l2_scale=l2)
        if out:
            conf["beginOutput"] = True
        if tag:
            conf["tag"] = tag
        return (M, conf)

    drop = (D, dict(dropout_rate=dropout))
    if variant == "gcn":
        return [
            drop, dense(hidden, l2=0.5), (G, dict(hops=None)), (V, {}), (R, {}),
            drop, dense(num_labels, out=True), (G, dict(hops=None)), (V, {}),
        ]
    if variant == "cheby":
        # spmm-first ordering; the wide dense realizes per-support weights.
        return [
            drop, (G, dict(hops=None)), (V, {}), dense(hidden, l2=0.5), (R, {}),
            drop, (G, dict(hops=None)), (V, {}), dense(num_labels, out=True),
        ]
    if variant == "concat2":
        return [
            drop, dense(hidden, l2=0.5), (R, dict(tag="1")),
            drop, dense(hidden), (G, dict(hops=None)), (V, {}),
            (R, dict(tag="2")),
            drop, dense(hidden), (G, dict(hops=None)), (V, {}),
            (R, dict(tag="3")),
            (C, dict(tags=["1", "2", "3"], addInputs=False)),
            drop, dense(num_labels, out=True),
        ]
    if variant == "cheby_concat2":
        # GCN+JK over Chebyshev supports (reference train.py:91-97 dispatches
        # gcn_cheby_concat_2 = GCNConcat2 fed chebyshev_polynomials). The
        # spmm-first [stack hops → flatten → wide dense] identity realizes the
        # per-support kernels of GraphConvolution, as in the cheby variant.
        return [
            drop, dense(hidden, l2=0.5), (R, dict(tag="1")),
            drop, (G, dict(hops=None)), (V, {}), dense(hidden),
            (R, dict(tag="2")),
            drop, (G, dict(hops=None)), (V, {}), dense(hidden),
            (R, dict(tag="3")),
            (C, dict(tags=["1", "2", "3"], addInputs=False)),
            drop, dense(num_labels, out=True),
        ]
    if variant == "mlp":
        return [
            drop, dense(hidden, l2=0.5), (R, {}),
            drop, dense(num_labels, out=True),
        ]
    raise ValueError(f"unknown GCN variant {variant}")


def _reorder(args):
    r = getattr(args, "reorder", "none")
    return None if r in (None, "none") else r


def argparse_callback(args):
    dataset = args.objects["dataset"]
    if args.variant == "bp":
        # label priors propagate over the RW-normalized adjacency
        supports = [
            transforms.normalize(dataset.sparse_adj, NType.RW_NORMALIZED)
        ]
        tensors = dataset.get_tensors(supports=supports,
                                      backend=args.sparse_backend,
                                      reorder=_reorder(args))
        args.objects["tensors"] = vars(tensors)
        model = BeliefPropagationNetwork(dataset.num_labels,
                                         homophily=args.bp_homophily)
        _runtime.initialize_model(
            args, model, args.optimizer, args.lr, args.early_stopping,
            seed=getattr(args, "random_seed", None),
        )
        return
    dataset.row_normalize_features()
    if args.variant in ("cheby", "cheby_concat2"):
        eig = args.cheby_eigenvalue
        supports = transforms.chebyshev_polynomials(
            dataset.sparse_adj, args.max_degree,
            eigenvalue=(None if eig is not None and eig < 0 else eig),
        )
    elif args.variant == "mlp":
        supports = []
    else:
        supports = [
            transforms.normalize(
                transforms.add_eye(dataset.sparse_adj), NType.SYM_NORMALIZED
            )
        ]
    tensors = dataset.get_tensors(
        supports=supports, backend=args.sparse_backend,
        reorder=_reorder(args),
    )
    args.objects["tensors"] = vars(tensors)

    layer_setups = build_layer_setups(
        args.variant, args.hidden1, args.dropout, dataset.num_labels
    )
    model = nn.NetworkModel(layer_setups,
                            l2_regularize_weight=args.weight_decay)
    _runtime.initialize_model(
        args, model, args.optimizer, args.lr, args.early_stopping,
        seed=getattr(args, "random_seed", None),
    )
