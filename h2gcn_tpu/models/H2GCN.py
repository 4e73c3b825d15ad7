"""H2GCN model plugin (Zhu et al., NeurIPS 2020 — Beyond Homophily).

Design identifiers of H2GCN (all expressed through the layer DSL, default
``M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO`` = H2GCN-2):
  (D1) ego / neighbor embedding separation — the aggregation operates on the
       self-loop-free adjacency, the ego embedding re-enters via the tag
       concats;
  (D2) higher-order neighborhoods — exact-1-hop and exact-2-hop adjacencies,
       each symmetrically normalized;
  (D3) jumping-knowledge combination of all intermediate representations.

CLI contract and defaults match the reference plugin
(h2gcn/models/H2GCN.py:9-43).
"""

from .. import nn
from ..nn.dsl import Layer
from ..sparse.transforms import NType
from . import _runtime


def add_subparser_args(parser):
    group = parser.add_argument_group("H2GCN Model Arguments (H2GCN.py)")
    group.add_argument("--network_setup", type=str,
                       default="M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO",
                       help="Default to H2GCN-2 (%(default)s)")
    group.add_argument("--dropout", type=float, default=0.5,
                       help="Default dropout rate")
    group.add_argument("--hidden", type=int, default=64)
    group.add_argument("--adj_nhood", default=["1", "2"], type=str, nargs="+")
    group.add_argument("--optimizer", type=str, default="adam",
                       help="(default: %(default)s)")
    group.add_argument("--lr", type=float, default=0.01,
                       help="(default: %(default)s)")
    group.add_argument("--l2_regularize_weight", type=float, default=5e-4,
                       help="(default: %(default)s)")
    group.add_argument("--early_stopping", type=int, default=0,
                       help="Epoch window for sliding-mean early stopping "
                            "(0 disables) (default: %(default)s)")
    group.add_argument("--best_val_criteria", choices=["val_acc", "val_loss"],
                       default="val_acc")
    group.add_argument("--save_activations", action="store_true")
    group.add_argument("--save_predictions", nargs="+", type=bool, default=True)
    group.add_argument("--no_feature_normalize", action="store_true")
    group.add_argument("--adj_norm_type",
                       choices=[t.name for t in NType],
                       default="SYM_NORMALIZED")
    group.add_argument("--sparse_backend",
                       choices=["auto", "dense", "bsr", "cootile", "gscatter", "segment"],
                       default="auto",
                       help="SpMM execution backend for the hop matrices")
    group.add_argument("--sparse_features", action="store_true",
                       help="Keep X sparse on device (SparseDense path) — "
                            "required for identity features at scale")
    group.add_argument("--precompute_workers", type=int, default=1,
                       help="Row-shard the exact-hop spgemm precompute over "
                            "N worker processes (>1 = distributed path)")
    group.add_argument("--reorder", choices=["none", "rcm", "cluster"],
                       default="none",
                       help="Tile-clustering node permutation applied to all "
                            "exported tensors (cuts BSR/COO-tile HBM traffic "
                            "on large graphs); outputs are mapped back to "
                            "original node order on save")
    parser.function_hooks["argparse"].append(argparse_callback)


def argparse_callback(args):
    dataset = args.objects["dataset"]
    layer_setups = nn.parse_network_setup(
        args.network_setup, dataset.num_labels,
        _dense_units=args.hidden, _dropout_rate=args.dropout,
    )
    layer_types = set(x[0] for x in layer_setups)
    preprocessing_data(args, normalized_hops=Layer.GCN in layer_types)
    model = nn.NetworkModel(
        layer_setups, l2_regularize_weight=args.l2_regularize_weight
    )
    _runtime.initialize_model(
        args, model, args.optimizer, args.lr, args.early_stopping,
        seed=getattr(args, "random_seed", None),
    )


def preprocessing_data(args, normalized_hops=True):
    """Row-normalize features (unless disabled), drop self loops, and build
    the exact-hop adjacency tensors (reference H2GCN.py:46-54)."""
    dataset = args.objects["dataset"]
    if not args.no_feature_normalize:
        dataset.row_normalize_features()
    dataset.adj_remove_eye()
    kwargs = dict(
        norm_type=NType[args.adj_norm_type], backend=args.sparse_backend,
        sparse_features=getattr(args, "sparse_features", False),
        precompute_workers=getattr(args, "precompute_workers", 1),
        reorder=(None if getattr(args, "reorder", "none") == "none"
                 else args.reorder),
    )
    if normalized_hops:
        tensors = dataset.get_tensors(get_adj_norm_hops=args.adj_nhood, **kwargs)
    else:
        tensors = dataset.get_tensors(get_adj_hops=args.adj_nhood, **kwargs)
    args.objects["tensors"] = vars(tensors)
