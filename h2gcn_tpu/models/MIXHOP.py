"""MixHop baseline (Abu-El-Haija et al., ICML 2019).

Higher-order mixing: each layer computes ``concat_p(Âᵖ X W_p)`` over a list
of adjacency powers with per-power capacities, followed by batch-norm + a
nonlinearity; the output layer is the paper's "psum" weighted segment sum
with trainable softmax weights. Reference semantics:
baselines/mixhop/mixhop_model.py:17-71 (psum/mixhop_layer),
mixhop_trainer.py:172-214 (``--adj_pows pow:cap1:cap2`` parser) and
:350-360 (SGD with linear LR decrement, val-accuracy patience stopping).

TPU design: the per-power SpMMs reuse one support matrix with incremental
``Âᵖx = Â(Âᵖ⁻¹x)`` chaining, the whole step jits into one XLA program, and
the LR schedule is an optax piecewise-linear schedule (no feed_dict).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..modules.controller import PatienceEarlyStopping
from ..nn.metrics import masked_softmax_cross_entropy
from ..sparse import transforms
from ..sparse.transforms import NType
from ..nn.model import _aggregate, _MATMUL_PRECISION
from . import _runtime


class AdjacencyPowersParser:
    """Parse ``--adj_pows`` like ``"0,1,2"`` or ``"0:20:10,1:10:10"``.

    Reference: baselines/mixhop/mixhop_trainer.py:172-214.
    """

    def __init__(self, spec: str):
        powers = spec.split(",")
        has_colon = None
        self._powers: List[int] = []
        self._ratios: List[List[float]] = []
        for i, p in enumerate(powers):
            if i == 0:
                has_colon = ":" in p
            elif has_colon != (":" in p):
                raise ValueError(
                    "--adj_pows: either all powers or none should include ':'"
                )
            parts = p.split(":")
            self._powers.append(int(parts[0]))
            self._ratios.append(list(map(float, parts[1:])) if has_colon else [1])

    def powers(self) -> List[int]:
        return self._powers

    def output_capacity(self, num_classes: int) -> int:
        if all(len(s) == 1 and s[0] == 1 for s in self._ratios):
            return num_classes * len(self._powers)
        return int(sum(s[-1] for s in self._ratios))

    def divide_capacity(self, layer_index: int, total_dim: int) -> List[int]:
        sizes = [r[min(layer_index, len(r) - 1)] for r in self._ratios]
        per_unit = total_dim / float(np.sum(sizes))
        dims = [int(np.round(s * per_unit)) for s in sizes[:-1]]
        dims.append(total_dim - sum(dims))
        return dims


class MixHopNetwork:
    """Functional MixHop model with the NetworkModel runtime interface."""

    def __init__(self, powers, layer_capacities, num_classes, *,
                 l2reg=5e-4, input_dropout=0.7, layer_dropout=0.9,
                 l2_normalize=True, batch_norm=True, nonlinearity="relu",
                 psum_softmax=True):
        self.powers = list(powers)
        self.layer_capacities = [list(c) for c in layer_capacities]
        self.num_classes = num_classes
        self.l2reg = l2reg
        self.input_dropout = input_dropout
        self.layer_dropout = layer_dropout
        self.l2_normalize = l2_normalize
        self.batch_norm = batch_norm
        self.nonlinearity_name = nonlinearity
        self.nonlinearity = getattr(jax.nn, nonlinearity)
        self.psum_softmax = psum_softmax
        self.embedding_ind = None
        self.output_ind = None

    @property
    def num_layers(self):
        return len(self.layer_capacities)

    def init(self, rng, input_dim: int, num_hops: int = 1):
        params: Dict = {"layers": [], "bn": []}
        dim = input_dim
        for j, caps in enumerate(self.layer_capacities):
            kernels = {}
            for p, cap in zip(self.powers, caps):
                k = jax.random.fold_in(rng, j * 100 + p)
                if cap == 0:
                    # capacity-0 powers are legal in --adj_pows specs (e.g.
                    # the published train_cora.sh uses 0:24:0) — the segment
                    # contributes nothing but must keep its kernel slot
                    kernels[str(p)] = jnp.zeros((dim, 0), jnp.float32)
                else:
                    kernels[str(p)] = jax.nn.initializers.glorot_uniform()(
                        k, (dim, cap), jnp.float32
                    )
            params["layers"].append(kernels)
            dim = sum(caps)
            if self.batch_norm and j != self.num_layers - 1:
                params["bn"].append({"beta": jnp.zeros((dim,), jnp.float32)})
            else:
                params["bn"].append({})
        if self.psum_softmax:
            n_segments = dim // self.num_classes
            params["psum_q"] = jnp.zeros((n_segments,), jnp.float32)
        return params

    def _powers_apply(self, adj, x, kernels):
        total_cap = sum(int(kernels[str(p)].shape[1]) for p in self.powers)
        width = int(x.shape[1])
        if width > 4 * max(total_cap, 1):
            # Project-first: Âᵖ(x)·W_p ≡ Âᵖ(x·W_p) (SpMM is linear), and
            # aggregating at the per-power capacity (~tens of columns)
            # instead of the raw feature width (thousands on planetoid)
            # shrinks the aggregation FLOPs by width/cap even though the
            # Âᵖx chain can no longer be shared across powers.
            outs = []
            for p in self.powers:
                cur = jnp.matmul(x, kernels[str(p)],
                                 precision=_MATMUL_PRECISION)
                for _ in range(p):
                    cur = _aggregate(adj, cur)
                outs.append(cur)
            return jnp.concatenate(outs, axis=1)
        # Incremental Âᵖx chaining: sort powers, reuse previous product.
        outs = {}
        cur = x
        cur_pow = 0
        for p in sorted(set(self.powers)):
            while cur_pow < p:
                cur = _aggregate(adj, cur)
                cur_pow += 1
            outs[p] = cur
        return jnp.concatenate(
            [
                jnp.matmul(outs[p], kernels[str(p)],
                           precision=_MATMUL_PRECISION)
                for p in self.powers
            ],
            axis=1,
        )

    def apply(self, params, adj, x, adjhops, *, training=False, rng=None,
              capture=None, **kw):
        from ..nn.ops import dropout as _dropout

        support = adjhops[0] if adjhops else adj

        def dropout(v, rate, salt):
            return _dropout(v, rate, rng, salt, training=training)

        h = dropout(x, self.input_dropout, 0)
        if self.l2_normalize:
            h = h / jnp.maximum(
                jnp.linalg.norm(h, axis=1, keepdims=True), 1e-12
            )
        if capture is not None:
            capture["inputs/inputs"] = x

        for j, kernels in enumerate(params["layers"]):
            if j != 0:
                h = dropout(h, self.layer_dropout, j + 1)
            h = self._powers_apply(support, h, kernels)
            if j != self.num_layers - 1:
                if self.batch_norm:
                    mean = jnp.mean(h, axis=0, keepdims=True)
                    var = jnp.var(h, axis=0, keepdims=True)
                    h = (h - mean) * jax.lax.rsqrt(var + 1e-3)
                    h = h + params["bn"][j]["beta"]
                h = self.nonlinearity(h)
            if capture is not None:
                capture[f"activations/{j}-mixhop"] = h

        if self.psum_softmax:
            q = jax.nn.softmax(params["psum_q"])
            n_seg = params["psum_q"].shape[0]
            segs = [
                h[:, i * self.num_classes:(i + 1) * self.num_classes] * q[i]
                for i in range(n_seg)
            ]
            h = sum(segs)
        else:
            n_seg = h.shape[1] // self.num_classes
            h = sum(
                h[:, i * self.num_classes:(i + 1) * self.num_classes]
                for i in range(n_seg)
            )
        if capture is not None:
            capture["activations/output-psum"] = h
        return h

    def get_embeddings(self, params, adj, x, adjhops):
        raise NotImplementedError("MixHop has no embedding marker")

    def l2_loss(self, params):
        total = 0.0
        for kernels in params["layers"]:
            for w in kernels.values():
                total = total + jnp.sum(jnp.square(w))
        total = self.l2reg * total
        if self.psum_softmax:
            # reference adds mean(q²)·1e-3 (mixhop_model.py:23-25)
            total = total + 1e-3 * jnp.mean(jnp.square(params["psum_q"]))
        return total

    def loss(self, params, logits, labels, mask):
        return masked_softmax_cross_entropy(logits, labels, mask) + self.l2_loss(
            params
        )


def save_architecture(model: "MixHopNetwork", path):
    """Persist the architecture as JSON (reference
    mixhop_model.py:118-128 save/load_architecture_to_file)."""
    import json

    spec = dict(
        powers=model.powers,
        capacities=model.layer_capacities,
        num_classes=model.num_classes,
        l2reg=model.l2reg,
        input_dropout=model.input_dropout,
        layer_dropout=model.layer_dropout,
        l2_normalize=model.l2_normalize,
        batch_norm=model.batch_norm,
        nonlinearity=model.nonlinearity_name,
        psum_softmax=model.psum_softmax,
    )
    with open(path, "w") as f:
        json.dump(spec, f, indent=2)
    return path


def load_architecture(path, num_classes=None) -> "MixHopNetwork":
    import json

    with open(path) as f:
        spec = json.load(f)
    return MixHopNetwork(
        spec["powers"], spec["capacities"],
        num_classes if num_classes is not None else spec["num_classes"],
        l2reg=spec.get("l2reg", 5e-4),
        input_dropout=spec.get("input_dropout", 0.7),
        layer_dropout=spec.get("layer_dropout", 0.9),
        l2_normalize=spec.get("l2_normalize", True),
        batch_norm=spec.get("batch_norm", True),
        nonlinearity=spec.get("nonlinearity", "relu"),
        psum_softmax=spec.get("psum_softmax", True),
    )


def add_subparser_args(parser):
    group = parser.add_argument_group("MixHop Model Arguments (MIXHOP.py)")
    group.add_argument("--architecture", type=str, default="",
                       help="Path to a model-architecture JSON; overrides "
                            "the architecture flags")
    group.add_argument("--hidden_dims_csv", type=str, default="60")
    group.add_argument("--adj_pows", type=str, default="1")
    group.add_argument("--nonlinearity", type=str, default="relu")
    group.add_argument("--l2reg", type=float, default=5e-4)
    group.add_argument("--input_dropout", type=float, default=0.7)
    group.add_argument("--layer_dropout", type=float, default=0.9)
    group.add_argument("--learn_rate", type=float, default=0.5)
    group.add_argument("--lr_decrement_ratio_of_initial", type=float,
                       default=0.01)
    group.add_argument("--lr_decrement_every", type=int, default=40)
    group.add_argument("--early_stop_steps", type=int, default=50)
    group.add_argument("--optimizer", type=str, default="sgd")
    group.add_argument("--partition", choices=["mixhop", "planetoid"],
                       default="mixhop",
                       help="'mixhop' (default) trains on every node outside "
                            "the val window + test set, as the reference "
                            "trainer does (mixhop_dataset.py:184-194); "
                            "'planetoid' keeps the dataset's stored masks")
    group.add_argument("--no_l2_normalization", action="store_true")
    group.add_argument("--no_batch_normalization", action="store_true")
    group.add_argument("--no_psum_output", action="store_true")
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


def argparse_callback(args):
    dataset = args.objects["dataset"]
    if getattr(args, "partition", "mixhop") == "mixhop" and hasattr(
            dataset, "set_mixhop_partition"):
        # the reference trainer's split: train on everything outside the
        # val window and the stored test set (mixhop_dataset.py:184-194)
        dataset.set_mixhop_partition(getattr(args, "val_size", 500) or 500)
    # MixHop support: self-looped, symmetrically normalized adjacency
    # (reference mixhop_dataset.py:24-118).
    support = transforms.normalize(
        transforms.add_eye(dataset.sparse_adj), NType.SYM_NORMALIZED
    )
    tensors = dataset.get_tensors(
        supports=[support], backend=args.sparse_backend,
        reorder=(None if getattr(args, "reorder", "none") == "none"
                 else args.reorder))
    args.objects["tensors"] = vars(tensors)

    if args.architecture:
        model = load_architecture(args.architecture,
                                  num_classes=dataset.num_labels)
    else:
        parser = AdjacencyPowersParser(args.adj_pows)
        layer_dims = [int(d) for d in args.hidden_dims_csv.split(",")]
        layer_dims.append(parser.output_capacity(dataset.num_labels))
        capacities = [parser.divide_capacity(j, d)
                      for j, d in enumerate(layer_dims)]
        model = MixHopNetwork(
            parser.powers(), capacities, dataset.num_labels,
            l2reg=args.l2reg,
            input_dropout=args.input_dropout,
            layer_dropout=args.layer_dropout,
            l2_normalize=not args.no_l2_normalization,
            batch_norm=not args.no_batch_normalization,
            nonlinearity=args.nonlinearity,
            psum_softmax=not args.no_psum_output,
        )

    # linear LR decrement every k steps by ratio·lr0, floored at 0
    lr0 = args.learn_rate
    dec = args.lr_decrement_ratio_of_initial * lr0

    def schedule(count):
        return jnp.maximum(lr0 - dec * (count // args.lr_decrement_every), 0.0)

    if args.optimizer == "sgd":
        tx = optax.sgd(schedule)
    elif args.optimizer == "momentum":
        tx = optax.sgd(schedule, momentum=0.7, nesterov=True)
    else:
        tx = _runtime.get_optimizer(args.optimizer, lr0)

    _runtime.initialize_model(
        args, model, tx, lr0,
        PatienceEarlyStopping(args.early_stop_steps, mode="max"),
        seed=getattr(args, "random_seed", None),
        es_metric="val_acc",
    )

    def save_arch_callback(**kwargs):
        from pathlib import Path

        path = Path(args.objects["checkpoint_dir"]) / "architecture.json"
        save_architecture(model, path)
        print(f"===> MixHop architecture saved to {path}")

    args.objects["pretrain_callbacks"].append(save_arch_callback)
