"""Shared training runtime for DSL-based models.

Builds the fully-jitted train/eval step functions for a
:class:`~h2gcn_tpu.nn.model.NetworkModel` and wires the reference's
callback-based epoch protocol (step closures in ``args.objects``, post-epoch
checkpoint/early-stop/best-val bookkeeping, post-train best restore +
results.json). Reference behavior: h2gcn/models/H2GCN.py:57-206.

TPU-first differences from the reference:
  * the entire train step — forward, masked loss + L2, backward, Adam — is
    ONE compiled XLA program, and the eval step another (the reference runs
    every layer eagerly, reference run_experiments.py:5);
  * "checkpoint every epoch" becomes "keep the best (params, opt_state)
    pytree in device memory" by default — functionally identical to the
    reference's save-every/restore-best cycle at zero IO cost; pass
    ``--ckpt_every_epoch`` for on-disk snapshots of every epoch.
"""

from __future__ import annotations

import functools
import json
import operator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..modules import controller, logger, monitor
from ..nn.metrics import masked_accuracy, masked_softmax_cross_entropy

def _keras_adam(lr: float, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-7) -> optax.GradientTransformation:
    """Adam with keras's exact update rule.

    keras folds the bias corrections into the step size —
    ``alpha_t = lr*sqrt(1-b2^t)/(1-b1^t); p -= alpha_t * m/(sqrt(v)+eps)``
    — so its epsilon meets the UNCORRECTED ``sqrt(v)`` (effectively
    ``eps/sqrt(1-b2^t)`` against the corrected one: ~30x optax's at step 1,
    decaying toward eps). ``optax.adam`` corrects m and v first and adds
    eps after; the difference shifts per-step losses ~4e-4/step vs the
    executed reference (tests/test_golden_reference.py dynamics golden).
    Reference: models/H2GCN.py:62-74 via tf-keras Adam.update_step.
    """

    def init(params):
        z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"count": jnp.zeros((), jnp.int32), "m": z(), "v": z()}

    def update(grads, state, params=None):
        del params
        count = state["count"] + 1
        t = count.astype(jnp.float32)
        alpha = lr * jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        m = jax.tree_util.tree_map(
            lambda mm, g: b1 * mm + (1.0 - b1) * g, state["m"], grads)
        v = jax.tree_util.tree_map(
            lambda vv, g: b2 * vv + (1.0 - b2) * g * g, state["v"], grads)
        updates = jax.tree_util.tree_map(
            lambda mm, vv: -alpha * mm / (jnp.sqrt(vv) + eps), m, v)
        return updates, {"count": count, "m": m, "v": v}

    return optax.GradientTransformation(init, update)


# keras parity: epsilon=1e-7 (optax default is 1e-8), and for adam the
# keras update rule itself (see _keras_adam) — so training trajectories
# match the executed reference step-for-step.
_OPTIMIZERS = {
    "adam": _keras_adam,
    "sgd": lambda lr: optax.sgd(lr),
    "rmsprop": lambda lr: optax.rmsprop(lr, eps=1e-7),
    "adagrad": lambda lr: optax.adagrad(lr, eps=1e-7),
}


def _original_order_fn(node_perm):
    """Map per-node arrays back to original node order for export.

    ``--reorder`` trains in tile-clustered node order (datasets
    ``get_tensors(reorder=...)``); anything persisted to the run store must
    be indexed by original node ids, so invert the permutation on the node
    axis. No-op when no reordering is active.
    """
    if node_perm is None:
        return lambda a: np.asarray(a)
    inv = np.argsort(np.asarray(node_perm))

    def unperm(a):
        a = np.asarray(a)
        return a[inv] if a.shape[:1] == (inv.shape[0],) else a

    return unperm


def get_optimizer(name: str, lr: float):
    try:
        return _OPTIMIZERS[name.lower()](lr)
    except KeyError:
        raise ValueError(
            f"Unknown optimizer {name!r}; choose from {sorted(_OPTIMIZERS)}"
        )


def update_best_val_stats(args, epoch_stats, epoch, ckpt=None) -> bool:
    """Apply the best-val-criteria comparison and update the best record.

    Single source of truth for model selection (ties → later epoch, like
    the reference H2GCN.py:158-171); used by both the per-epoch protocol and
    the blocked loop.
    """
    op = operator.ge if args.best_val_criteria == "val_acc" else operator.le
    best = args.objects["best_val_stats"]
    if best is None or op(
        float(epoch_stats[args.best_val_criteria]),
        float(best[args.best_val_criteria]),
    ):
        new_best = dict(epoch_stats)
        new_best["epoch"] = epoch
        new_best["ckpt"] = ckpt
        args.objects["best_val_stats"] = new_best
        return True
    return False


def initialize_model(args, model, optimizer_name, lr, early_stopping,
                     seed=None, es_metric="val_loss"):
    """Build params/optimizer and register step fns + callbacks in args.objects.

    ``optimizer_name`` may be a name string or a ready optax transformation;
    ``early_stopping`` an int window (SlidingMean on ``es_metric``) or a
    controller instance.
    """
    tensors = args.objects["tensors"]
    dataset = args.objects["dataset"]
    adj_hops = tensors.get("adj_hops", [])
    num_hops = (len(adj_hops) if isinstance(adj_hops, (list, tuple))
                else adj_hops.shape[1]) or 1
    seed = seed if seed is not None else getattr(args, "random_seed", 123) or 123

    params = model.init(
        jax.random.PRNGKey(seed), dataset.feature_dim, num_hops
    )
    if isinstance(optimizer_name, str):
        tx = get_optimizer(optimizer_name, lr)
    else:
        tx = optimizer_name
    opt_state = tx.init(params)

    mesh_shards = getattr(args, "_mesh_shards", 0) or 0
    if mesh_shards > 1:
        return _initialize_distributed(
            args, model, tx, params, opt_state, early_stopping, seed,
            es_metric, mesh_shards,
        )

    @jax.jit
    def _train(params, opt_state, rng, adj, adj_hops, features, y_train,
               train_mask):
        def loss_fn(p):
            logits = model.apply(
                p, adj, features, adj_hops, training=True, rng=rng
            )
            return model.loss(p, logits, y_train, train_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss, grads

    @jax.jit
    def _eval(params, adj, adj_hops, features, y_train, train_mask, y_val,
              val_mask, y_test, test_mask):
        logits = model.apply(params, adj, features, adj_hops, training=False)
        return logits, dict(
            train_acc=masked_accuracy(logits, y_train, train_mask),
            val_acc=masked_accuracy(logits, y_val, val_mask),
            test_accuracy=masked_accuracy(logits, y_test, test_mask),
            val_loss=model.loss(params, logits, y_val, val_mask),
            test_loss=masked_softmax_cross_entropy(logits, y_test, test_mask),
        )

    state = {"params": params, "opt_state": opt_state}
    args.objects["state"] = state
    args.objects["model"] = model
    args.objects["optimizer"] = tx
    rng_base = jax.random.PRNGKey(seed + 1)

    def train_step(adj, adj_hops, features, y_train, train_mask, **kwargs):
        st = args.objects["state"]
        rng = jax.random.fold_in(rng_base, args.current_epoch)
        new_params, new_opt_state, loss, grads = _train(
            st["params"], st["opt_state"], rng, adj, adj_hops, features,
            y_train, train_mask,
        )
        if args.grad_monitor:
            monitor.grad_monitor(st["params"], grads)
        args.objects["state"] = {"params": new_params, "opt_state": new_opt_state}
        return dict(train_loss=loss)

    def test_step(adj, adj_hops, features, y_train, train_mask, y_val,
                  val_mask, y_test, test_mask, verbose=None,
                  save_activations=False, save_predictions=False, **kwargs):
        if verbose is None:
            verbose = args.verbose
        st = args.objects["state"]
        logits, stats = _eval(
            st["params"], adj, adj_hops, features, y_train, train_mask,
            y_val, val_mask, y_test, test_mask,
        )
        stats = dict(stats)
        stats["monitor"] = dict()

        if args.use_signac:
            job = args.objects["signac_job"]
            unperm = _original_order_fn(kwargs.get("node_perm"))
            if save_activations:
                print("Saving activations to job data storage:")
                capture = {}
                model.apply(st["params"], adj, features, adj_hops,
                            training=False, capture=capture)
                for key, value in capture.items():
                    job.data[key] = unperm(value)
                print(job.workspace())
            if save_predictions:
                job.data["predicted_prob"] = unperm(logits)
                for scope, scope_mask in (
                    ("train", train_mask), ("val", val_mask), ("test", test_mask)
                ):
                    job.data[f"{scope}_mask"] = unperm(scope_mask)

        if args.deg_acc_monitor and verbose:
            for scope, y_scope, scope_mask in (
                ("train", y_train, train_mask),
                ("val", y_val, val_mask),
                ("test", y_test, test_mask),
            ):
                monitor.deg_acc_monitor(args, args.deg_acc_monitor, adj, logits,
                                        y_scope, scope_mask, scope,
                                        stats["monitor"])
        return stats

    def predict_step(adj, adj_hops, features, **kwargs):
        st = args.objects["state"]
        return model.apply(st["params"], adj, features, adj_hops, training=False)

    def embed_step(adj, adj_hops, features, **kwargs):
        st = args.objects["state"]
        return model.get_embeddings(st["params"], adj, features, adj_hops)

    def attn_step(adj, adj_hops, features, **kwargs):
        """Attention coefficients after a forward pass (GAT-style models)."""
        st = args.objects["state"]
        capture = {}
        model.apply(st["params"], adj, features, adj_hops, training=False,
                    capture=capture)
        coefs = getattr(model, "last_attn_coefs", None)
        if coefs is None:
            raise NotImplementedError(
                f"{type(model).__name__} has no attention coefficients")
        return coefs

    args.objects["train_step"] = train_step
    args.objects["test_step"] = test_step
    args.objects["predict_step"] = predict_step
    args.objects["embed_step"] = embed_step
    args.objects["attn_step"] = attn_step

    # ---- blocked epoch execution (--epochs_per_block K) ------------------
    # TPU-throughput mode: K epochs run as ONE lax.scan'd XLA program with
    # the best-validation parameters tracked ON DEVICE (best_params carry),
    # so host round-trips drop from 2K dispatches + K stat readbacks to one
    # of each per block. Early stopping is still evaluated per epoch on the
    # host from the stacked stats; if it fires mid-block, model selection
    # may see up to K-1 extra epochs (documented deviation).
    def _epoch_body(carry, epoch_idx, adj, adj_hops, features, y_train,
                    train_mask, y_val, val_mask, y_test, test_mask):
        params, opt_state, best_params, best_opt, best_crit = carry
        rng = jax.random.fold_in(rng_base, epoch_idx)

        def loss_fn(p):
            logits = model.apply(p, adj, features, adj_hops, training=True,
                                 rng=rng)
            return model.loss(p, logits, y_train, train_mask)

        train_loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        logits = model.apply(params, adj, features, adj_hops, training=False)
        stats = dict(
            train_loss=train_loss,
            train_acc=masked_accuracy(logits, y_train, train_mask),
            val_acc=masked_accuracy(logits, y_val, val_mask),
            test_accuracy=masked_accuracy(logits, y_test, test_mask),
            val_loss=model.loss(params, logits, y_val, val_mask),
            test_loss=masked_softmax_cross_entropy(logits, y_test, test_mask),
        )
        crit = (stats["val_acc"] if args.best_val_criteria == "val_acc"
                else -stats["val_loss"])
        better = crit >= best_crit  # ties → later epoch, like the reference
        best_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(better, new, old), params, best_params
        )
        best_opt = jax.tree_util.tree_map(
            lambda new, old: jnp.where(better, new, old), opt_state, best_opt
        )
        best_crit = jnp.where(better, crit, best_crit)
        return (params, opt_state, best_params, best_opt, best_crit), stats

    @functools.partial(jax.jit, static_argnames=("k",))
    def _train_block(carry, start_epoch, k, adj, adj_hops, features, y_train,
                     train_mask, y_val, val_mask, y_test, test_mask):
        def body(c, idx):
            return _epoch_body(c, idx, adj, adj_hops, features, y_train,
                               train_mask, y_val, val_mask, y_test, test_mask)

        return jax.lax.scan(body, carry,
                            start_epoch + jnp.arange(k, dtype=jnp.int32))

    def train_block(k, start_epoch, adj, adj_hops, features, y_train,
                    train_mask, y_val, val_mask, y_test, test_mask, **kwargs):
        carry = args.objects.get("block_carry")
        if carry is None:
            st = args.objects["state"]
            crit0 = jnp.float32(-jnp.inf)
            carry = (st["params"], st["opt_state"], st["params"],
                     st["opt_state"], crit0)
        carry, stats = _train_block(
            carry, jnp.int32(start_epoch), k, adj, adj_hops, features,
            y_train, train_mask, y_val, val_mask, y_test, test_mask,
        )
        args.objects["block_carry"] = carry
        params, opt_state, best_params, best_opt, _ = carry
        args.objects["state"] = {"params": params, "opt_state": opt_state}
        args.objects["best_state"] = {"params": best_params,
                                      "opt_state": best_opt}
        return {key: np.asarray(v) for key, v in stats.items()}

    args.objects["train_block"] = train_block
    _register_protocol(args, model, test_step, early_stopping, es_metric)


def _register_protocol(args, model, test_step, early_stopping, es_metric):
    """Wire the epoch protocol: stats printing, early stopping, best-val
    tracking, checkpoint management, results.json (reference
    H2GCN.py:136-195)."""
    stats_printer = logger.EpochStatsPrinter()
    args.objects["statsPrinter"] = stats_printer
    args.objects["best_val_stats"] = None
    args.objects["current_ckpt"] = None
    args.objects["es_metric"] = es_metric
    if isinstance(early_stopping, int):
        args.objects["early_stopping"] = controller.SlidingMeanEarlyStopping(
            early_stopping
        )
    else:
        args.objects["early_stopping"] = early_stopping

    def post_epoch_callback(epoch, args):
        epoch_stats = args.objects["epoch_stats"]
        stats_printer(epoch, epoch_stats)

        if args.objects["early_stopping"](epoch_stats[es_metric]):
            print("Early stopping...")
            args.epochs = epoch

        every_epoch = getattr(args, "_ckpt_every_epoch", False)
        if every_epoch:
            current_ckpt = args.objects["current_ckpt"]
            best = args.objects["best_val_stats"]
            if (current_ckpt is not None and best is not None
                    and current_ckpt != best.get("ckpt")):
                logger.remove_ckpt(args, current_ckpt)
            args.objects["current_ckpt"] = logger.save_ckpt(
                args.objects["state"], args, epoch, epoch_stats
            )

        prev_best = args.objects["best_val_stats"]
        if update_best_val_stats(args, epoch_stats, epoch,
                                 ckpt=args.objects["current_ckpt"]):
            if every_epoch and prev_best is not None:
                logger.remove_ckpt(args, prev_best.get("ckpt"))
            # Params are immutable pytrees: holding the reference IS the
            # checkpoint (no copy, no IO).
            args.objects["best_state"] = args.objects["state"]

    def post_train_callback(args):
        best = args.objects["best_val_stats"]
        if (not args.verbose) or args.save_activations or args.save_predictions:
            print("Restoring the best performance model")
            if getattr(args, "_ckpt_every_epoch", False) and best.get("ckpt"):
                args.objects["state"] = logger.restore_ckpt(
                    args.objects["state"], args, best["ckpt"]
                )
            else:
                args.objects["state"] = args.objects["best_state"]
            epoch_stats = test_step(
                **args.objects["tensors"], verbose=True,
                save_activations=args.save_activations,
                save_predictions=args.save_predictions,
            )
            best["monitor"] = epoch_stats["monitor"]
        # Always persist the final best state to disk once.
        final_name = logger.save_ckpt(
            args.objects["state"], args, best["epoch"], best
        )
        best.setdefault("ckpt", final_name)
        print("Best performance:")
        stats_printer.from_dict(best)
        if args.use_signac:
            job = args.objects["signac_job"]
            record = {}
            for key, item in best.items():
                if isinstance(item, (jnp.ndarray, np.ndarray)):
                    record[key] = np.asarray(item).item()
                else:
                    record[key] = item
            with open(job.fn("results.json"), "w") as f:
                json.dump(record, f, default=str)

    args.objects["post_epoch_callbacks"].append(post_epoch_callback)
    args.objects["post_train_callbacks"].append(post_train_callback)


def _initialize_distributed(args, model, tx, params, opt_state,
                            early_stopping, seed, es_metric, mesh_shards):
    """Multi-chip runtime: node-sharded tensors, edge-partitioned hops,
    shard_map'd train/eval steps — behind the same args.objects contract.

    Activated by ``--mesh_shards N``. Hop-matrix models (H2GCN/GCN
    families) shard per ``--halo_mode {ring,allgather,halo,halo-cootile}``;
    GAT shards its attention support dest-stripe-wise over the gather
    payload (parallel/attention.py) — the at-scale path the single-device
    reference (baselines/GAT/utils/layers.py:53-100) never had.
    """
    from ..parallel import dist as pdist
    from ..parallel import train as ptrain
    from ..parallel.mesh import make_mesh

    tensors = args.objects["tensors"]
    hops = tensors.get("adj_hops")
    mode = getattr(args, "_halo_mode", "ring") or "ring"
    mesh = make_mesh(mesh_shards)
    from .GAT import GATNetwork as _GAT

    if isinstance(model, _GAT):
        from ..parallel import attention as pattn

        dga, n_pad = pattn.shard_attention_gather(
            tensors["adj"].to_scipy(), mesh_shards)
        model = pattn.DistGATNetwork.from_single(model)
        hop_shards = [dga]
        print(f"===> Distributed GAT: dest-stripe gather attention, "
              f"halo {dga.h_pad} rows/pair, "
              f"{dga.e_pad} padded edges/shard")
    else:
        assert isinstance(hops, (list, tuple)) and len(hops) > 0, (
            "--mesh_shards requires hop-matrix models (H2GCN/GCN "
            "families) or GAT")
        hop_shards, n_pad = pdist.shard_hops(
            [h.to_scipy() for h in hops], mesh_shards, mode=mode
        )
    train_fn, _ = ptrain.build_dist_steps(model, tx, mesh, hop_shards)
    eval_full = train_fn.eval_full

    sharding = ptrain.make_node_sharding(mesh)

    def put(key):
        arr = np.asarray(tensors[key], dtype=np.float32)
        return jax.device_put(
            jnp.asarray(pdist.pad_nodes(arr, n_pad)), sharding
        )

    dd = {k: put(k) for k in ("features", "y_train", "train_mask", "y_val",
                              "val_mask", "y_test", "test_mask")}
    args.objects["dist_data"] = dd
    args.objects["state"] = {"params": params, "opt_state": opt_state}
    args.objects["model"] = model
    args.objects["optimizer"] = tx
    rng_base = jax.random.PRNGKey(seed + 1)
    print(f"===> Distributed runtime: {mesh_shards}-way mesh, "
          f"{mode} halo exchange, {n_pad} padded nodes")

    def train_step(**kwargs):
        st = args.objects["state"]
        rng = jax.random.fold_in(rng_base, args.current_epoch)
        new_params, new_opt_state, loss = train_fn(
            st["params"], st["opt_state"], rng, dd["features"],
            dd["y_train"], dd["train_mask"],
        )
        args.objects["state"] = {"params": new_params,
                                 "opt_state": new_opt_state}
        return dict(train_loss=loss)

    n_real = args.objects["dataset"].num_samples

    def predict_step(**kwargs):
        st = args.objects["state"]
        return train_fn.logits(st["params"], dd["features"])[:n_real]

    def test_step(verbose=None, save_activations=False,
                  save_predictions=False, **kwargs):
        st = args.objects["state"]
        stats = dict(eval_full(
            st["params"], dd["features"], dd["y_train"], dd["train_mask"],
            dd["y_val"], dd["val_mask"], dd["y_test"], dd["test_mask"],
        ))
        stats["monitor"] = dict()
        if args.use_signac and save_predictions:
            job = args.objects["signac_job"]
            unperm = _original_order_fn(tensors.get("node_perm"))
            job.data["predicted_prob"] = unperm(predict_step())
            for scope in ("train", "val", "test"):
                job.data[f"{scope}_mask"] = unperm(tensors[f"{scope}_mask"])
        if save_activations:
            print("===> save_activations is not supported with "
                  "--mesh_shards; skipping (run single-chip for the "
                  "activation-dump parity harness)")
        return stats

    def _unsupported(name):
        def step(**kwargs):
            raise NotImplementedError(
                f"{name} is not available with --mesh_shards")

        return step

    def train_block(k, start_epoch, **kwargs):
        carry = args.objects.get("block_carry")
        if carry is None:
            st = args.objects["state"]
            carry = (st["params"], st["opt_state"], st["params"],
                     st["opt_state"], jnp.float32(-jnp.inf))
        carry, stats = train_fn.block(
            carry, start_epoch, k, rng_base,
            args.best_val_criteria == "val_acc",
            dd["features"], dd["y_train"], dd["train_mask"],
            dd["y_val"], dd["val_mask"], dd["y_test"], dd["test_mask"],
        )
        args.objects["block_carry"] = carry
        params_c, opt_c, best_params, best_opt, _ = carry
        args.objects["state"] = {"params": params_c, "opt_state": opt_c}
        args.objects["best_state"] = {"params": best_params,
                                      "opt_state": best_opt}
        return {key: np.asarray(v) for key, v in stats.items()}

    args.objects["train_step"] = train_step
    args.objects["test_step"] = test_step
    args.objects["train_block"] = train_block
    args.objects["predict_step"] = predict_step
    args.objects["embed_step"] = _unsupported("embed_step")
    args.objects["attn_step"] = _unsupported("attn_step")
    _register_protocol(args, model, test_step, early_stopping, es_metric)
