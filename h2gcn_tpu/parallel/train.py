"""Distributed full-graph training step.

Builds a jitted, shard_mapped train/eval step for a
:class:`~h2gcn_tpu.nn.model.NetworkModel`: node-sharded activations
(``P(axis)``), replicated parameters (``P()``), edge-partitioned hop
matrices, all-gather halo exchange inside the aggregation, and psum'd loss /
metrics / gradients. Optimizer updates are computed redundantly on every
device (parameters stay replicated — the cheap choice for GNN-sized models).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..nn.model import NetworkModel
from .dist import ShardedMatrix
from .mesh import GRAPH_AXIS


from ..nn.metrics import softmax_ce_rows as _ce_rows  # shared CE formula


def _psum(x, axis):
    return jax.lax.psum(x, axis)


def masked_ce_dist(logits, labels, mask, axis):
    m = mask.astype(jnp.float32)
    m = m / _psum(jnp.sum(m), axis)
    return _psum(jnp.sum(_ce_rows(logits, labels) * m), axis)


def masked_acc_dist(logits, labels, mask, axis):
    m = mask.astype(jnp.float32)
    m = m / _psum(jnp.sum(m), axis)
    correct = (jnp.argmax(logits, 1) == jnp.argmax(labels, 1)).astype(jnp.float32)
    return _psum(jnp.sum(correct * m), axis)


def build_dist_steps(
    model: NetworkModel,
    tx: optax.GradientTransformation,
    mesh: jax.sharding.Mesh,
    hop_shards: List[ShardedMatrix],
    axis: str = GRAPH_AXIS,
):
    """Returns (train_step, eval_step), both jitted over the mesh.

    train_step(params, opt_state, rng, x, y_train, train_mask)
        -> (params, opt_state, loss)
    eval_step(params, x, y, mask) -> dict(acc=..., loss=...)
    with x/y/mask node-sharded on the leading axis and params replicated.
    """
    n_hops = len(hop_shards)
    hop_specs = tuple(
        jax.tree_util.tree_map(lambda _: P(axis), h) for h in hop_shards
    )

    num_devices = mesh.shape[axis]

    def _local_train(params, opt_state, rng, x, y, mask, *hops):
        hops_local = [h.local() for h in hops]
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def partial_loss(p):
            # Per-device PARTIAL loss: local CE share (globally-normalized
            # mask) + 1/D of the L2 term. psum of the value gives the global
            # loss; psum of the grad gives the exact global gradient —
            # including contributions routed back through the all-gather's
            # psum_scatter transpose.
            logits = model.apply(
                p, hops_local[0], x, hops_local, training=True, rng=rng
            )
            m = mask.astype(jnp.float32)
            m = m / _psum(jnp.sum(m), axis)
            ce = jnp.sum(_ce_rows(logits, y) * m)
            return ce + model.l2_loss(p) / num_devices

        partial, grads = jax.value_and_grad(partial_loss)(params)
        loss = _psum(partial, axis)
        grads = jax.lax.psum(grads, axis)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss

    def _local_eval(params, x, y, mask, *hops):
        hops_local = [h.local() for h in hops]
        logits = model.apply(params, hops_local[0], x, hops_local, training=False)
        return dict(
            acc=masked_acc_dist(logits, y, mask, axis),
            loss=masked_ce_dist(logits, y, mask, axis),
        )

    def _local_eval_full(params, x, y_train, train_mask, y_val, val_mask,
                         y_test, test_mask, *hops):
        """Full epoch-stats eval (the runtime test_step contract)."""
        hops_local = [h.local() for h in hops]
        logits = model.apply(params, hops_local[0], x, hops_local,
                             training=False)
        return dict(
            train_acc=masked_acc_dist(logits, y_train, train_mask, axis),
            val_acc=masked_acc_dist(logits, y_val, val_mask, axis),
            test_accuracy=masked_acc_dist(logits, y_test, test_mask, axis),
            val_loss=masked_ce_dist(logits, y_val, val_mask, axis)
            + model.l2_loss(params),
            test_loss=masked_ce_dist(logits, y_test, test_mask, axis),
        )

    train_shard = jax.shard_map(
        _local_train,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)) + hop_specs,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    eval_shard = jax.shard_map(
        _local_eval,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)) + hop_specs,
        out_specs=P(),
        check_vma=False,
    )
    eval_full_shard = jax.shard_map(
        _local_eval_full,
        mesh=mesh,
        in_specs=(P(),) + (P(axis),) * 7 + hop_specs,
        out_specs=P(),
        check_vma=False,
    )

    # hop shards flow through as jit ARGUMENTS — closure capture would bake
    # the (potentially huge) edge arrays into the compiled program as
    # constants, bloating executables and breaking remote-compile setups.
    _train_jit = jax.jit(
        lambda params, opt_state, rng, x, y, mask, hops: train_shard(
            params, opt_state, rng, x, y, mask, *hops
        )
    )
    _eval_jit = jax.jit(
        lambda params, x, y, mask, hops: eval_shard(params, x, y, mask, *hops)
    )
    _eval_full_jit = jax.jit(
        lambda params, x, yt, mt, yv, mv, ys, ms, hops: eval_full_shard(
            params, x, yt, mt, yv, mv, ys, ms, *hops
        )
    )

    def train_step(params, opt_state, rng, x, y, mask):
        return _train_jit(params, opt_state, rng, x, y, mask, hop_shards)

    def eval_step(params, x, y, mask):
        return _eval_jit(params, x, y, mask, hop_shards)

    def eval_full_step(params, x, y_train, train_mask, y_val, val_mask,
                       y_test, test_mask):
        return _eval_full_jit(params, x, y_train, train_mask, y_val, val_mask,
                              y_test, test_mask, hop_shards)

    train_step.eval_full = eval_full_step  # extended contract for the runtime

    def _local_logits(params, x, *hops):
        hops_local = [h.local() for h in hops]
        return model.apply(params, hops_local[0], x, hops_local,
                           training=False)

    logits_shard = jax.shard_map(
        _local_logits, mesh=mesh,
        in_specs=(P(), P(axis)) + hop_specs,
        out_specs=P(axis),
        check_vma=False,
    )
    _logits_jit = jax.jit(
        lambda params, x, hops: logits_shard(params, x, *hops)
    )

    def logits_step(params, x):
        return _logits_jit(params, x, hop_shards)

    train_step.logits = logits_step

    # ---- blocked (lax.scan) distributed epochs ----------------------------
    # Same design as the single-chip --epochs_per_block path: K epochs per
    # compiled program with the best-validation parameters tracked on device,
    # here with every epoch running the full shard_map'd distributed
    # train+eval. One dispatch + one stats readback per K epochs per mesh.
    def _epoch_body_local(carry, epoch_idx, rng_base, best_is_acc, x, y_train,
                          train_mask, y_val, val_mask, y_test, test_mask,
                          *hops):
        params, opt_state, best_params, best_opt, best_crit = carry
        rng = jax.random.fold_in(rng_base, epoch_idx)
        params, opt_state, train_loss = _local_train(
            params, opt_state, rng, x, y_train, train_mask, *hops
        )
        stats = _local_eval_full(params, x, y_train, train_mask, y_val,
                                 val_mask, y_test, test_mask, *hops)
        stats = dict(stats, train_loss=train_loss)
        crit = jnp.where(best_is_acc, stats["val_acc"], -stats["val_loss"])
        better = crit >= best_crit
        best_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(better, new, old), params, best_params
        )
        best_opt = jax.tree_util.tree_map(
            lambda new, old: jnp.where(better, new, old), opt_state, best_opt
        )
        best_crit = jnp.where(better, crit, best_crit)
        return (params, opt_state, best_params, best_opt, best_crit), stats

    def _block_local(carry, start_epoch, k, rng_base, best_is_acc, x, y_train,
                     train_mask, y_val, val_mask, y_test, test_mask, *hops):
        def body(c, idx):
            return _epoch_body_local(
                c, idx, rng_base, best_is_acc, x, y_train, train_mask,
                y_val, val_mask, y_test, test_mask, *hops,
            )

        return jax.lax.scan(
            body, carry, start_epoch + jnp.arange(k, dtype=jnp.int32)
        )

    def _make_block_shard(k):
        def body(carry, start_epoch, rng_base, best_is_acc, *rest):
            return _block_local(carry, start_epoch, k, rng_base,
                                best_is_acc, *rest)

        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=((P(), P(), P(), P(), P()), P(), P(), P())
                + (P(axis),) * 7 + hop_specs,
                out_specs=((P(), P(), P(), P(), P()), P()),
                check_vma=False,
            )
        )

    _block_cache = {}

    def train_block_step(carry, start_epoch, k, rng_base, best_is_acc, x,
                         y_train, train_mask, y_val, val_mask, y_test,
                         test_mask):
        if k not in _block_cache:
            _block_cache[k] = _make_block_shard(k)
        return _block_cache[k](
            carry, jnp.int32(start_epoch), rng_base,
            jnp.bool_(best_is_acc), x, y_train, train_mask, y_val, val_mask,
            y_test, test_mask, *hop_shards,
        )

    train_step.block = train_block_step
    return train_step, eval_step


def make_node_sharding(mesh, axis=GRAPH_AXIS):
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, P(axis))
