"""Functional network model compiled from the layer DSL.

Replaces the reference's ``H2GCN(tf.keras.Model)`` (h2gcn/models/H2GCN.py:209-367)
with a pure-functional design: :class:`NetworkModel` holds only the *static*
layer program (kinds, routing index sets, tag table), parameters live in an
explicit pytree, and ``apply`` is a pure function of ``(params, graph, x, rng)``
— so the entire train step (forward + loss + grad + optimizer) jits into one
XLA program instead of the reference's per-layer eager dispatch.

Routing semantics preserved from the reference ``call``
(h2gcn/models/H2GCN.py:294-346): concat layers receive the tagged-output
table, graph layers receive the hop matrices, ``returnBefore``/
``executeAfter`` drive embedding extraction and auxiliary supervision heads.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..sparse import SparseMatrix, spmm
from .dsl import Layer

# Registry for X<name>_<conf> experimental layers: name -> factory(conf) ->
# callable(params, adj, x, adjhops, tagged) -> x. Mirrors the (empty)
# ``experimentalDict`` of the reference (h2gcn/models/_layers.py:118).
experimental_registry: Dict[str, Any] = {}

_MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def _dense_apply(p, x):
    if isinstance(x, SparseMatrix):
        # sparse input features: X·W through the SpMM core — the reference's
        # SparseDense (h2gcn/models/_layers.py:22-52). Keeps n×n identity /
        # CSR bag-of-words features off the dense path entirely.
        y = spmm(x, p["kernel"])
    else:
        y = jnp.matmul(x, p["kernel"], precision=_MATMUL_PRECISION)
    if "bias" in p:
        y = y + p["bias"]
    return y


def _aggregate(a, x):
    """SpMM dispatch: single-chip SparseMatrix or shard_map-local shard."""
    from ..parallel.dist import (
        DistSparseMatrix,
        HaloCooTileMatrix,
        HaloShardedMatrix,
        RingShardedMatrix,
        dist_spmm,
        dist_spmm_halo,
        dist_spmm_halo_cootile,
        dist_spmm_ring,
    )

    if isinstance(a, DistSparseMatrix):
        return dist_spmm(a, x)
    if isinstance(a, RingShardedMatrix):
        return dist_spmm_ring(a, x)
    if isinstance(a, HaloShardedMatrix):
        return dist_spmm_halo(a, x)
    if isinstance(a, HaloCooTileMatrix):
        return dist_spmm_halo_cootile(a, x)
    return spmm(a, x)


def _safe_lambda(expr: str):
    """Evaluate a DSL lambda in a restricted namespace (jnp/jax.nn only).

    The namespace must live in eval's GLOBALS — a lambda's free names
    resolve through its ``__globals__``, not the eval locals.
    """
    return eval(  # noqa: S307 — restricted globals, config-provided string
        expr, {"__builtins__": {}, "jnp": jnp, "nn": jax.nn}
    )


class NetworkModel:
    """A static layer program + pure ``init``/``apply`` functions."""

    def __init__(self, layer_setups, l2_regularize_weight: float = 0.0):
        self.layer_setups = [(kind, dict(conf)) for kind, conf in layer_setups]
        self.l2_regularize_weight = float(l2_regularize_weight)

        self.dropout_inds = set()
        self.graph_hops_inds = set()
        self.concat_inds = set()
        self.slice_inds = set()
        self.experimental_inds = set()
        self.supervised_inds = set()
        self.embedding_ind: Optional[int] = None
        self.output_ind: Optional[int] = None
        self.tags: Dict[int, str] = {}
        self.names: List[str] = []

        for ind, (kind, conf) in enumerate(self.layer_setups):
            tag = conf.pop("tag", None)
            if kind == Layer.DENSE:
                if conf.get("isEmbedding", False):
                    self.embedding_ind = ind
                if conf.get("beginOutput", False):
                    self.output_ind = ind
                self.names.append("dense")
            elif kind == Layer.DROPOUT:
                self.dropout_inds.add(ind)
                self.names.append("dropout")
            elif kind == Layer.GCN:
                self.graph_hops_inds.add(ind)
                self.names.append("graph")
            elif kind == Layer.CONCAT:
                self.concat_inds.add(ind)
                self.names.append("concat")
            elif kind == Layer.SLICE:
                self.slice_inds.add(ind)
                self.names.append("slice")
            elif kind == Layer.RELU:
                self.names.append("relu")
            elif kind == Layer.VECTORIZE:
                self.names.append("flatten")
            elif kind == Layer.IDENTITY:
                self.names.append("identity")
            elif kind == Layer.LAMBDA:
                conf["fn"] = _safe_lambda(conf["lambda"])
                self.names.append("lambda")
            elif kind == Layer.STOP_GRADIENT:
                self.names.append("stop_gradient")
            elif kind == Layer.EXPERIMENTAL:
                self.experimental_inds.add(ind)
                factory = experimental_registry[conf["name"]]
                conf["fn"] = factory(conf.get("conf", ""), conf.get("output_dim"))
                self.names.append(f"x_{conf['name']}")
            else:
                raise ValueError(f"Unsupported layer type {kind}")
            if conf.get("supervised", False):
                self.supervised_inds.add(ind)
            if tag:
                self.tags[ind] = tag

    @property
    def num_layers(self) -> int:
        return len(self.layer_setups)

    # ------------------------------------------------------------------- init
    def init(self, rng: jax.Array, input_dim: int, num_hops: int) -> List[dict]:
        """Create the parameter pytree by tracing a tiny dummy forward."""
        from ..sparse.matrix import SparseMatrix as SM
        import numpy as np
        import scipy.sparse as sp

        n = 4
        eye = sp.eye(n, format="csr", dtype=np.float32)
        dummy_adj = SM.from_scipy(eye, backend="segment")
        dummy_hops = [dummy_adj] * max(1, num_hops)
        x = jnp.zeros((n, input_dim), dtype=jnp.float32)
        params: List[dict] = []
        self._forward(
            params, dummy_adj, x, dummy_hops, training=False, rng=None,
            init_rng=rng,
        )
        return params

    # ------------------------------------------------------------------ apply
    def apply(
        self,
        params: Sequence[dict],
        adj: SparseMatrix,
        x: jax.Array,
        adjhops: Sequence[SparseMatrix],
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        return_before: int = 0,
        execute_after: int = 0,
        add_supervision: bool = False,
        capture: Optional[dict] = None,
    ):
        return self._forward(
            list(params), adj, x, adjhops,
            training=training, rng=rng, return_before=return_before,
            execute_after=execute_after, add_supervision=add_supervision,
            capture=capture,
        )

    def _forward(
        self,
        params,
        adj,
        x,
        adjhops,
        *,
        training,
        rng,
        return_before: int = 0,
        execute_after: int = 0,
        add_supervision: bool = False,
        capture: Optional[dict] = None,
        init_rng: Optional[jax.Array] = None,
    ):
        initializing = init_rng is not None
        tagged: Dict[str, jax.Array] = {}
        supervised_outputs = []
        if capture is not None:
            capture["inputs/inputs"] = x

        n_layers = self.num_layers
        if return_before <= 0:
            return_before = n_layers + return_before
        if execute_after < 0:
            execute_after = n_layers + execute_after

        for ind, (kind, conf) in enumerate(self.layer_setups):
            if ind == return_before:
                return x
            if ind < execute_after:
                continue

            if kind == Layer.DENSE:
                if initializing:
                    k = jax.random.fold_in(init_rng, ind)
                    w = jax.nn.initializers.glorot_uniform()(
                        k, (x.shape[-1], conf["units"]), jnp.float32
                    )
                    p = {"kernel": w}
                    if conf["use_bias"]:
                        p["bias"] = jnp.zeros((conf["units"],), jnp.float32)
                    while len(params) <= ind:
                        params.append({})
                    params[ind] = p
                x = _dense_apply(params[ind], x)
            elif kind == Layer.DROPOUT:
                from .ops import dropout

                x = dropout(x, conf["dropout_rate"], rng, ind,
                            training=training)
            elif kind == Layer.GCN:
                hops = conf.get("hops")
                parts = [
                    _aggregate(a, x)
                    for h, a in enumerate(adjhops)
                    if hops is None or h in hops
                ]
                x = jnp.stack(parts, axis=-2)
            elif kind == Layer.RELU:
                x = jax.nn.relu(x)
            elif kind == Layer.VECTORIZE:
                x = x.reshape(x.shape[0], -1)
            elif kind == Layer.IDENTITY:
                # sparse→dense boundary (reference DSL token "I"); a no-op
                # for already-dense activations
                if isinstance(x, SparseMatrix):
                    x = x.todense()
            elif kind == Layer.CONCAT:
                # Tag order follows tag creation order, matching the
                # reference's kwargs-iteration (h2gcn/models/_layers.py:90-96).
                selected = [v for t, v in tagged.items() if t in conf["tags"]]
                if conf.get("addInputs", True):
                    selected = [x] + selected
                x = jnp.concatenate(selected, axis=-1)
            elif kind == Layer.SLICE:
                src = tagged[conf["loadTag"]] if conf["loadTag"] else x
                x = src[:, conf["sliceObj"]]
            elif kind == Layer.LAMBDA:
                x = conf["fn"](x)
            elif kind == Layer.STOP_GRADIENT:
                x = jax.lax.stop_gradient(x)
            elif kind == Layer.EXPERIMENTAL:
                x = conf["fn"](params[ind] if ind < len(params) else {}, adj, x,
                               adjhops, tagged)

            if add_supervision and ind in self.supervised_inds:
                supervised_outputs.append(
                    self._forward(
                        params, adj, x, adjhops, training=training, rng=rng,
                        execute_after=self.output_ind,
                    )
                )

            if capture is not None:
                capture[f"activations/{ind}-{self.names[ind]}"] = x
            if ind in self.tags:
                tagged[self.tags[ind]] = x
            if initializing and len(params) <= ind:
                params.append({})

        if add_supervision:
            return x, supervised_outputs
        return x

    # -------------------------------------------------------------- accessors
    def get_embeddings(self, params, adj, x, adjhops):
        assert self.embedding_ind is not None, "no E-marked layer in the DSL"
        return self.apply(
            params, adj, x, adjhops, return_before=self.embedding_ind + 1
        )

    def call_output_network(self, params, adj, x, adjhops, **kw):
        assert self.output_ind is not None, "no *O output head in the DSL"
        return self.apply(params, adj, x, adjhops,
                          execute_after=self.output_ind, **kw)

    # ------------------------------------------------------------------- loss
    def l2_loss(self, params) -> jax.Array:
        """keras-style l2: ``weight * Σ sum(kernel²)`` over dense kernels only
        (biases excluded) — reference H2GCN.py:236-249, _metrics via
        ``self.losses`` at H2GCN.py:363-367."""
        total = 0.0
        for ind, p in enumerate(params):
            if isinstance(p, dict) and "kernel" in p:
                # Per-layer "l2_scale" lets baseline variants reproduce their
                # reference regularization (e.g. Kipf GCN regularizes only the
                # first layer, with tf.nn.l2_loss's 1/2 factor → scale 0.5).
                scale = self.layer_setups[ind][1].get("l2_scale", 1.0)
                if scale:
                    total = total + scale * jnp.sum(jnp.square(p["kernel"]))
        return self.l2_regularize_weight * total

    def loss(self, params, logits, labels, mask) -> jax.Array:
        from .metrics import masked_softmax_cross_entropy

        return masked_softmax_cross_entropy(logits, labels, mask) + self.l2_loss(
            params
        )
