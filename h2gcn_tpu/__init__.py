"""h2gcn_tpu — a TPU-native graph neural network framework (H2GCN family).

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
GemsLab/H2GCN reference (see SURVEY.md): the H2GCN model family with
ego/neighbor-embedding separation and exact multi-hop sparse aggregation, a
string layer-DSL for architectures, planetoid/GeomGCN/npz data loaders,
masked-loss full-graph training with early stopping and best-validation
selection, the in-framework baseline family, and multi-chip scaling via
`jax.sharding` meshes with edge-partitioned SpMM.

Design principles (TPU-first, not a port):
  * All compute-path code is functional JAX: the whole train step (forward,
    masked loss, grads, Adam update, and eval metrics) compiles to a single
    XLA program — the reference runs eagerly, one kernel per layer
    (reference: h2gcn/run_experiments.py:5).
  * Sparse aggregation is backend-dispatched per matrix: dense MXU matmul for
    small graphs, a Pallas block-sparse (BSR) kernel for large ones, and a
    segment-sum path as the general fallback. Static shapes everywhere.
  * Multi-chip scaling uses `shard_map` over a named mesh with XLA
    collectives (all_gather / psum / ppermute), not host-side loops.
"""

__version__ = "0.1.0"


def __getattr__(name):  # PEP 562 — lazy submodule access
    # Keeps `import h2gcn_tpu` free of jax so host-only users (the spawned
    # spgemm workers, dataset tooling) never pay accelerator-client startup.
    import importlib

    if name in ("sparse", "datasets", "models", "modules", "nn", "parallel",
                "experiments", "native"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
