"""Multi-chip execution: mesh construction, distributed SpMM, sharded training.

The reference has no distributed execution of any kind (SURVEY.md §2,
parallelism table) — this layer is greenfield TPU design: the graph is
node/edge-partitioned over a 1-D named mesh, activations are node-sharded,
parameters replicated, and aggregation exchanges boundary features with XLA
collectives inside ``shard_map``.
"""

__all__ = [
    "DistSparseMatrix", "HaloShardedMatrix", "RingShardedMatrix",
    "ShardedMatrix", "dist_spmm", "dist_spmm_halo", "dist_spmm_ring",
    "shard_hops", "shard_matrix", "shard_matrix_halo", "shard_matrix_ring",
    "make_mesh",
]


def __getattr__(name):  # PEP 562 — lazy re-exports
    # The spgemm host workers import this package in spawned processes;
    # resolving dist/mesh lazily keeps them off the jax import path.
    if name == "make_mesh":
        from .mesh import make_mesh

        return make_mesh
    if name in __all__:
        from . import dist as _dist

        return getattr(_dist, name)
    import importlib

    try:
        return importlib.import_module(f".{name}", __name__)
    except ModuleNotFoundError:
        raise AttributeError(name) from None
