"""Multi-chip execution: mesh construction, distributed SpMM, sharded training.

The reference has no distributed execution of any kind (SURVEY.md §2,
parallelism table) — this layer is greenfield TPU design: the graph is
node/edge-partitioned over a 1-D named mesh, activations are node-sharded,
parameters replicated, and aggregation exchanges boundary features with XLA
collectives inside ``shard_map``.
"""

from .dist import (
    DistSparseMatrix,
    HaloShardedMatrix,
    RingShardedMatrix,
    ShardedMatrix,
    dist_spmm,
    dist_spmm_halo,
    dist_spmm_ring,
    shard_hops,
    shard_matrix,
    shard_matrix_halo,
    shard_matrix_ring,
)
from .mesh import make_mesh

__all__ = [
    "DistSparseMatrix", "HaloShardedMatrix", "RingShardedMatrix",
    "ShardedMatrix", "dist_spmm", "dist_spmm_halo", "dist_spmm_ring",
    "shard_hops", "shard_matrix", "shard_matrix_halo", "shard_matrix_ring",
    "make_mesh",
]
