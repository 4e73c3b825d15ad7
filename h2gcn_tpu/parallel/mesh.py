"""Device mesh helpers."""

from __future__ import annotations

import jax


GRAPH_AXIS = "graph"


def make_mesh(n_devices: int = None, axis: str = GRAPH_AXIS) -> jax.sharding.Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all).

    Graph workloads shard nodes/edges over a single axis; ICI ring collectives
    (all_gather / psum_scatter) carry the boundary-feature exchange.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    return jax.sharding.Mesh(devices[:n_devices], (axis,))
