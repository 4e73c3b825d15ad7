"""Multi-host (pod-slice) initialization helpers.

Single-controller-per-host JAX: every host process calls
:func:`initialize`, after which ``jax.devices()`` spans the whole slice and
the 1-D graph mesh (``mesh.make_mesh``) covers all chips — node blocks are
assigned device-major, so contiguous graph partitions land on the same host
and the ring halo exchange crosses DCN only at host boundaries (the
reference has no distributed execution at all; SURVEY.md §2).

Environment-driven defaults work on TPU pods (the runtime populates
coordinator/process info); explicit arguments cover manual clusters.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str = None, num_processes: int = None,
               process_id: int = None, local_device_ids=None):
    """Join the multi-host runtime. No-op if already initialized or if the
    process is single-host."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        # single-process environments (no coordinator configured)
        if coordinator_address is not None:
            raise
        print(f"[multihost] single-process mode ({e})")


def host_local_node_range(n_pad: int):
    """This host's contiguous node range under the device-major 1-D mesh."""
    n_dev = jax.device_count()
    n_local_dev = jax.local_device_count()
    per_dev = n_pad // n_dev
    start_dev = jax.process_index() * n_local_dev
    return start_dev * per_dev, (start_dev + n_local_dev) * per_dev
