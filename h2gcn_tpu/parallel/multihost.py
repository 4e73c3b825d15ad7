"""Multi-host (pod-slice) initialization helpers.

Single-controller-per-host JAX: every host process calls
:func:`initialize` BEFORE any JAX computation, after which
``jax.devices()`` spans the whole slice and the 1-D graph mesh
(``mesh.make_mesh``) covers all chips — node blocks are assigned
device-major, so contiguous graph partitions land on the same host and the
ring halo exchange crosses DCN only at host boundaries (the reference has
no distributed execution at all; SURVEY.md §2).

Environment-driven defaults work on TPU pods (the runtime populates
coordinator/process info); explicit arguments cover manual clusters.
"""

from __future__ import annotations

import jax


def _already_initialized() -> bool:
    # Inspect the distributed client WITHOUT touching the backend —
    # jax.process_count() would initialize XLA and make a subsequent
    # jax.distributed.initialize() impossible.
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:  # noqa: BLE001 — conservative across jax versions
        return False


def initialize(coordinator_address: str = None, num_processes: int = None,
               process_id: int = None, local_device_ids=None):
    """Join the multi-host runtime. No-op if already initialized.

    Must run before the first JAX computation in the process. With no
    arguments, uses the environment-driven TPU-pod auto-configuration;
    explicit coordinator/process arguments cover manual clusters.
    """
    if _already_initialized():
        return
    if coordinator_address is None and (num_processes is not None
                                        or process_id is not None):
        raise ValueError(
            "num_processes/process_id require coordinator_address")
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
        # env-driven path on a plain single-host machine: nothing to join
        if coordinator_address is not None:
            raise
        print(f"[multihost] single-process mode ({e})")


def host_local_node_range(n_pad: int, num_shards: int = None):
    """This host's contiguous node range under the device-major 1-D mesh.

    ``num_shards``: size of the mesh the data was sharded for (defaults to
    every device); must divide evenly into per-device blocks of ``n_pad``.
    """
    n_dev = num_shards if num_shards is not None else jax.device_count()
    assert n_pad % n_dev == 0, (
        f"n_pad={n_pad} not divisible by mesh size {n_dev}")
    n_local_dev = jax.local_device_count()
    per_dev = n_pad // n_dev
    start_dev = jax.process_index() * n_local_dev
    end_dev = min(start_dev + n_local_dev, n_dev)
    return start_dev * per_dev, end_dev * per_dev
