"""Multi-host helpers (parallel/multihost.py) — single-process coverage.

A real pod isn't available here, so these tests pin the contracts that can
be checked without one: the single-process no-op/idempotency behavior of
``initialize``, argument validation, and the device-major node-range
arithmetic for every (process, mesh-size) combination by patching the
process topology accessors.
"""

import jax
import numpy as np
import pytest

from h2gcn_tpu.parallel import multihost


def test_initialize_single_process_is_safe_and_idempotent(capsys):
    # env-driven path on a plain machine: must not raise, and a second call
    # must be a no-op regardless of outcome
    multihost.initialize()
    multihost.initialize()


def test_initialize_argument_validation():
    with pytest.raises(ValueError, match="coordinator_address"):
        multihost.initialize(num_processes=4)
    with pytest.raises(ValueError, match="coordinator_address"):
        multihost.initialize(process_id=1)


def test_host_local_node_range_single_process():
    n_dev = jax.device_count()
    n_pad = n_dev * 10
    lo, hi = multihost.host_local_node_range(n_pad)
    # one process owns everything
    assert (lo, hi) == (0, n_pad)


def test_host_local_node_range_device_major(monkeypatch):
    """Simulate a 4-process x 2-local-device pod over an 8-way mesh: each
    host's range must be contiguous, device-major, and partition [0, n)."""
    monkeypatch.setattr(jax, "local_device_count", lambda: 2)
    n_pad = 8 * 5
    ranges = []
    for pid in range(4):
        monkeypatch.setattr(jax, "process_index", lambda pid=pid: pid)
        ranges.append(multihost.host_local_node_range(n_pad, num_shards=8))
    assert ranges == [(0, 10), (10, 20), (20, 30), (30, 40)]


def test_host_local_node_range_uneven_mesh(monkeypatch):
    """Mesh smaller than the device fleet: trailing hosts get empty ranges
    (end clamps to the mesh size)."""
    monkeypatch.setattr(jax, "local_device_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    lo, hi = multihost.host_local_node_range(8, num_shards=4)
    assert (lo, hi) == (8, 8)  # devices 4..7 hold nothing of a 4-way mesh


def test_host_local_node_range_divisibility_guard():
    with pytest.raises(AssertionError, match="not divisible"):
        multihost.host_local_node_range(7, num_shards=8)
