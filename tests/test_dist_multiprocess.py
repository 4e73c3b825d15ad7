"""Real multi-process jax.distributed parity (workbench/dist_multiprocess.py):
spawns 2 OS processes x 2 virtual CPU devices joined through a localhost
coordinator, runs the node-sharded train program over the global 4-device
mesh, and asserts loss/accuracy parity with a single-process 4-device run.
This crosses a REAL process boundary — psum'd gradients and the ring halo
exchange ride the distributed runtime (SURVEY.md §2 comm-backend row) —
unlike test_multihost.py's monkeypatched topology."""

import json
import pathlib
import subprocess
import sys
import tempfile

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_multiprocess_distributed_parity(tmp_path):
    out = tmp_path / "dist_mp.json"
    r = subprocess.run(
        [sys.executable, "-u",
         str(REPO / "workbench" / "dist_multiprocess.py"),
         "--nproc", "2", "--devices_per_proc", "2", "--steps", "2",
         "--mode", "ring", "--out", str(out)],
        capture_output=True, timeout=800)
    assert r.returncode == 0, r.stdout.decode() + r.stderr.decode()
    report = json.loads(out.read_text())
    assert report["parity"] is True
    assert report["multi_process"]["process_count"] == 2
    assert report["multi_process"]["device_count"] == 4
    assert report["max_abs_loss_delta"] < 1e-5


@pytest.mark.slow
def test_multiprocess_distributed_gat_parity(tmp_path):
    """Distributed GAT (dest-stripe gather attention) across a REAL
    process boundary: the [f2|h] all_to_all and its VJP transpose ride
    the jax.distributed runtime; loss/accuracy parity vs a single-process
    equal-size mesh (round-5 evidence for the newest parallel mode)."""
    out = tmp_path / "dist_mp_gat.json"
    r = subprocess.run(
        [sys.executable, "-u",
         str(REPO / "workbench" / "dist_multiprocess.py"),
         "--nproc", "2", "--devices_per_proc", "2", "--steps", "2",
         "--n", "256", "--m_edges", "1536",
         "--mode", "gat", "--out", str(out)],
        capture_output=True, timeout=900)
    assert r.returncode == 0, r.stdout.decode() + r.stderr.decode()
    report = json.loads(out.read_text())
    assert report["parity"] is True
    assert report["multi_process"]["process_count"] == 2
    assert report["max_abs_loss_delta"] < 1e-5
