"""Native (C++) host kernels: fast boolean spgemm, ELL/BSR builders.

Loads ``csrc/libgraphops.so`` via ctypes, building it with ``make`` on first
use if missing. Every entry point has a scipy/numpy fallback so the
framework works without a compiler — the native path is a performance
feature (the reference's exact-hop precompute is its acknowledged host
bottleneck, experiments/h2gcn/utils/dataset.py:70).
"""

from __future__ import annotations

import ctypes
import subprocess
import warnings
from pathlib import Path

import numpy as np
import scipy.sparse as sp

_CSRC = Path(__file__).resolve().parent.parent / "csrc"
_LIB_PATH = _CSRC / "libgraphops.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        # make is a timestamp no-op when the .so is current, and rebuilds it
        # when graphops.cpp is newer (version bumps land without manual
        # intervention). If make itself is unavailable, fall through to
        # loading whatever .so exists.
        try:
            subprocess.run(
                ["make", "-C", str(_CSRC)], check=True,
                capture_output=True, text=True,
            )
        except Exception:
            if not _LIB_PATH.exists():
                raise
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.graphops_version.restype = ctypes.c_int
        # v3 adds the *_nt (OpenMP-team-capped) spgemm entry points; an
        # older .so that make couldn't refresh must fall back to scipy
        # rather than crash on a missing symbol
        assert lib.graphops_version() >= 3
        _lib = lib
    except Exception as e:  # noqa: BLE001 — fall back to scipy
        warnings.warn(f"graphops native library unavailable ({e}); "
                      "using scipy fallbacks")
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _p64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _p32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _pf(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _pu8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _as_csr_idx(m: sp.csr_matrix):
    indptr = np.ascontiguousarray(m.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(m.indices, dtype=np.int32)
    return indptr, indices


def bool_spgemm(a: sp.csr_matrix, b: sp.csr_matrix,
                num_threads: int = 0) -> sp.csr_matrix:
    """Boolean sparse×sparse product: 1[(A@B) > 0], data all ones.

    ``num_threads`` caps the kernel's OpenMP team (0 = runtime default) —
    the thread-transport distributed spgemm gives each of its P concurrent
    workers ``ncpu//P`` lanes instead of oversubscribing P full teams. The
    ctypes calls release the GIL, so P Python threads run these kernels
    genuinely in parallel."""
    lib = _load()
    if lib is None:
        c = (a @ b)
        c.data[:] = 1.0
        return c.tocsr()
    n, k = a.shape
    k2, m = b.shape
    assert k == k2
    a_ip, a_ix = _as_csr_idx(a.tocsr())
    b_ip, b_ix = _as_csr_idx(b.tocsr())
    counts = np.zeros(n, dtype=np.int64)
    lib.bool_spgemm_count_nt(ctypes.c_int64(n), ctypes.c_int64(m),
                             _p64(a_ip), _p32(a_ix), _p64(b_ip), _p32(b_ix),
                             _p64(counts), ctypes.c_int64(num_threads))
    c_indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=c_indptr[1:])
    c_indices = np.empty(c_indptr[-1], dtype=np.int32)
    lib.bool_spgemm_fill_nt(ctypes.c_int64(n), ctypes.c_int64(m),
                            _p64(a_ip), _p32(a_ix), _p64(b_ip), _p32(b_ix),
                            _p64(c_indptr), _p32(c_indices),
                            ctypes.c_int64(num_threads))
    data = np.ones(c_indptr[-1], dtype=np.float32)
    return sp.csr_matrix((data, c_indices, c_indptr), shape=(n, m))


def bool_subtract(a: sp.csr_matrix, b: sp.csr_matrix) -> sp.csr_matrix:
    """Set difference on CSR patterns: entries of A not present in B."""
    lib = _load()
    if lib is None:
        c = (a - a.multiply(b)).tocsr()
        c.eliminate_zeros()
        return c
    n, m = a.shape
    a_csr = a.tocsr()
    a_csr.sort_indices()
    b_csr = b.tocsr()
    b_csr.sort_indices()
    a_ip, a_ix = _as_csr_idx(a_csr)
    b_ip, b_ix = _as_csr_idx(b_csr)
    counts = np.zeros(n, dtype=np.int64)
    lib.bool_subtract_count(ctypes.c_int64(n), _p64(a_ip), _p32(a_ix),
                            _p64(b_ip), _p32(b_ix), _p64(counts))
    c_indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=c_indptr[1:])
    c_indices = np.empty(c_indptr[-1], dtype=np.int32)
    lib.bool_subtract_fill(ctypes.c_int64(n), _p64(a_ip), _p32(a_ix),
                           _p64(b_ip), _p32(b_ix), _p64(c_indptr),
                           _p32(c_indices))
    data = np.ones(c_indptr[-1], dtype=np.float32)
    return sp.csr_matrix((data, c_indices, c_indptr), shape=(n, m))


def nhood_split_fast(adj: sp.csr_matrix, nhood: int):
    """Native exact-hop split: [I, A₁ᵉˣ, A₂ᵉˣ, ...] — same output contract as
    :func:`h2gcn_tpu.sparse.transforms.nhood_split`."""
    n = adj.shape[0]
    a_plus_i = (adj + sp.eye(n, format="csr")).tocsr()
    a_plus_i.data[:] = 1.0
    mt = sp.eye(n, format="csr", dtype=np.float32)
    out = [mt]
    edge_sum = 0
    i = 0
    while i < nhood:
        prev = mt
        mt = bool_spgemm(mt, a_plus_i)
        new_edge_sum = mt.nnz
        if new_edge_sum == edge_sum:
            break
        edge_sum = new_edge_sum
        i += 1
        out.append(bool_subtract(mt, prev))
    return out


def rcm_order(adj: sp.spmatrix) -> np.ndarray:
    """Reverse Cuthill-McKee permutation of a symmetric adjacency pattern.

    Returns ``perm`` (int32[n]) such that ``A[perm][:, perm]`` has reduced
    bandwidth — the host-side clustering pass that makes the block-sparse
    (BSR) and COO-tile SpMM backends touch far fewer tiles on large graphs.
    Native single-pass BFS; scipy ``reverse_cuthill_mckee`` fallback.
    """
    csr = adj.tocsr()
    lib = _load()
    if lib is None or not hasattr(lib, "rcm_order"):
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        return np.asarray(
            reverse_cuthill_mckee(csr, symmetric_mode=True), dtype=np.int32)
    n = csr.shape[0]
    ip, ix = _as_csr_idx(csr)
    perm = np.empty(n, dtype=np.int32)
    lib.rcm_order(ctypes.c_int64(n), _p64(ip), _p32(ix), _p32(perm))
    return perm


def build_ell(adj: sp.csr_matrix):
    """Padded ELL neighbor table [n, dmax] + validity mask."""
    csr = adj.tocsr()
    n = csr.shape[0]
    degs = np.diff(csr.indptr)
    dmax = max(1, int(degs.max()))
    lib = _load()
    table = np.zeros((n, dmax), dtype=np.int32)
    valid = np.zeros((n, dmax), dtype=np.uint8)
    if lib is None:
        for i in range(n):
            nbrs = csr.indices[csr.indptr[i]:csr.indptr[i + 1]]
            table[i, : len(nbrs)] = nbrs
            valid[i, : len(nbrs)] = 1
    else:
        ip, ix = _as_csr_idx(csr)
        lib.build_ell(ctypes.c_int64(n), _p64(ip), _p32(ix),
                      ctypes.c_int64(dmax), _p32(table), _pu8(valid))
    return table, valid.astype(bool)
