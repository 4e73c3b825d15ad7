"""Native C++ graphops vs scipy oracles (skipped if no compiler)."""

import numpy as np
import pytest
import scipy.sparse as sp

from h2gcn_tpu import native
from h2gcn_tpu.sparse import transforms

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native graphops unavailable"
)


def _graph(n=500, density=0.01, seed=0):
    A = sp.random(n, n, density=density, random_state=seed, format="csr")
    A = ((A + A.T) > 0).astype(np.float32)
    A.setdiag(0)
    A.eliminate_zeros()
    return A


def test_bool_spgemm():
    A = _graph(300)
    B = _graph(300, seed=1)
    C = native.bool_spgemm(A, B)
    ref = (A @ B)
    ref.data[:] = 1.0
    assert (C != ref.tocsr()).nnz == 0
    assert set(np.unique(C.data)) == {1.0}


def test_bool_subtract():
    A = _graph(300)
    B = _graph(300, seed=2)
    C = native.bool_subtract(A, B)
    ref = (A - A.multiply(B)).tocsr()
    ref.eliminate_zeros()
    assert (C.astype(bool) != ref.astype(bool)).nnz == 0


def test_nhood_split_native_matches_scipy():
    A = _graph(400)
    ref = transforms.nhood_split(A, 3, use_native=False)
    fast = native.nhood_split_fast(A, 3)
    assert len(ref) == len(fast)
    for r, f in zip(ref, fast):
        assert (r.astype(bool) != f.astype(bool)).nnz == 0
        assert set(np.unique(f.data)) <= {1.0}


def test_build_ell():
    A = _graph(200)
    table, valid = native.build_ell(A)
    csr = A.tocsr()
    for i in range(200):
        nbrs = set(csr.indices[csr.indptr[i]:csr.indptr[i + 1]].tolist())
        got = set(table[i][valid[i]].tolist())
        assert got == nbrs


def test_rcm_order_matches_scipy_quality():
    A = _graph(600, density=0.01, seed=3)
    perm = native.rcm_order(A)
    assert sorted(perm.tolist()) == list(range(600))
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    ps = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))

    def bandwidth(p):
        Ap = A[p][:, p].tocoo()
        return int(np.abs(Ap.row - Ap.col).max())

    # same algorithm (min-degree seeds, degree-ordered BFS, reversed), so
    # the bandwidth should match scipy's to within a small slack from
    # tie-breaking
    assert bandwidth(perm) <= bandwidth(ps) * 1.05 + 2
