"""Host graph transforms vs dense-numpy oracles (reference semantics)."""

import numpy as np
import scipy.sparse as sp

from h2gcn_tpu.sparse import transforms
from h2gcn_tpu.sparse.transforms import NType


def _graph(n=80, density=0.08, seed=2):
    A = sp.random(n, n, density=density, random_state=seed, format="csr")
    A = ((A + A.T) > 0).astype(np.float32)
    A.setdiag(0)
    A.eliminate_zeros()
    return A


def test_sym_normalize_zero_degree_guard():
    A = _graph()
    A = A.tolil()
    A[0, :] = 0
    A[:, 0] = 0
    A = A.tocsr()
    An = transforms.normalize(A, NType.SYM_NORMALIZED).toarray()
    Ad = A.toarray()
    deg = Ad.sum(1)
    d = np.where(deg > 0, deg ** -0.5, 0.0)
    np.testing.assert_allclose(An, d[:, None] * Ad * d[None, :], atol=1e-6)


def test_rw_normalize():
    A = _graph()
    An = transforms.normalize(A, NType.RW_NORMALIZED).toarray()
    Ad = A.toarray()
    deg = Ad.sum(1)
    d = np.where(deg > 0, 1.0 / deg, 0.0)
    np.testing.assert_allclose(An, d[:, None] * Ad, atol=1e-6)


def test_add_remove_eye():
    A = _graph()
    assert transforms.add_eye(A).diagonal().sum() == A.shape[0]
    assert transforms.remove_eye(transforms.add_eye(A)).diagonal().sum() == 0


def test_nhood_split_exact_hops():
    A = _graph()
    n = A.shape[0]
    hops = transforms.nhood_split(A, 2)
    assert len(hops) == 3
    Ad = A.toarray() + np.eye(n)
    r1 = (Ad > 0).astype(float)
    r2 = (Ad @ Ad > 0).astype(float)
    np.testing.assert_allclose(hops[0].toarray(), np.eye(n))
    np.testing.assert_allclose(hops[1].toarray(), r1 - np.eye(n))
    np.testing.assert_allclose(hops[2].toarray(), r2 - r1)


def test_nhood_split_early_termination():
    # a complete graph saturates after 1 hop
    A = sp.csr_matrix(np.ones((5, 5), np.float32) - np.eye(5, dtype=np.float32))
    hops = transforms.nhood_split(A, 5)
    assert len(hops) == 2  # [I, A1] then no growth


def test_row_normalize():
    F = sp.csr_matrix(np.array([[1, 1, 2.0], [0, 0, 0], [3, 0, 1]], np.float32))
    Fn = transforms.row_normalize(F).toarray()
    np.testing.assert_allclose(Fn.sum(1), [1.0, 0.0, 1.0], atol=1e-6)


def test_chebyshev_fixed_eigenvalue():
    A = _graph(n=40)
    t = transforms.chebyshev_polynomials(A, 2, eigenvalue=2)
    assert len(t) == 3
    n = A.shape[0]
    lap = np.eye(n) - transforms.normalize(A, NType.SYM_NORMALIZED).toarray()
    scaled = lap - np.eye(n)  # (2/2)*L - I
    np.testing.assert_allclose(t[1].toarray(), scaled, atol=1e-5)
    np.testing.assert_allclose(
        t[2].toarray(), 2 * scaled @ scaled - np.eye(n), atol=1e-4
    )


def _zipf_graph(n=4000, m=12000, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = (rng.zipf(1.6, m) - 1) % n
    A = sp.coo_matrix(
        (np.ones(2 * m), (np.r_[src, dst], np.r_[dst, src])), shape=(n, n)
    ).tocsr()
    A.setdiag(0)
    A.eliminate_zeros()
    A.data[:] = 1
    return A


def _count_tiles(M, perm, tile=512):
    Mp = M[perm][:, perm].tocoo()
    ncb = -(-M.shape[1] // tile)
    return np.unique((Mp.row // tile).astype(np.int64) * ncb
                     + Mp.col // tile).size


def test_cluster_order_is_permutation_and_reduces_tiles():
    A = _zipf_graph()
    n = A.shape[0]
    perm = transforms.cluster_order(A, method="cluster")
    assert sorted(perm.tolist()) == list(range(n))
    natural = np.arange(n)
    # hub extraction + residual RCM must concentrate the zipf tail's edges
    # into strictly fewer feature tiles than the natural order
    assert _count_tiles(A, perm) < _count_tiles(A, natural)


def test_cluster_order_rcm_method_and_permute_graph():
    A = _zipf_graph(n=500, m=1500, seed=1)
    perm = transforms.cluster_order(A, method="rcm")
    assert sorted(perm.tolist()) == list(range(500))
    Ap = transforms.permute_graph(A, perm)
    # P A Pᵀ: entry (i, j) of the permuted matrix equals (perm[i], perm[j])
    dense, pdense = A.toarray(), Ap.toarray()
    assert (pdense == dense[np.ix_(perm, perm)]).all()


def test_chebyshev_arpack_fallback(monkeypatch):
    """ARPACK non-convergence (seen on citeseer's near-bipartite components)
    falls back to the eigenvalue-2 bound instead of crashing."""
    import warnings

    import scipy.sparse as sp
    import scipy.sparse.linalg as ssl

    def boom(*a, **k):
        raise ssl.ArpackNoConvergence("no convergence", np.empty(0),
                                      np.empty((0, 0)))

    monkeypatch.setattr(ssl, "eigsh", boom)
    A = sp.csr_matrix(np.array([[0, 1], [1, 0]], np.float32))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t = transforms.chebyshev_polynomials(A, 2, eigenvalue=None)
    assert any("ARPACK" in str(x.message) for x in w)
    ref = transforms.chebyshev_polynomials(A, 2, eigenvalue=2)
    for a, b in zip(t, ref):
        assert abs(a.tocsr() - b.tocsr()).max() == 0
