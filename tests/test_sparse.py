"""Sparse core: SpMM backends vs scipy, gradients, padding invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from h2gcn_tpu.sparse import SparseMatrix, spmm
from h2gcn_tpu.sparse.matrix import _spmm_segment


@pytest.fixture(scope="module")
def random_graph():
    rng = np.random.default_rng(0)
    n, f = 300, 20
    A = sp.random(n, n, density=0.02, random_state=1, format="csr").astype(
        np.float32
    )
    x = rng.standard_normal((n, f)).astype(np.float32)
    return A, x


@pytest.mark.parametrize("backend", ["segment", "dense"])
def test_spmm_matches_scipy(random_graph, backend):
    A, x = random_graph
    sm = SparseMatrix.from_scipy(A, backend=backend)
    y = np.asarray(spmm(sm, jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=1e-5, atol=1e-5)


def test_bsr_segment_equivalent(random_graph):
    # The BSR payload itself must reproduce the matrix; the Pallas kernel is
    # exercised on TPU (bench) — here we check BSR blocks reassemble A.
    A, x = random_graph
    sm = SparseMatrix.from_scipy(A, backend="bsr", block_size=128)
    bsr = sm.bsr
    B = bsr.block_size
    dense = np.zeros((bsr.n_row_blocks * B, bsr.n_col_blocks * B), np.float32)
    for blk, r, c in zip(
        np.asarray(bsr.blocks), np.asarray(bsr.block_rows), np.asarray(bsr.block_cols)
    ):
        dense[r * B:(r + 1) * B, c * B:(c + 1) * B] += blk
    np.testing.assert_allclose(dense[: A.shape[0], : A.shape[1]], A.toarray())
    # every row block present (kernel invariant)
    assert set(np.asarray(bsr.block_rows)) == set(range(bsr.n_row_blocks))
    # segment fallback on the same object
    y = np.asarray(_spmm_segment(sm, jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=1e-5, atol=1e-5)


def test_spmm_grad(random_graph):
    A, x = random_graph
    for backend in ["segment", "dense"]:
        sm = SparseMatrix.from_scipy(A, backend=backend)
        g = jax.grad(lambda xx: jnp.sum(spmm(sm, xx) ** 2))(jnp.asarray(x))
        gref = 2 * A.T @ (A @ x)
        np.testing.assert_allclose(np.asarray(g), gref, rtol=1e-4, atol=1e-4)


def test_symmetric_detection():
    A = sp.random(50, 50, density=0.1, random_state=3, format="csr")
    S = A + A.T
    assert SparseMatrix.from_scipy(S, backend="segment").symmetric
    assert not SparseMatrix.from_scipy(A, backend="segment").symmetric


def test_transpose_view(random_graph):
    A, x = random_graph
    sm = SparseMatrix.from_scipy(A, backend="segment")
    y = np.asarray(spmm(sm.transpose_view(), jnp.asarray(x)))
    np.testing.assert_allclose(y, A.T @ x, rtol=1e-5, atol=1e-5)


def test_padding_is_noop():
    A = sp.csr_matrix(np.array([[0, 1.0], [2.0, 0]], np.float32))
    sm = SparseMatrix.from_scipy(A, backend="segment")
    assert sm.nnz == 2
    assert sm.nnz_padded >= 1024  # bucket padding
    x = jnp.asarray(np.eye(2, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(spmm(sm, x)), A.toarray())


def test_todense(random_graph):
    A, _ = random_graph
    sm = SparseMatrix.from_scipy(A, backend="segment")
    np.testing.assert_allclose(np.asarray(sm.todense()), A.toarray())
    np.testing.assert_allclose(sm.to_scipy().toarray(), A.toarray())


def test_dense_backend_to_scipy_small_nnz():
    # regression: dense-backend matrices with tiny nnz must round-trip
    A = sp.eye(4, format="csr") * 2.0
    sm = SparseMatrix.from_scipy(A, backend="dense")
    assert sm.to_scipy().sum() == 8.0
    np.testing.assert_allclose(sm.to_scipy().toarray(), A.toarray())
