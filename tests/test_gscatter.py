"""Gather-scatter SpMM backend (sparse/pallas_gscatter.py): the
ultra-sparse regime kernel (XLA edge-major gather + one-hot MXU scatter).
Kernel correctness runs in interpret mode; routing/plumbing through
SparseMatrix is host-side."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from h2gcn_tpu.sparse import SparseMatrix
from h2gcn_tpu.sparse.pallas_gscatter import build_gscatter, gscatter_spmm


def _rand(n, nnz, seed=0, square=True, weighted=True):
    rng = np.random.default_rng(seed)
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    v = (rng.random(nnz).astype(np.float32) + 0.5 if weighted
         else np.ones(nnz, np.float32))
    a = sp.csr_matrix((v, (r, c)), shape=(n, n))
    a.sum_duplicates()
    return a


@pytest.mark.parametrize("prec,tol", [("highest", 1e-5), ("default", 2e-2)])
def test_gscatter_matches_scipy(prec, tol):
    a = _rand(700, 3000, seed=1)
    gs = build_gscatter(a, tile=128, e_b=32, kb=4)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((700, 48)).astype(np.float32)
    out = np.asarray(gscatter_spmm(gs, jnp.asarray(x), precision=prec,
                                   interpret=True))
    ref = a @ x
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < tol, err


def test_gscatter_segments_and_empty_rows():
    """Multi-segment splitting (tiny step cap) + rows with no edges."""
    import h2gcn_tpu.sparse.pallas_gscatter as gsm

    a = _rand(600, 900, seed=2)
    a = a.tolil()
    a[100:140, :] = 0  # a fully empty stretch of rows
    a = a.tocsr()
    a.eliminate_zeros()
    old = gsm._MAX_STEPS
    gsm._MAX_STEPS = 2
    try:
        gs = build_gscatter(a, tile=64, e_b=32, kb=2)
    finally:
        gsm._MAX_STEPS = old
    assert len(gs.segments) > 1
    # uniform step counts: one compiled kernel serves every segment
    assert len({int(s.ctr.shape[0]) for s in gs.segments}) == 1
    x = np.random.default_rng(0).standard_normal((600, 32)).astype(np.float32)
    out = np.asarray(gscatter_spmm(gs, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, a @ x, rtol=1e-4, atol=1e-5)


def test_gscatter_megahub_overflow_bounds_buffer():
    """A single tile row spanning more than _MAX_STEPS grid steps (a
    mega-hub destination stripe) is split into overflow levels: NO
    segment — main or overflow — exceeds the step cap, no warning fires,
    and the summed result is exact (VERDICT r4 weak #6)."""
    import warnings as _warnings

    import h2gcn_tpu.sparse.pallas_gscatter as gsm

    # all edges in the LAST tile row: 300 edges / (e_b=32 * kb=2) = 5 steps
    n = 128
    rng = np.random.default_rng(4)
    r = rng.integers(64, 128, 300)  # tile=64 -> tile row 1 only
    c = rng.integers(0, n, 300)
    a = sp.csr_matrix((np.ones(300, np.float32), (r, c)), shape=(n, n))
    a.sum_duplicates()
    old = gsm._MAX_STEPS
    gsm._MAX_STEPS = 2
    try:
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")  # any warning -> failure
            gs = build_gscatter(a, tile=64, e_b=32, kb=2)
        assert gs.overflow, "mega-hub row must spill into overflow levels"
        assert gs.max_segment_steps <= 2  # the bound HOLDS everywhere
    finally:
        gsm._MAX_STEPS = old
    x = np.random.default_rng(0).standard_normal((n, 16)).astype(np.float32)
    out = np.asarray(gscatter_spmm(gs, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, a @ x, rtol=1e-4, atol=1e-5)


def test_gatherattn_slots_path_keeps_warning_fallback():
    """The attention payload (return_slots=True) needs ONE global slot
    space, so it cannot overflow-split; it falls back to the over-long
    segment and warns."""
    import h2gcn_tpu.sparse.pallas_gscatter as gsm
    from h2gcn_tpu.sparse.pallas_gscatter import build_gscatter_coo

    n = 128
    rng = np.random.default_rng(4)
    r = rng.integers(64, 128, 300)
    c = rng.integers(0, n, 300)
    old = gsm._MAX_STEPS
    gsm._MAX_STEPS = 2
    try:
        with pytest.warns(UserWarning, match="segment buffer bound"):
            gs, slots = build_gscatter_coo(
                r, c, np.ones(300, np.float32), (n, n), tile=64, e_b=32,
                kb=2, return_slots=True)
    finally:
        gsm._MAX_STEPS = old
    assert not gs.overflow
    assert len(slots) == 300


def test_gscatter_sparsematrix_plumbing():
    """backend='gscatter' builds payloads (incl. the transpose for the
    VJP) and the CPU dispatch falls back to the segment path with
    identical results."""
    a = _rand(500, 1500, seed=3)
    m = SparseMatrix.from_scipy(a, backend="gscatter")
    assert m.gsc is not None
    assert m.symmetric or m.gsc_t is not None
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((500, 16)), jnp.float32)
    from h2gcn_tpu.sparse.matrix import spmm

    out = spmm(m, x)  # CPU → segment fallback
    np.testing.assert_allclose(np.asarray(out), a @ np.asarray(x),
                               rtol=1e-4, atol=1e-5)
    # VJP transpose view carries the transpose payload
    t = m.transpose_view()
    assert t.gsc is not None or m.symmetric


def test_auto_backend_ultra_sparse_ladder():
    """Measured-crossover routing (1M-regime calibration,
    docs/bench_large_1m*.json): >=32 nnz/occupied-512-tile -> cootile;
    4-32 -> gscatter for exact / cootile for bf16; <4 -> segment (every
    tile path drowns in per-tile fixed cost)."""
    from h2gcn_tpu.sparse.matrix import _auto_backend

    rng = np.random.default_rng(0)

    def mk(n, nnz):
        return sp.coo_matrix(
            (np.ones(nnz, np.float32),
             (rng.integers(0, n, nnz), rng.integers(0, n, nnz))),
            shape=(n, n))

    # ~1 nnz per occupied tile: nothing-per-tile -> segment
    coo = mk(2_000_000, 4_000_000)
    assert _auto_backend(2_000_000, 2_000_000, 4_000_000, coo, 128,
                         platform="tpu") == "segment"
    # ~10 nnz per occupied tile (the 1M powerlaw hop2 regime):
    # exact -> gscatter, bf16 -> cootile
    n, nnz = 500_000, 10_000_000
    coo = mk(n, nnz)
    assert _auto_backend(n, n, nnz, coo, 128, platform="tpu",
                         precision="highest") == "gscatter"
    assert _auto_backend(n, n, nnz, coo, 128, platform="tpu",
                         precision="default") == "cootile"


def test_auto_backend_bsr_niche():
    """Measured BSR niche (docs/bench_bsr_niche.json): feasible dense-block
    payload + block occupancy past the precision-dependent crossover ->
    bsr; below the bf16 crossover the same matrix routes to cootile."""
    from h2gcn_tpu.sparse.matrix import _auto_backend

    rng = np.random.default_rng(0)
    # perfectly block-clustered matrix: 300 dense-ish 128-blocks on the
    # diagonal of a 64K-node graph, ~1000 nnz per block (the p_in=1.0 SBM
    # regime after cluster reorder)
    n = 64_000
    nb = 300
    per = 1000
    bi = rng.integers(0, nb, nb * per)
    r = bi * 128 + rng.integers(0, 128, nb * per)
    c = bi * 128 + rng.integers(0, 128, nb * per)
    coo = sp.coo_matrix((np.ones(len(r), np.float32), (r, c)), shape=(n, n))
    coo.sum_duplicates()
    coo = coo.tocoo()
    assert _auto_backend(n, n, coo.nnz, coo, 128, platform="tpu",
                         precision="highest") == "bsr"
    assert _auto_backend(n, n, coo.nnz, coo, 128, platform="tpu",
                         precision="default") == "bsr"
    # dilute to ~100 nnz/block: f32 keeps bsr, bf16 crosses to cootile
    keep = rng.random(coo.nnz) < 0.105
    coo2 = sp.coo_matrix((coo.data[keep], (coo.row[keep], coo.col[keep])),
                         shape=(n, n))
    occ = coo2.nnz / np.unique(
        (coo2.row // 128).astype(np.int64) * (-(-n // 128))
        + coo2.col // 128).size
    assert 90 <= occ < 250, occ
    assert _auto_backend(n, n, coo2.nnz, coo2, 128, platform="tpu",
                         precision="highest") == "bsr"
    assert _auto_backend(n, n, coo2.nnz, coo2, 128, platform="tpu",
                         precision="default") == "cootile"
