"""COO-tile SpMM backend (pallas_cootile.py): host prep + kernel semantics.

The kernel itself runs in Pallas interpret mode here (CPU test mesh); the
compiled TPU path is covered by tests/test_pallas_tpu.py's TPU-marked
cootile test and the large-graph bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from h2gcn_tpu.sparse import SparseMatrix, spmm
from h2gcn_tpu.sparse.pallas_cootile import (
    CooTile, build_cootile, cootile_spmm,
)


def _rand(n, m, density, seed, empty_row_band=None):
    a = sp.random(n, m, density=density, random_state=seed, format="csr",
                  dtype=np.float32)
    if empty_row_band is not None:
        lo, hi = empty_row_band
        mask = np.ones(n, bool)
        mask[lo:hi] = False
        d = sp.diags(mask.astype(np.float32))
        a = (d @ a).tocsr()
        a.eliminate_zeros()
    return a


def test_build_cootile_structure():
    a = _rand(300, 300, 0.02, 0)
    ct = build_cootile(a, tile=128, e_b=64)
    assert isinstance(ct, CooTile)
    total_edges = sum(int((np.asarray(s.vals) != 0).sum())
                      for s in ct.segments)
    assert total_edges == a.nnz
    # every tile row covered (fillers guarantee output init)
    covered = set()
    for s in ct.segments:
        covered.update((np.asarray(s.ctr) + s.rb_lo).tolist())
    assert covered == set(range(-(-300 // 128)))
    # chunk count multiple of 8 per segment
    for s in ct.segments:
        assert s.ctr.shape[0] % 8 == 0


@pytest.mark.parametrize("shape,density", [((300, 300), 0.02),
                                           ((257, 390), 0.01),
                                           ((64, 700), 0.05)])
def test_cootile_interpret_matches_scipy(shape, density):
    n, m = shape
    a = _rand(n, m, density, seed=n)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((m, 48)).astype(np.float32)
    ct = build_cootile(a, tile=128, e_b=64)
    y = np.asarray(cootile_spmm(ct, jnp.asarray(x), precision="highest",
                                interpret=True))
    np.testing.assert_allclose(y, a @ x, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kb", [16, 32])
def test_cootile_deep_blocks_match_scipy(kb):
    """kb-chunk grid-step blocks (auto-picked up to 32 by VMEM budget) pad
    every tile row's chunk list to a kb multiple and must stay exact."""
    a = _rand(700, 700, 0.015, kb)
    x = np.random.default_rng(kb).standard_normal((700, 32)).astype(np.float32)
    ct = build_cootile(a, tile=128, e_b=64, kb=kb)
    assert ct.kb == kb
    for s in ct.segments:
        assert s.ctr.shape[0] % kb == 0
    y = np.asarray(cootile_spmm(ct, jnp.asarray(x), precision="highest",
                                interpret=True))
    np.testing.assert_allclose(y, a @ x, rtol=1e-5, atol=1e-5)


def test_auto_kb_respects_vmem_budget():
    """f32 slot tiles are twice bf16's, so the same tile gets a shallower
    auto block. Budget is 18MB since r4 (the 250K ceiling probe measured
    every newly admitted deeper-kb corner faster: bf16 t512 kb64 +2.5%,
    f32 t512 kb32 +2%, bf16 t2048 kb16 +15% — docs/bench_cootile_ceiling
    .json + workbench probe log)."""
    a = _rand(4000, 4000, 0.002, 5)
    assert build_cootile(a, tile=512, e_b=128, dtype="bf16").kb == 64
    assert build_cootile(a, tile=512, e_b=128, dtype="f32").kb == 32
    assert build_cootile(a, tile=2048, e_b=128, dtype="bf16").kb == 16
    assert build_cootile(a, tile=2048, e_b=128, dtype="f32").kb == 8


def test_cootile_manual_dma_mode_matches_scipy(monkeypatch):
    """The experimental manual-DMA x delivery (in-kernel double-buffered
    async copies, _X_MODE='manual') must match the slot-operand default
    bit-for-contract: same f32 accumulation, same output."""
    import h2gcn_tpu.sparse.pallas_cootile as pc

    a = _rand(500, 500, 0.02, 21)
    x = np.random.default_rng(3).standard_normal((500, 48)).astype(np.float32)
    ct = build_cootile(a, tile=128, e_b=64)
    monkeypatch.setattr(pc, "_X_MODE", "manual")
    y = np.asarray(pc.cootile_spmm(ct, jnp.asarray(x), precision="highest",
                                   interpret=True))
    np.testing.assert_allclose(y, a @ x, rtol=1e-5, atol=1e-5)
    yb = np.asarray(pc.cootile_spmm(ct, jnp.asarray(x), precision="default",
                                    interpret=True))
    rel = np.abs(yb - a @ x).max() / np.abs(a @ x).max()
    assert rel < 2e-2


def test_cootile_empty_row_band_is_zero():
    a = _rand(400, 400, 0.02, 3, empty_row_band=(128, 256))
    x = np.random.default_rng(0).standard_normal((400, 16)).astype(np.float32)
    ct = build_cootile(a, tile=128, e_b=64)
    y = np.asarray(cootile_spmm(ct, jnp.asarray(x), precision="highest",
                                interpret=True))
    np.testing.assert_allclose(y[128:256], 0.0)
    np.testing.assert_allclose(y, a @ x, rtol=1e-5, atol=1e-5)


def test_sparsematrix_cootile_backend_cpu_fallback_and_grads():
    """On CPU the cootile backend reduces via the segment path (like BSR);
    gradients flow through the custom VJP with the transpose payload."""
    a = _rand(200, 200, 0.03, 7)
    sm = SparseMatrix.from_scipy(a, backend="cootile")
    assert sm.backend == "cootile" and sm.coot is not None
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((200, 8)).astype(np.float32))
    y = jax.jit(spmm)(sm, x)
    np.testing.assert_allclose(np.asarray(y), a @ np.asarray(x),
                               rtol=1e-5, atol=1e-5)
    g = jax.grad(lambda xx: jnp.sum(spmm(sm, xx) ** 2))(x)
    g_ref = 2 * a.T @ (a @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-4, atol=1e-4)


def test_cootile_segmentation_respects_row_boundaries(monkeypatch):
    import h2gcn_tpu.sparse.pallas_cootile as pc

    monkeypatch.setattr(pc, "_MAX_CHUNKS", 16)
    a = _rand(1000, 1000, 0.02, 5)
    ct = pc.build_cootile(a, tile=128, e_b=32)
    assert len(ct.segments) > 1
    spans = [(s.rb_lo, s.rb_hi) for s in ct.segments]
    # disjoint, contiguous, ordered row coverage
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 == l2
    assert spans[0][0] == 0 and spans[-1][1] == -(-1000 // 128)
    x = np.random.default_rng(4).standard_normal((1000, 16)).astype(np.float32)
    y = np.asarray(pc.cootile_spmm(ct, jnp.asarray(x), precision="highest",
                                   interpret=True))
    np.testing.assert_allclose(y, a @ x, rtol=1e-5, atol=1e-5)


def test_auto_e_b_shrinks_on_hyper_sparse_and_stays_correct():
    """e_b=None sizes the chunk from mean edges per visited tile: a
    hyper-sparse scatter (~few edges/tile) gets the 128 floor, a dense-ish
    tile pattern keeps 512 — and both produce correct products."""
    from h2gcn_tpu.sparse.pallas_cootile import build_chunk_tables

    hyper = _rand(4000, 4000, 0.0005, 11)  # ~8K edges over ~1K tiles @128
    *_, e_b_hyper = build_chunk_tables(hyper, tile=128, e_b=None)
    assert e_b_hyper == 128
    dense_tiles = _rand(256, 256, 0.5, 12)  # ~8K edges/tile @128
    *_, e_b_dense = build_chunk_tables(dense_tiles, tile=128, e_b=None)
    assert e_b_dense == 512

    x = np.random.default_rng(6).standard_normal((4000, 24)).astype(np.float32)
    ct = build_cootile(hyper, tile=128, e_b=None)
    assert ct.e_b == 128
    y = np.asarray(cootile_spmm(ct, jnp.asarray(x), precision="highest",
                                interpret=True))
    np.testing.assert_allclose(y, hyper @ x, rtol=1e-5, atol=1e-5)


def test_auto_backend_prefers_cootile_when_bsr_payload_explodes():
    """auto heuristic (accelerator ladder): a large scattered matrix whose
    128-block payload would exceed the budget routes to cootile instead of
    bsr; and on CPU hosts auto resolves to segment regardless."""
    from h2gcn_tpu.sparse.matrix import _auto_backend

    rng = np.random.default_rng(9)
    n = 40_000
    # ~1.1M random edges: nearly every edge lands in its own 128-block ->
    # payload ~ 1M * 64KB >> 4GB budget
    r = rng.integers(0, n, 1_100_000)
    c = rng.integers(0, n, 1_100_000)
    a = sp.csr_matrix((np.ones(len(r), np.float32), (r, c)), shape=(n, n))
    coo = a.tocoo()
    assert _auto_backend(n, n, coo.nnz, coo, 128, platform="tpu") == "cootile"
    assert _auto_backend(2000, 2000, 4000, None, 128,
                         platform="tpu") == "dense"
    assert _auto_backend(n, n, coo.nnz, coo, 128, platform="cpu") == "segment"
    sm = SparseMatrix.from_scipy(a, backend="cootile", build_transpose=False)
    assert sm.backend == "cootile"
    assert sm.coot is not None


def test_auto_geometry_two_roof_model():
    """auto_geometry decouples T (HBM amortization) from e_b (MXU padding).

    Compute-bound saturated case (small n, nnz >> grid): MXU cost grows
    with T, so the model takes the smallest tile and chunk. Grid-collapse
    case (mid n, scattered edges): at T=2048 the whole grid holds fewer
    tiles than there are edge-tiles at T=256, so the per-visited-tile
    x-read traffic collapses and the model takes the large tile.
    """
    from h2gcn_tpu.sparse.pallas_cootile import auto_geometry

    rng = np.random.default_rng(0)
    n = 4096
    r = rng.integers(0, n, 400_000)
    c = rng.integers(0, n, 400_000)
    sat = sp.csr_matrix((np.ones(len(r), np.float32), (r, c)), shape=(n, n))
    sat.sum_duplicates()
    # compute-bound: smallest tile; dense tiles: big chunks (the per-chunk
    # overhead term penalizes padding-light tiny chunks too); small tile
    # leaves VMEM room for the deepest 64-chunk block (kb=64 entered the
    # candidate grid in r4 after the 250K ceiling probe measured it +2.5%
    # over kb=32 — docs/bench_cootile_ceiling.json)
    assert auto_geometry(sat, dtype="bf16") == (256, 512, 64)

    n2 = 100_000
    r2 = rng.integers(0, n2, 30_000)
    c2 = rng.integers(0, n2, 30_000)
    hyp = sp.csr_matrix((np.ones(len(r2), np.float32), (r2, c2)),
                        shape=(n2, n2))
    t, e_b, kb = auto_geometry(hyp, dtype="bf16")
    assert t == 2048 and e_b == 128
    # a 2048-tile's bf16 slot operands only fit an 8-chunk block in VMEM
    assert kb == 8


def test_build_cootile_auto_geometry_correct():
    """tile=None routes through auto_geometry and the product still
    matches scipy at every geometry the model can pick."""
    a = _rand(700, 900, 0.01, 3)
    x = np.random.default_rng(5).standard_normal((900, 64)).astype(np.float32)
    ct = build_cootile(a)  # full auto
    y = np.asarray(cootile_spmm(ct, jnp.asarray(x), precision="highest",
                                interpret=True))
    np.testing.assert_allclose(y, a @ x, rtol=1e-5, atol=1e-5)


def test_bf16_x_cast_accuracy():
    """precision='default' stores the x tiles in bf16 (half the dominant
    HBM traffic); accumulation stays f32, so the relative error is the
    bf16 mantissa's, not worse."""
    a = _rand(700, 900, 0.01, 7)
    x = np.random.default_rng(8).standard_normal((900, 64)).astype(np.float32)
    ct = build_cootile(a, tile=256, e_b=128)
    ref = a @ x
    yb = np.asarray(cootile_spmm(ct, jnp.asarray(x), precision="default",
                                 interpret=True))
    rel = np.abs(yb - ref).max() / np.abs(ref).max()
    assert rel < 2e-2


def test_exact_mode_split3_f32_fidelity():
    """precision='highest' runs 3 bf16 MXU passes with the one-hot operand
    exact in bf16 — the result must sit at f32 rounding distance from a
    float64 oracle, same as a plain f32 matmul would."""
    rng = np.random.default_rng(0)
    a = sp.random(1000, 1200, density=0.02, random_state=1, format="csr",
                  dtype=np.float32)
    a.data[:] = rng.standard_normal(a.nnz).astype(np.float32)
    x = (rng.standard_normal((1200, 64)) * 100).astype(np.float32)
    ref64 = a.astype(np.float64) @ x.astype(np.float64)
    ct = build_cootile(a, tile=256, e_b=128)
    y = np.asarray(cootile_spmm(ct, jnp.asarray(x), precision="highest",
                                interpret=True))
    rel = np.abs(y - ref64).max() / np.abs(ref64).max()
    assert rel < 5e-7
