"""Gather-based fused attention (sparse/pallas_attention_gather.py):
forward + gradients against a dense softmax oracle, multi-segment
splitting, and coefficient materialization. Kernel correctness runs in
interpret mode (CPU-forced by conftest)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from h2gcn_tpu.sparse.pallas_attention_gather import (
    build_gatherattn, gat_attention_gather, gather_attention_coefficients)


def _rand_support(n, deg, seed=0):
    rng = np.random.default_rng(seed)
    r = np.repeat(np.arange(n), deg)
    c = rng.integers(0, n, n * deg)
    a = sp.csr_matrix((np.ones(n * deg, np.float32), (r, c)), shape=(n, n))
    a = a + sp.eye(n, format="csr", dtype=np.float32)  # self loops
    a.sum_duplicates()
    return a


def _dense_oracle(a, f1, f2, h, num_heads, feat, slope=0.2):
    """Reference softmax attention on the dense mask (same math as
    baselines/GAT/utils/layers.py:53-100)."""
    mask = np.asarray(a.todense()) > 0
    outs = []
    for k in range(num_heads):
        e = f1[:, k][:, None] + f2[:, k][None, :]
        e = jnp.where(e >= 0, e, slope * e)
        e = jnp.where(mask, e, -1e30)
        alpha = jax.nn.softmax(e, axis=1)
        alpha = jnp.where(mask, alpha, 0.0)
        outs.append(alpha @ h[:, k * feat:(k + 1) * feat])
    return jnp.concatenate(outs, axis=1)


@pytest.mark.parametrize("heads,feat", [(4, 8), (1, 16), (8, 16)])
def test_gather_attention_matches_dense_oracle(heads, feat):
    n = 300
    a = _rand_support(n, 4, seed=1)
    ga = build_gatherattn(a, tile=64, e_b=32, kb=2)
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal((n, heads)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((n, heads)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((n, heads * feat)), jnp.float32)
    out = gat_attention_gather(ga, f1, f2, h, num_heads=heads, feat=feat,
                               n_out=n, interpret=True)
    ref = _dense_oracle(a, f1, f2, h, heads, feat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("heads,feat", [
    (2, 8),    # hf1 = 18 — single 128-lane tile in the augmented layout
    (4, 32),   # hf = 128 exactly; hf1 = 132 crosses into a second tile
])
def test_gather_attention_gradients_match_dense_oracle(heads, feat):
    n = 200
    a = _rand_support(n, 3, seed=2)
    ga = build_gatherattn(a, tile=64, e_b=32, kb=2)
    rng = np.random.default_rng(1)
    f1 = jnp.asarray(rng.standard_normal((n, heads)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((n, heads)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((n, heads * feat)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((n, heads * feat)), jnp.float32)

    def loss_gather(f1, f2, h):
        out = gat_attention_gather(ga, f1, f2, h, num_heads=heads,
                                   feat=feat, n_out=n, interpret=True)
        return jnp.sum(out * tgt)

    def loss_dense(f1, f2, h):
        return jnp.sum(_dense_oracle(a, f1, f2, h, heads, feat) * tgt)

    g1 = jax.grad(loss_gather, argnums=(0, 1, 2))(f1, f2, h)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(f1, f2, h)
    for got, want, name in zip(g1, g2, ("df1", "df2", "dh")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_gather_attention_rectangular_support():
    """Rectangular supports (n dest rows × m source rows) — the shape of a
    distributed dest-stripe shard attending over [local | halo] sources —
    match the dense oracle in forward AND all three gradients."""
    n, m, heads, feat = 96, 288, 2, 8
    rng = np.random.default_rng(5)
    r = np.repeat(np.arange(n), 4)
    c = rng.integers(0, m, n * 4)
    a = sp.csr_matrix((np.ones(n * 4, np.float32), (r, c)), shape=(n, m))
    a.sum_duplicates()
    ga = build_gatherattn(a, tile=64, e_b=32, kb=2)
    assert ga.num_src == m and ga.n == n
    f1 = jnp.asarray(rng.standard_normal((n, heads)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((m, heads)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((m, heads * feat)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((n, heads * feat)), jnp.float32)

    out = gat_attention_gather(ga, f1, f2, h, num_heads=heads, feat=feat,
                               n_out=n, interpret=True)
    ref = _dense_oracle(a, f1, f2, h, heads, feat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_gather(f1, f2, h):
        o = gat_attention_gather(ga, f1, f2, h, num_heads=heads, feat=feat,
                                 n_out=n, interpret=True)
        return jnp.sum(o * tgt)

    def loss_dense(f1, f2, h):
        return jnp.sum(_dense_oracle(a, f1, f2, h, heads, feat) * tgt)

    g1 = jax.grad(loss_gather, argnums=(0, 1, 2))(f1, f2, h)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(f1, f2, h)
    assert g1[1].shape == (m, heads) and g1[2].shape == (m, heads * feat)
    for got, want, name in zip(g1, g2, ("df1", "df2", "dh")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_gather_attention_multi_segment():
    """Tables split across segments (tiny step cap) still agree."""
    import h2gcn_tpu.sparse.pallas_gscatter as gsm

    n, heads, feat = 400, 2, 8
    a = _rand_support(n, 5, seed=3)
    old = gsm._MAX_STEPS
    gsm._MAX_STEPS = 2
    try:
        ga = build_gatherattn(a, tile=64, e_b=32, kb=2)
    finally:
        gsm._MAX_STEPS = old
    assert len(ga.fwd.segments) > 1 and len(ga.bwd.segments) > 1
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal((n, heads)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((n, heads)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((n, heads * feat)), jnp.float32)
    out = gat_attention_gather(ga, f1, f2, h, num_heads=heads, feat=feat,
                               n_out=n, interpret=True)
    ref = _dense_oracle(a, f1, f2, h, heads, feat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gather_attention_coefficients_and_dropout():
    n, heads, feat = 150, 2, 4
    a = _rand_support(n, 3, seed=4)
    ga = build_gatherattn(a, tile=64, e_b=32, kb=2)
    rng = np.random.default_rng(2)
    f1 = jnp.asarray(rng.standard_normal((n, heads)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((n, heads)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((n, heads * feat)), jnp.float32)
    # coefficients sum to 1 per destination row
    alpha = gather_attention_coefficients(ga, f1, f2)
    sums = jax.ops.segment_sum(alpha, ga.rows, num_segments=n,
                               indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(sums), 1.0, rtol=1e-5)
    # attn dropout: E[out] == out undropped (sanity: rate 0 is identity,
    # rate>0 changes the output deterministically under a fixed key)
    out0 = gat_attention_gather(ga, f1, f2, h, num_heads=heads, feat=feat,
                                n_out=n, interpret=True, attn_drop=0.0,
                                drop_key=jax.random.PRNGKey(0))
    ref = _dense_oracle(a, f1, f2, h, heads, feat)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    outd = gat_attention_gather(ga, f1, f2, h, num_heads=heads, feat=feat,
                                n_out=n, interpret=True, attn_drop=0.5,
                                drop_key=jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(outd), np.asarray(out0))


def test_gather_attention_dropout_gradients_match_segment_oracle():
    """Gradients THROUGH attention dropout: the whole-attention VJP masks
    the numerator (q·m) but not the denominator (q) — verify df1/df2/dh
    against JAX autodiff of a segment-op reference using the same mask
    (reference semantics: dropout on softmaxed coefficients,
    baselines/GAT/utils/layers.py:53-100)."""
    n, heads, feat, rate = 180, 2, 8, 0.4
    a = _rand_support(n, 3, seed=7)
    ga = build_gatherattn(a, tile=64, e_b=32, kb=2)
    rng = np.random.default_rng(4)
    f1 = jnp.asarray(rng.standard_normal((n, heads)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((n, heads)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((n, heads * feat)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((n, heads * feat)), jnp.float32)
    key = jax.random.PRNGKey(3)
    # regenerate the exact mask gat_attention_gather derives from the key
    keep = jax.random.bernoulli(key, 1.0 - rate, (ga.num_edges, heads))
    m = jnp.where(keep, 1.0 / (1.0 - rate), 0.0)
    rows, cols = ga.rows, ga.cols

    def loss_gather(f1, f2, h):
        out = gat_attention_gather(ga, f1, f2, h, num_heads=heads,
                                   feat=feat, n_out=n, interpret=True,
                                   attn_drop=rate, drop_key=key)
        return jnp.sum(out * tgt)

    def loss_segment(f1, f2, h):
        logit = f1[rows] + f2[cols]
        logit = jnp.where(logit >= 0, logit, 0.2 * logit)
        mx = jax.ops.segment_max(logit, rows, num_segments=n,
                                 indices_are_sorted=True)
        p = jnp.exp(logit - jax.lax.stop_gradient(mx)[rows])
        l = jax.ops.segment_sum(p, rows, num_segments=n,
                                indices_are_sorted=True)
        alpha = (p / l[rows]) * m                       # dropout AFTER softmax
        h3 = h.reshape(n, heads, feat)
        contrib = alpha[:, :, None] * h3[cols]
        out = jax.ops.segment_sum(contrib, rows, num_segments=n,
                                  indices_are_sorted=True)
        return jnp.sum(out.reshape(n, heads * feat) * tgt)

    g1 = jax.grad(loss_gather, argnums=(0, 1, 2))(f1, f2, h)
    g2 = jax.grad(loss_segment, argnums=(0, 1, 2))(f1, f2, h)
    for got, want, name in zip(g1, g2, ("df1", "df2", "dh")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_gather_attention_bf16_mode_close():
    n, heads, feat = 256, 4, 8
    a = _rand_support(n, 4, seed=5)
    ga = build_gatherattn(a, tile=64, e_b=32, kb=2)
    rng = np.random.default_rng(3)
    f1 = jnp.asarray(rng.standard_normal((n, heads)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((n, heads)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((n, heads * feat)), jnp.float32)
    hi = gat_attention_gather(ga, f1, f2, h, num_heads=heads, feat=feat,
                              n_out=n, interpret=True, precision="highest")
    lo = gat_attention_gather(ga, f1, f2, h, num_heads=heads, feat=feat,
                              n_out=n, interpret=True, precision="default")
    err = np.abs(np.asarray(hi) - np.asarray(lo)).max() / np.abs(
        np.asarray(hi)).max()
    assert err < 2e-2, err


def test_gather_capture_matches_unfused():
    """Coefficient capture through the fused gather path == the unfused
    segment path's per-head alphas (first nnz entries; the segment arrays
    carry a padding tail)."""
    from h2gcn_tpu.models.GAT import GATNetwork
    from h2gcn_tpu.sparse import SparseMatrix

    n = 200
    rng = np.random.default_rng(6)
    r = rng.integers(0, n, 800)
    c = rng.integers(0, n, 800)
    a = sp.csr_matrix((np.ones(800, np.float32), (r, c)), shape=(n, n))
    a = ((a + a.T + sp.eye(n)) > 0).astype(np.float32)
    adj_ga = SparseMatrix.from_scipy(a.tocsr(), backend="attn",
                                     attn_impl="gather")
    adj_seg = SparseMatrix.from_scipy(a.tocsr(), backend="segment")

    model = GATNetwork(5, hid_units=[8], n_heads=[3, 1],
                       fused_attention=True, attn_drop=0.0)
    params = model.init(jax.random.PRNGKey(0), 12, 1)
    x = jnp.asarray(rng.normal(size=(n, 12)), jnp.float32)

    cap_f = {}
    model.apply(params, adj_ga, x, [], training=False, capture=cap_f)
    alphas_f = model.last_attn_coefs  # list of [H, E]
    model.fused_attention = False
    cap_u = {}
    model.apply(params, adj_seg, x, [], training=False, capture=cap_u)
    alphas_u = model.last_attn_coefs  # list of [H, E_pad]

    nnz = adj_ga.nnz
    assert len(alphas_f) == len(alphas_u) == 2
    for af, au in zip(alphas_f, alphas_u):
        np.testing.assert_allclose(np.asarray(af), np.asarray(au)[:, :nnz],
                                   rtol=1e-5, atol=1e-6)
    for k in cap_u:
        np.testing.assert_allclose(np.asarray(cap_f[k]), np.asarray(cap_u[k]),
                                   rtol=1e-4, atol=1e-5)
