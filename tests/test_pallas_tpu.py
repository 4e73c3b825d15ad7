"""Pallas BSR SpMM correctness on real TPU hardware.

Skipped under the CPU-forced test config; run manually on a TPU host with
``JAX_PLATFORMS= python -m pytest tests/test_pallas_tpu.py --no-header -q``
(these tests re-check what bench.py exercises implicitly).
"""

import jax
import numpy as np
import pytest
import scipy.sparse as sp

pytestmark = pytest.mark.tpu


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


@pytest.mark.skipif(not _on_tpu(), reason="requires TPU")
@pytest.mark.parametrize("payload_dtype", ["float32", "bfloat16"])
def test_bsr_spmm_tpu(payload_dtype):
    import jax.numpy as jnp

    from h2gcn_tpu.sparse import SparseMatrix, spmm

    A = sp.random(1500, 1500, density=0.01, random_state=0,
                  format="csr").astype(np.float32)
    x = np.random.default_rng(0).standard_normal((1500, 96)).astype(np.float32)
    sm = SparseMatrix.from_scipy(
        A, backend="bsr", payload_dtype=payload_dtype,
        precision="highest" if payload_dtype == "float32" else "default",
    )
    y = np.asarray(spmm(sm, jnp.asarray(x)))
    ref = A @ x
    tol = 1e-4 if payload_dtype == "float32" else 3e-2
    np.testing.assert_allclose(y, ref, rtol=tol, atol=tol)

    g = jax.grad(lambda xx: jnp.sum(spmm(sm, xx) ** 2))(jnp.asarray(x))
    gref = 2 * A.T @ (A @ x)
    np.testing.assert_allclose(np.asarray(g), gref, rtol=10 * tol,
                               atol=10 * tol)


@pytest.mark.skipif(not _on_tpu(), reason="requires TPU")
def test_fused_attention_kernel_tpu():
    import jax.numpy as jnp

    from h2gcn_tpu.sparse import transforms
    from h2gcn_tpu.sparse.matrix import _build_bsr
    from h2gcn_tpu.sparse.pallas_attention import bsr_gat_attention

    rng = np.random.default_rng(0)
    n, H, F = 500, 8, 8
    A = sp.random(n, n, density=0.02, random_state=1, format="csr")
    A = ((A + A.T) > 0).astype(np.float32)
    A = transforms.add_eye(A)
    bsr = _build_bsr(A.tocsr(), 128)
    f1 = rng.standard_normal((n, H)).astype(np.float32)
    f2 = rng.standard_normal((n, H)).astype(np.float32)
    h = rng.standard_normal((n, H * F)).astype(np.float32)
    out = np.asarray(bsr_gat_attention(
        bsr, jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(h),
        num_heads=H, feat=F, n_out=n,
    ))
    Ad = A.toarray()
    ref = np.zeros((n, H * F))
    for k in range(H):
        e = f1[:, k][:, None] + f2[:, k][None, :]
        e = np.where(e >= 0, e, 0.2 * e)
        e = np.where(Ad > 0, e, -np.inf)
        alpha = np.exp(e - e.max(1, keepdims=True))
        alpha = np.where(Ad > 0, alpha, 0)
        alpha = alpha / alpha.sum(1, keepdims=True)
        ref[:, k * F:(k + 1) * F] = alpha @ h[:, k * F:(k + 1) * F]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not _on_tpu(), reason="requires TPU")
@pytest.mark.parametrize("precision", ["highest", "default"])
def test_cootile_spmm_tpu(precision):
    import jax.numpy as jnp

    from h2gcn_tpu.sparse import SparseMatrix, spmm

    A = sp.random(3000, 3000, density=0.004, random_state=1,
                  format="csr").astype(np.float32)
    x = np.random.default_rng(1).standard_normal((3000, 64)).astype(np.float32)
    sm = SparseMatrix.from_scipy(A, backend="cootile", precision=precision)
    y = np.asarray(spmm(sm, jnp.asarray(x)))
    ref = A @ x
    tol = 1e-4 if precision == "highest" else 3e-2
    np.testing.assert_allclose(y, ref, rtol=tol, atol=tol)


def test_attn_coo_multisegment_matches_oracle():
    """COO-chunk fused attention with FORCED tiny SMEM segments (multiple
    pallas_calls per pass, fwd and transpose tables) == dense oracle,
    including all three grads — exercises the segment-concat paths that
    the single-segment planetoid-scale tests never hit."""
    import numpy as np
    import scipy.sparse as sp

    import jax
    import jax.numpy as jnp

    import h2gcn_tpu.sparse.pallas_attention_coo as pac
    from h2gcn_tpu.sparse import transforms

    rng = np.random.default_rng(0)
    n, H, F = 520, 2, 8
    A = sp.random(n, n, density=0.02, random_state=1, format="csr")
    A = (A > 0).astype(np.float32)  # asymmetric
    A = transforms.add_eye(A)
    old = pac._MAX_CHUNKS
    pac._MAX_CHUNKS = 16
    try:
        ac = pac.build_attn_coo(A.tocsr(), tile=128, e_b=32)
    finally:
        pac._MAX_CHUNKS = old
    assert len(ac.fwd) > 1 and len(ac.bwd) > 1

    Ad = jnp.asarray(A.toarray())
    f1 = jnp.asarray(rng.standard_normal((n, H)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((n, H)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((n, H * F)).astype(np.float32))
    gw = jnp.asarray(rng.standard_normal((n, H * F)).astype(np.float32))

    def oracle(f1, f2, h):
        outs = []
        for k in range(H):
            e = jax.nn.leaky_relu(f1[:, k][:, None] + f2[:, k][None, :], 0.2)
            e = jnp.where(Ad > 0, e, -1e30)
            a = jnp.where(Ad > 0, jax.nn.softmax(e, 1), 0)
            outs.append(a @ h[:, k * F:(k + 1) * F])
        return jnp.concatenate(outs, 1)

    out = pac.gat_attention_coo(ac, f1, f2, h, num_heads=H, feat=F,
                                n_out=n, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle(f1, f2, h)),
                               rtol=1e-4, atol=1e-5)
    g1 = jax.grad(lambda *x: jnp.sum(pac.gat_attention_coo(
        ac, *x, num_heads=H, feat=F, n_out=n, interpret=True) * gw),
        (0, 1, 2))(f1, f2, h)
    g2 = jax.grad(lambda *x: jnp.sum(oracle(*x) * gw), (0, 1, 2))(f1, f2, h)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
