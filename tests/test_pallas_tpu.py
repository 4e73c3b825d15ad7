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
