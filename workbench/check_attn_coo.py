"""Quick correctness check: COO-chunk fused attention vs dense oracle."""
import numpy as np
import scipy.sparse as sp

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from h2gcn_tpu.sparse import transforms
from h2gcn_tpu.sparse.pallas_attention_coo import (build_attn_coo,
                                                   gat_attention_coo)

rng = np.random.default_rng(0)
n, H, F = 300, 3, 8
A = sp.random(n, n, density=0.03, random_state=1, format="csr")
A = (A > 0).astype(np.float32)  # ASYMMETRIC support (exercises bwd tables)
A = transforms.add_eye(A)
ac = build_attn_coo(A.tocsr(), tile=128, e_b=64)
print(f"chunks={ac.num_chunks} segs fwd={len(ac.fwd)} bwd={len(ac.bwd)}")

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
        a = jax.nn.softmax(e, 1)
        a = jnp.where(Ad > 0, a, 0)
        outs.append(a @ h[:, k * F:(k + 1) * F])
    return jnp.concatenate(outs, 1)


out1 = gat_attention_coo(ac, f1, f2, h, num_heads=H, feat=F, n_out=n,
                         interpret=True)
out2 = oracle(f1, f2, h)
err = float(jnp.max(jnp.abs(out1 - out2)))
print(f"fwd max err: {err:.2e}")
assert err < 1e-4, "FWD MISMATCH"

g_fn = jax.jit(lambda a, f1, f2, h: jax.grad(
    lambda *x: jnp.sum(gat_attention_coo(
        a, *x, num_heads=H, feat=F, n_out=n, interpret=True) * gw),
    (0, 1, 2))(f1, f2, h))
g1 = g_fn(ac, f1, f2, h)
g2 = jax.grad(lambda *x: jnp.sum(oracle(*x) * gw), (0, 1, 2))(f1, f2, h)
for name, a, b in zip(("df1", "df2", "dh"), g1, g2):
    e = float(jnp.max(jnp.abs(a - b)))
    print(f"{name} max err: {e:.2e}")
    assert e < 1e-3, f"{name} MISMATCH"
print("ALL OK")
