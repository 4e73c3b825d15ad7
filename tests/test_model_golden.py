"""Golden-model parity: the DSL-compiled network vs an independent
numpy/scipy implementation of the H2GCN math (SURVEY.md §7 parity checklist).

The numpy oracle below is written directly from the paper/reference
semantics: X·W → ReLU → per-hop SpMM stack → flatten → repeat → JK concat
[current, tag1, tag2] → output dense. Activations must match to ~1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from h2gcn_tpu.nn import NetworkModel, parse_network_setup
from h2gcn_tpu.sparse import SparseMatrix, transforms


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n, f, c = 60, 25, 6
    A = sp.random(n, n, density=0.08, random_state=5, format="csr")
    A = ((A + A.T) > 0).astype(np.float32)
    A = transforms.remove_eye(A)
    hops = transforms.nhood_split(A, 2)
    a1 = transforms.normalize(hops[1])
    a2 = transforms.normalize(hops[2])
    adj = SparseMatrix.from_scipy(A, backend="segment")
    ah = [
        SparseMatrix.from_scipy(a1, backend="segment"),
        SparseMatrix.from_scipy(a2, backend="segment"),
    ]
    x = rng.standard_normal((n, f)).astype(np.float32)
    return dict(A=A, a1=a1, a2=a2, adj=adj, ah=ah, x=x, n=n, f=f, c=c)


def _kernels(params):
    return [p["kernel"] for p in params if isinstance(p, dict) and "kernel" in p]


def test_h2gcn2_forward_golden(setup):
    s = setup
    conf = parse_network_setup(
        "M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO", s["c"], _dense_units=64,
        _dropout_rate=0.5,
    )
    model = NetworkModel(conf, l2_regularize_weight=5e-4)
    params = model.init(jax.random.PRNGKey(0), s["f"], 2)
    out = np.asarray(
        model.apply(params, s["adj"], jnp.asarray(s["x"]), s["ah"])
    )

    W0, WO = (np.asarray(w) for w in _kernels(params))
    h = np.maximum(s["x"] @ W0, 0)
    r1 = np.concatenate([s["a1"] @ h, s["a2"] @ h], axis=1)
    r2 = np.concatenate([s["a1"] @ r1, s["a2"] @ r1], axis=1)
    logits = np.concatenate([r2, h, r1], axis=1) @ WO
    np.testing.assert_allclose(out, logits, rtol=1e-4, atol=1e-5)

    # l2 loss: keras regularizers.l2 = weight * Σ kernel²  (kernels only)
    np.testing.assert_allclose(
        float(model.l2_loss(params)),
        5e-4 * ((W0 ** 2).sum() + (WO ** 2).sum()),
        rtol=1e-5,
    )


def test_h2gcn1_forward_golden(setup):
    s = setup
    conf = parse_network_setup(
        "M64-R-T1-G-V-C1-D0.5-MO", s["c"], _dense_units=64, _dropout_rate=0.5
    )
    model = NetworkModel(conf)
    params = model.init(jax.random.PRNGKey(1), s["f"], 2)
    out = np.asarray(model.apply(params, s["adj"], jnp.asarray(s["x"]), s["ah"]))
    W0, WO = (np.asarray(w) for w in _kernels(params))
    h = np.maximum(s["x"] @ W0, 0)
    r1 = np.concatenate([s["a1"] @ h, s["a2"] @ h], axis=1)
    logits = np.concatenate([r1, h], axis=1) @ WO
    np.testing.assert_allclose(out, logits, rtol=1e-4, atol=1e-5)


def test_mlp_forward_golden(setup):
    s = setup
    conf = parse_network_setup("M64-R-D0.5-MO", s["c"], _dense_units=64)
    model = NetworkModel(conf)
    params = model.init(jax.random.PRNGKey(2), s["f"], 2)
    out = np.asarray(model.apply(params, s["adj"], jnp.asarray(s["x"]), s["ah"]))
    W0, WO = (np.asarray(w) for w in _kernels(params))
    np.testing.assert_allclose(
        out, np.maximum(s["x"] @ W0, 0) @ WO, rtol=1e-4, atol=1e-5
    )


def test_activation_capture_names(setup):
    s = setup
    conf = parse_network_setup(
        "M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO", s["c"], _dense_units=64,
        _dropout_rate=0.5,
    )
    model = NetworkModel(conf)
    params = model.init(jax.random.PRNGKey(0), s["f"], 2)
    cap = {}
    model.apply(params, s["adj"], jnp.asarray(s["x"]), s["ah"], capture=cap)
    assert "inputs/inputs" in cap
    assert "activations/0-dense" in cap
    assert "activations/9-dense" in cap
    assert cap["activations/2-graph"].shape == (s["n"], 2, 64)


def test_dropout_train_vs_eval(setup):
    s = setup
    conf = parse_network_setup("M64-R-D0.5-MO", s["c"], _dense_units=64)
    model = NetworkModel(conf)
    params = model.init(jax.random.PRNGKey(3), s["f"], 2)
    x = jnp.asarray(s["x"])
    out_eval = model.apply(params, s["adj"], x, s["ah"], training=False)
    out_train = model.apply(
        params, s["adj"], x, s["ah"], training=True, rng=jax.random.PRNGKey(7)
    )
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))
    # expectation preserved: dropout mask mean ≈ 1 with 1/keep rescale
    outs = [
        np.asarray(
            model.apply(params, s["adj"], x, s["ah"], training=True,
                        rng=jax.random.PRNGKey(i))
        )
        for i in range(30)
    ]
    np.testing.assert_allclose(
        np.mean(outs, axis=0), np.asarray(out_eval), atol=0.5
    )


def test_jit_apply_consistent(setup):
    s = setup
    conf = parse_network_setup(
        "M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO", s["c"], _dense_units=64,
        _dropout_rate=0.5,
    )
    model = NetworkModel(conf)
    params = model.init(jax.random.PRNGKey(0), s["f"], 2)
    eager = model.apply(params, s["adj"], jnp.asarray(s["x"]), s["ah"])
    jitted = jax.jit(
        lambda p, x, adj, ah: model.apply(p, adj, x, ah)
    )(params, jnp.asarray(s["x"]), s["adj"], list(s["ah"]))
    np.testing.assert_allclose(
        np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-6
    )


def test_supervised_heads(setup):
    s = setup
    # L marks the JK concat: its width matches the output head's input, so the
    # auxiliary supervision head can reuse the output network directly.
    conf = parse_network_setup(
        "M64-R-T1-G-V-C1-L-D0.5-MO", s["c"], _dense_units=64, _dropout_rate=0.5
    )
    model = NetworkModel(conf)
    params = model.init(jax.random.PRNGKey(0), s["f"], 2)
    out, sup = model.apply(
        params, s["adj"], jnp.asarray(s["x"]), s["ah"], add_supervision=True
    )
    assert len(sup) == 1
    assert sup[0].shape == (s["n"], s["c"])
