"""Layer-DSL compiler: token grammar and modifier handling."""

import pytest

from h2gcn_tpu.nn import Layer, parse_network_setup


def test_h2gcn2_default():
    conf = parse_network_setup(
        "M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO", 7, _dense_units=64,
        _dropout_rate=0.5,
    )
    kinds = [k for k, _ in conf]
    assert kinds == [
        Layer.DENSE, Layer.RELU, Layer.GCN, Layer.VECTORIZE, Layer.GCN,
        Layer.VECTORIZE, Layer.CONCAT, Layer.CONCAT, Layer.DROPOUT,
        Layer.DENSE,
    ]
    assert conf[0][1]["units"] == 64 and conf[0][1]["use_bias"] is False
    assert conf[1][1]["tag"] == "1"
    assert conf[3][1]["tag"] == "2"
    assert conf[6][1]["tags"] == ["1"]
    assert conf[8][1]["dropout_rate"] == 0.5
    assert conf[9][1]["units"] == 7 and conf[9][1]["beginOutput"]


def test_dense_variants():
    conf = parse_network_setup("F32-FO-F-M", 5, _dense_units=16)
    assert conf[0][1] == dict(units=32, use_bias=True)
    assert conf[1][1] == dict(units=5, use_bias=True, beginOutput=True)
    assert conf[2][1]["units"] == 16
    assert conf[3][1]["use_bias"] is False


def test_gcn_hop_selection():
    conf = parse_network_setup("G0_2-G", 3)
    assert conf[0][1]["hops"] == {0, 2}
    assert conf[1][1]["hops"] is None


def test_slice_tokens():
    conf = parse_network_setup("Sfoo_1_5-S_2_-S", 3)
    assert conf[0][1]["loadTag"] == "foo"
    assert conf[0][1]["sliceObj"] == slice(1, 5)
    assert conf[1][1]["loadTag"] is None
    assert conf[1][1]["sliceObj"] == slice(2, None)
    assert conf[2][1]["sliceObj"] == slice(None)


def test_modifiers_and_experimental():
    conf = parse_network_setup("M8-E-L-T9-Xfoo_barconf", 4, _dense_units=8)
    assert conf[0][1]["isEmbedding"] and conf[0][1]["supervised"]
    assert conf[0][1]["tag"] == "9"
    assert conf[1][0] == Layer.EXPERIMENTAL
    assert conf[1][1]["name"] == "foo" and conf[1][1]["conf"] == "barconf"


def test_lambda_and_bracket():
    conf = parse_network_setup("[lambda x: x * 2]-MO", 3)
    assert conf[0][0] == Layer.LAMBDA


def test_double_embedding_rejected():
    with pytest.raises(AssertionError):
        parse_network_setup("M8-E-M8-E", 3, _dense_units=8)


def test_unknown_token_rejected():
    with pytest.raises(ValueError):
        parse_network_setup("M8-Q", 3, _dense_units=8)


def test_stop_gradient_token():
    conf = parse_network_setup("M8-SG-MO", 3, _dense_units=8)
    assert conf[1][0] == Layer.STOP_GRADIENT
    # and it actually blocks gradients through the first dense
    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp

    from h2gcn_tpu.nn import NetworkModel
    from h2gcn_tpu.sparse import SparseMatrix

    model = NetworkModel(conf)
    params = model.init(jax.random.PRNGKey(0), 4, 1)
    adj = SparseMatrix.from_scipy(sp.eye(6, format="csr"), backend="segment")
    x = jnp.ones((6, 4))

    def loss(p):
        return jnp.sum(model.apply(p, adj, x, [adj]) ** 2)

    grads = jax.grad(loss)(params)
    assert np.allclose(np.asarray(grads[0]["kernel"]), 0.0)  # blocked
    assert not np.allclose(np.asarray(grads[2]["kernel"]), 0.0)
