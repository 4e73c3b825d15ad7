"""Golden parity against the EXECUTED reference TF1 GCN baseline family.

The npz fixtures (tests/golden/ref_gcnbase_*.npz) were produced by running
the reference baseline itself (baselines/gcn/gcn/{models,layers,utils}.py
under tf.compat.v1) via workbench/golden_baselines/dump_gcn_baseline.py:
seeded initialization, one eval-mode forward (dropout 0), the reference's
``model.activations`` list, and its exact preprocessed inputs.

Verified here:

1. **Pipeline parity** — our transforms reproduce the reference's
   ``preprocess_adj`` / ``chebyshev_polynomials`` / ``preprocess_features``
   outputs (reference utils.py:62-107) on the same raw cora data.
2. **Model parity** — the reference's initialized weights loaded into our
   GCN layer programs (h2gcn_tpu/models/GCN.py build_layer_setups) and fed
   the reference's own inputs reproduce every dense activation, the
   logits, and the train loss (masked CE + first-layer-only halved weight
   decay, reference models.py:175-181) at ~1e-5.

The cheby variants additionally pin the [stack hops → flatten → wide
dense] identity our cheby program uses in place of the reference's
per-support kernels (layers.py:178-186).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from h2gcn_tpu.models.GCN import build_layer_setups
from h2gcn_tpu.nn import NetworkModel
from h2gcn_tpu.nn.metrics import masked_accuracy
from h2gcn_tpu.sparse import SparseMatrix

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# ref model key -> (our variant, kernel mapping, activation mapping)
# kernel mapping: our layer index -> list of reference "layer/var" keys
#   (multi-key entries are vstacked: the wide-dense identity for cheby)
# activation mapping: dumped ref activation index -> our captured layer index
#   (the final ref activation is always the logits, compared separately)
CASES = {
    "gcn": dict(
        variant="gcn",
        kernels={1: ["0/weights_0"], 6: ["1/weights_0"]},
        acts={0: 4},
    ),
    "gcn_cheby": dict(
        variant="cheby",
        kernels={3: [f"0/weights_{k}" for k in range(4)],
                 8: [f"1/weights_{k}" for k in range(4)]},
        acts={0: 4},
    ),
    "dense": dict(
        variant="mlp",
        kernels={1: ["0/weights"], 4: ["1/weights"]},
        acts={0: 2},
    ),
    "gcn_concat_2": dict(
        variant="concat2",
        kernels={1: ["0/weights"], 4: ["1/weights_0"],
                 9: ["2/weights_0"], 15: ["3/weights"]},
        acts={0: 2, 1: 7, 2: 12, 3: 13},
    ),
    # citeseer pins the isolated-node patch + non-valid-sample masking
    # through the same weight-loading path
    "gcn_citeseer": dict(
        variant="gcn",
        kernels={1: ["0/weights_0"], 6: ["1/weights_0"]},
        acts={0: 4},
    ),
}


def _golden(case):
    ds = "citeseer" if case.endswith("_citeseer") else "cora"
    case = case.removesuffix("_citeseer")
    path = os.path.join(GOLDEN_DIR, f"ref_gcnbase_{case}_{ds}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden dump {path} not present")
    return np.load(path)


def _sparse_from(npz, prefix):
    idx = npz[f"{prefix}/indices"]
    vals = npz[f"{prefix}/values"]
    shape = tuple(int(s) for s in npz[f"{prefix}/dense_shape"])
    return sp.coo_matrix((vals, (idx[:, 0], idx[:, 1])), shape=shape).tocsr()


def _build(case):
    npz = _golden(case)
    spec = CASES[case]
    num_labels = npz["tensors/y_train"].shape[1]
    hidden = int(npz["meta/hidden1"])
    model = NetworkModel(
        build_layer_setups(spec["variant"], hidden, 0.5, num_labels),
        l2_regularize_weight=float(npz["meta/weight_decay"]),
    )
    feats = _sparse_from(npz, "inputs/features")
    n_sup = int(npz["meta/num_supports"])
    hops = [SparseMatrix.from_scipy(_sparse_from(npz, f"inputs/support/{k}"),
                                    backend="segment")
            for k in range(n_sup)]
    params = model.init(jax.random.PRNGKey(0), feats.shape[1], len(hops))
    for ind, ref_keys in spec["kernels"].items():
        kern = np.vstack([npz[f"weights/{k}"] for k in ref_keys])
        assert params[ind]["kernel"].shape == kern.shape, (
            f"layer {ind}: ours {params[ind]['kernel'].shape} "
            f"vs ref {kern.shape}")
        params[ind] = dict(params[ind])
        params[ind]["kernel"] = jnp.asarray(kern)
    x = jnp.asarray(feats.toarray(), dtype=jnp.float32)
    return npz, spec, model, params, x, hops


@pytest.mark.parametrize("case", sorted(CASES))
def test_forward_matches_reference_tf1(case):
    npz, spec, model, params, x, hops = _build(case)
    capture = {}
    adj = hops[0] if hops else None
    logits = model.apply(params, adj, x, hops, capture=capture)

    n_acts = len([k for k in npz.files if k.startswith("activations/")])
    for ref_i, our_i in spec["acts"].items():
        ref_act = npz[f"activations/{ref_i}"]
        ours = np.asarray(capture[f"activations/{our_i}-{model.names[our_i]}"])
        np.testing.assert_allclose(
            ours, ref_act, rtol=1e-5, atol=1e-5,
            err_msg=f"{case}: ref activation {ref_i} vs our layer {our_i}")
    # final reference activation is the logits
    np.testing.assert_allclose(np.asarray(logits),
                               npz[f"activations/{n_acts - 1}"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), npz["predictions"],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("case", sorted(CASES))
def test_loss_and_accuracy_match_reference_tf1(case):
    npz, spec, model, params, x, hops = _build(case)
    adj = hops[0] if hops else None
    logits = model.apply(params, adj, x, hops)
    train_loss = model.loss(params, logits,
                            jnp.asarray(npz["tensors/y_train"]),
                            jnp.asarray(npz["tensors/train_mask"]))
    np.testing.assert_allclose(np.asarray(train_loss),
                               npz["golden/train_loss"], rtol=1e-5)
    acc = masked_accuracy(logits, jnp.asarray(npz["tensors/y_test"]),
                          jnp.asarray(npz["tensors/test_mask"]))
    np.testing.assert_allclose(np.asarray(acc), npz["golden/test_acc"],
                               rtol=0, atol=1e-6)


def test_transform_pipeline_matches_reference():
    """Our sym-norm(A+I), chebyshev, and feature row-normalize reproduce the
    reference's preprocessed inputs (utils.py preprocess_adj /
    chebyshev_polynomials / preprocess_features) on raw cora."""
    from h2gcn_tpu.datasets._dataset import PlanetoidData
    from h2gcn_tpu.sparse import transforms
    from h2gcn_tpu.sparse.transforms import NType

    npz_gcn = _golden("gcn")
    npz_cheby = _golden("gcn_cheby")
    data_path = "/root/reference/baselines/mixhop/data/planetoid/data"
    if not os.path.exists(os.path.join(data_path, "ind.cora.allx")):
        pytest.skip("planetoid data not present")
    ds = PlanetoidData("ind.cora", data_path, val_size=500)

    ours_sup = transforms.normalize(
        transforms.add_eye(ds.sparse_adj), NType.SYM_NORMALIZED).tocsr()
    ref_sup = _sparse_from(npz_gcn, "inputs/support/0")
    assert abs(ours_sup - ref_sup).max() < 1e-6

    ref_feats = _sparse_from(npz_gcn, "inputs/features")
    ds.row_normalize_features()
    assert abs(ds.features.tocsr() - ref_feats).max() < 1e-6

    # eigenvalue=2 = the reference's effective default (its train.py
    # dispatch never reaches the ARPACK branch of utils.py:82-107)
    cheb = transforms.chebyshev_polynomials(ds.sparse_adj, 3, eigenvalue=2)
    for k, t in enumerate(cheb):
        ref_t = _sparse_from(npz_cheby, f"inputs/support/{k}")
        assert abs(t.tocsr() - ref_t).max() < 1e-5, f"T_{k} diverges"


def test_training_dynamics_match_reference_tf1():
    """From the reference's seeded init, 25 dropout-free train steps in our
    runtime reproduce the reference GCN's per-step loss sequence — pinning
    the masked-CE gradient, the first-layer-only halved weight decay, and
    tf.train.AdamOptimizer semantics (eps 1e-8, bias corrections folded
    into the step size)."""
    import optax

    from h2gcn_tpu.models._runtime import _keras_adam

    path = os.path.join(GOLDEN_DIR, "ref_gcnbase_dyn_gcn_cora.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    npz = np.load(path)
    spec = CASES["gcn"]
    num_labels = npz["tensors/y_train"].shape[1]
    model = NetworkModel(
        build_layer_setups("gcn", int(npz["meta/hidden1"]), 0.5, num_labels),
        l2_regularize_weight=float(npz["meta/weight_decay"]),
    )
    feats = _sparse_from(npz, "inputs/features")
    hops = [SparseMatrix.from_scipy(_sparse_from(npz, "inputs/support/0"),
                                    backend="segment")]
    params = model.init(jax.random.PRNGKey(0), feats.shape[1], 1)
    for ind, ref_keys in spec["kernels"].items():
        params[ind] = dict(params[ind])
        params[ind]["kernel"] = jnp.asarray(
            np.vstack([npz[f"weights/{k}"] for k in ref_keys]))
    x = jnp.asarray(feats.toarray(), dtype=jnp.float32)

    y_train = jnp.asarray(npz["tensors/y_train"])
    train_mask = jnp.asarray(npz["tensors/train_mask"])
    tx = _keras_adam(float(npz["meta/learning_rate"]), eps=1e-8)  # TF1 Adam
    opt_state = tx.init(params)

    def loss_fn(p):
        logits = model.apply(p, hops[0], x, hops)
        return model.loss(p, logits, y_train, train_mask)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(len(npz["golden/step_losses"])):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    np.testing.assert_allclose(losses, npz["golden/step_losses"],
                               rtol=2e-5, atol=2e-6)
