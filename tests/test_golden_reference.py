"""Golden parity against the ACTUAL reference TF2 implementation.

The npz fixtures in tests/golden/ were produced by executing the reference
code itself (/root/reference/h2gcn, TF 2.21) via
``workbench/golden/dump_reference.py``: seeded weight initialization, one
eval-mode forward with the reference's own ``saveActivations`` mechanism
(reference models/H2GCN.py:294-346), plus the exact input tensors its
preprocessing produced (reference datasets/_dataset.py:537-584).

Two independent claims are verified here:

1. **Pipeline parity** — our loader + hop pipeline reproduces the reference's
   input tensors (features, Â₁, Â₂, labels, masks) to float32 precision.
2. **Model parity** — loading the reference's initialized weights into our
   functional model and feeding the reference's own inputs reproduces every
   per-layer activation, the logits, and the loss terms at ~1e-5 (f32 vs f32,
   differing only in accumulation order).

Together they pin BASELINE.md's "per-layer activations allclose vs reference
TF2" criterion against the real reference, not a hand-written oracle.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from h2gcn_tpu.datasets._dataset import PlanetoidData
from h2gcn_tpu.nn import NetworkModel, parse_network_setup
from h2gcn_tpu.sparse import SparseMatrix

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    "h2gcn2_cora": "ref_h2gcn2_cora.npz",
    "h2gcn1_cora": "ref_h2gcn1_cora.npz",
    "h2gcn2_citeseer": "ref_h2gcn2_citeseer.npz",
    # hop GROUPS ("0,1" = I + exact-1-hop summed before normalization) —
    # pins the group-sum path of getTensors (reference _dataset.py:569-574)
    "h2gcn2_cora_hopgroups": "ref_h2gcn2_cora_hopgroups.npz",
}


def _adj_nhood(npz):
    if "meta/adj_nhood" in npz.files:
        return str(npz["meta/adj_nhood"]).split(";")
    return ["1", "2"]


@pytest.fixture(params=sorted(CASES), scope="module")
def golden(request):
    path = os.path.join(GOLDEN_DIR, CASES[request.param])
    if not os.path.exists(path):
        pytest.skip(f"golden dump {path} not present")
    return np.load(path)


def _sparse_from(npz, prefix):
    idx = npz[f"{prefix}/indices"]
    vals = npz[f"{prefix}/values"]
    shape = tuple(int(s) for s in npz[f"{prefix}/dense_shape"])
    return sp.coo_matrix((vals, (idx[:, 0], idx[:, 1])), shape=shape).tocsr()


def _ref_activations(npz):
    """[(ind, ref_layer_name, array)] sorted by layer index."""
    out = []
    for key in npz.files:
        if key.startswith("activations/"):
            ind_name = key.split("/", 1)[1]
            ind, name = ind_name.split("-", 1)
            out.append((int(ind), name, npz[key]))
    return sorted(out)


def _model_with_ref_weights(npz):
    setup = str(npz["meta/network_setup"])
    num_labels = npz["tensors/y_train"].shape[1]
    conf = parse_network_setup(setup, num_labels, _dense_units=64,
                               _dropout_rate=0.5)
    model = NetworkModel(conf, l2_regularize_weight=5e-4)

    feats = _sparse_from(npz, "inputs/inputs")
    n_hops = len({k.split("/")[2] for k in npz.files
                  if k.startswith("inputs/adjhops/")})
    params = model.init(jax.random.PRNGKey(0), feats.shape[1], n_hops)

    # The reference names its layers sparse_dense/dense/dense_1/... and those
    # names appear both in the activation keys and the variable paths — use
    # them to place each reference kernel at our matching layer index.
    for ind, name, _ in _ref_activations(npz):
        wkey = f"weights/h2gcn/{name}/kernel:0"
        if wkey in npz.files:
            params[ind] = dict(params[ind])
            params[ind]["kernel"] = jnp.asarray(npz[wkey])
            bkey = f"weights/h2gcn/{name}/bias:0"
            if bkey in npz.files:
                params[ind]["bias"] = jnp.asarray(npz[bkey])

    hops = [
        SparseMatrix.from_scipy(_sparse_from(npz, f"inputs/adjhops/{h}"),
                                backend="segment")
        for h in range(n_hops)
    ]
    x = jnp.asarray(feats.toarray(), dtype=jnp.float32)
    return model, params, x, hops


def test_model_forward_matches_reference_tf2(golden):
    model, params, x, hops = _model_with_ref_weights(golden)

    capture = {}
    logits = model.apply(params, hops[0], x, hops, capture=capture)

    for ind, name, ref_act in _ref_activations(golden):
        ours = np.asarray(capture[f"activations/{ind}-{model.names[ind]}"])
        np.testing.assert_allclose(
            ours, ref_act, rtol=1e-5, atol=1e-5,
            err_msg=f"layer {ind} ({name}) diverges from reference TF2",
        )
    np.testing.assert_allclose(np.asarray(logits), golden["predictions"],
                               rtol=1e-5, atol=1e-5)


def test_loss_and_accuracy_match_reference_tf2(golden):
    from h2gcn_tpu.nn.metrics import masked_accuracy

    model, params, x, hops = _model_with_ref_weights(golden)
    logits = model.apply(params, hops[0], x, hops)

    l2 = model.l2_loss(params)
    np.testing.assert_allclose(np.asarray(l2), golden["golden/l2_loss"],
                               rtol=1e-5, atol=1e-7)
    train_loss = model.loss(params, logits,
                            jnp.asarray(golden["tensors/y_train"]),
                            jnp.asarray(golden["tensors/train_mask"]))
    np.testing.assert_allclose(np.asarray(train_loss),
                               golden["golden/train_loss"], rtol=1e-5)
    acc = masked_accuracy(logits, jnp.asarray(golden["tensors/y_test"]),
                          jnp.asarray(golden["tensors/test_mask"]))
    np.testing.assert_allclose(np.asarray(acc), golden["golden/test_acc"],
                               rtol=0, atol=1e-6)


DYN_CASES = {
    "h2gcn2_cora": "ref_dyn_h2gcn2_cora.npz",
    "h2gcn1_cora": "ref_dyn_h2gcn1_cora.npz",
}


@pytest.mark.parametrize("case", sorted(DYN_CASES))
def test_training_dynamics_match_reference_tf2(case):
    """Optimizer-dynamics golden: from the reference's own initialized
    weights, N dropout-free train steps in our runtime reproduce the
    reference's per-step loss sequence and final weights.

    This pins what the eval-forward goldens cannot: the gradient of
    masked CE + keras-L2, Adam semantics (eps 1e-7, bias correction), and
    the effective learning rate — ``meta/effective_lr`` is read back from
    the executed reference optimizer, since tf-keras 2.21 drops the
    deprecated "lr" alias the reference passes
    (reference models/H2GCN.py:62-63) and silently trains at 1e-3.
    Reference step: models/H2GCN.py:66-74.
    """
    import optax

    from h2gcn_tpu.models._runtime import _OPTIMIZERS

    path = os.path.join(GOLDEN_DIR, DYN_CASES[case])
    if not os.path.exists(path):
        pytest.skip(f"golden dump {path} not present")
    npz = np.load(path)
    model, params, x, hops = _model_with_ref_weights(npz)

    y_train = jnp.asarray(npz["tensors/y_train"])
    train_mask = jnp.asarray(npz["tensors/train_mask"])
    tx = _OPTIMIZERS[str(npz["meta/optimizer"])](
        float(npz["meta/effective_lr"]))
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
    for ind, name, _ in _ref_activations(npz):
        wkey = f"weights_after/h2gcn/{name}/kernel:0"
        if wkey in npz.files:
            np.testing.assert_allclose(
                np.asarray(params[ind]["kernel"]), npz[wkey],
                rtol=1e-4, atol=1e-6,
                err_msg=f"post-training kernel {name} diverges")


def test_pipeline_matches_reference_inputs(golden, planetoid_path):
    dataset = str(golden["meta/dataset"])
    ds = PlanetoidData(dataset, planetoid_path, val_size=500)
    ds.row_normalize_features()
    ds.adj_remove_eye()
    hop_spec = _adj_nhood(golden)
    tensors = ds.get_tensors(get_adj_norm_hops=hop_spec, backend="segment")

    ref_feats = _sparse_from(golden, "inputs/inputs").toarray()
    np.testing.assert_allclose(np.asarray(tensors.features), ref_feats,
                               rtol=1e-6, atol=1e-7)
    for h in range(len(hop_spec)):
        ref_hop = _sparse_from(golden, f"inputs/adjhops/{h}").toarray()
        np.testing.assert_allclose(
            tensors.adj_hops[h].to_scipy().toarray(), ref_hop,
            rtol=1e-6, atol=1e-7,
            err_msg=f"normalized hop-{h + 1} adjacency diverges",
        )
    for name in ("y_train", "y_val", "y_test",
                 "train_mask", "val_mask", "test_mask"):
        np.testing.assert_array_equal(
            np.asarray(getattr(tensors, name), dtype=np.float32),
            golden[f"tensors/{name}"], err_msg=name)
