"""Distributed GAT (parallel/attention.py): dest-stripe-sharded gather
attention on an 8-device virtual CPU mesh must agree with the single-chip
fused gather path to float tolerance — forward logits, training-step
gradients, and the full runtime protocol. The reference GAT
(baselines/GAT/utils/layers.py:53-100) is single-device only; this layer is
its at-scale replacement (VERDICT r4 task #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import scipy.sparse as sp
from jax.sharding import NamedSharding, PartitionSpec as P

from h2gcn_tpu.models.GAT import GATNetwork, build_gat_adjacency
from h2gcn_tpu.parallel import attention as pattn, dist, train as ptrain
from h2gcn_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    n, f, c = 120, 24, 5
    A = sp.random(n, n, density=0.06, random_state=1, format="csr")
    support = ((A + A.T + sp.eye(n)) > 0).astype(np.float32)
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = np.zeros((n, c), np.float32)
    y[np.arange(n), rng.integers(0, c, n)] = 1
    mask = rng.random(n) < 0.4
    return dict(n=n, f=f, c=c, support=support, x=x, y=y, mask=mask)


def _models(p, **kw):
    """Matched single-device (fused gather payload) and distributed GAT."""
    kw.setdefault("hid_units", [8])
    kw.setdefault("n_heads", [2, 1])
    kw.setdefault("in_drop", 0.0)
    kw.setdefault("attn_drop", 0.0)
    single = GATNetwork(p["c"], fused_attention=True, **kw)
    dist_m = pattn.DistGATNetwork.from_single(single)
    params = single.init(jax.random.PRNGKey(0), p["f"])
    return single, dist_m, params


def test_dist_attention_logits_match_single_chip(problem):
    p = problem
    mesh = make_mesh(8)
    single, dist_m, params = _models(p)

    dga, n_pad = pattn.shard_attention_gather(p["support"], 8)
    tx = optax.adam(0.005, eps=1e-7)
    train_step, _ = ptrain.build_dist_steps(dist_m, tx, mesh, [dga])
    shard = NamedSharding(mesh, P("graph"))
    xd = jax.device_put(jnp.asarray(dist.pad_nodes(p["x"], n_pad)), shard)
    logits = np.asarray(train_step.logits(params, xd))[: p["n"]]

    adj = build_gat_adjacency(p["support"], fused_attention=True,
                              attn_impl="gather")
    ref = np.asarray(single.apply(params, adj, jnp.asarray(p["x"]), []))
    np.testing.assert_allclose(logits, ref, rtol=1e-5, atol=1e-5)


def test_dist_attention_train_step_matches_single_chip(problem):
    """One no-dropout SGD step: distributed GAT grads == single-chip fused
    gather grads (big LR exposes gradient errors — the test_parallel.py
    pattern)."""
    p = problem
    mesh = make_mesh(8)
    single, dist_m, params = _models(p)
    tx = optax.sgd(0.5)
    opt_state = tx.init(params)

    dga, n_pad = pattn.shard_attention_gather(p["support"], 8)
    train_step, _ = ptrain.build_dist_steps(dist_m, tx, mesh, [dga])
    shard = NamedSharding(mesh, P("graph"))
    xd = jax.device_put(jnp.asarray(dist.pad_nodes(p["x"], n_pad)), shard)
    yd = jax.device_put(jnp.asarray(dist.pad_nodes(p["y"], n_pad)), shard)
    md = jax.device_put(jnp.asarray(dist.pad_nodes(p["mask"], n_pad)), shard)
    new_params, _, loss = train_step(
        params, opt_state, jax.random.PRNGKey(1), xd, yd, md
    )

    adj = build_gat_adjacency(p["support"], fused_attention=True,
                              attn_impl="gather")

    def loss_fn(pp):
        logits = single.apply(pp, adj, jnp.asarray(p["x"]), [],
                              training=True, rng=jax.random.PRNGKey(7))
        return single.loss(pp, logits, jnp.asarray(p["y"]),
                           jnp.asarray(p["mask"]))

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params)
    ref_params = optax.apply_updates(
        params, tx.update(grads_ref, opt_state, params)[0]
    )
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(new_params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_dist_attention_residual_matches_single_chip(problem):
    """The residual variant (learned 1x1 projection when dims differ,
    reference utils/layers.py:94-99) composes with the sharded layer."""
    p = problem
    mesh = make_mesh(8)
    single, dist_m, params = _models(p, residual=True)
    assert any("Wres" in h for layer in params["layers"] for h in layer)

    dga, n_pad = pattn.shard_attention_gather(p["support"], 8)
    train_step, _ = ptrain.build_dist_steps(
        dist_m, optax.sgd(0.1), mesh, [dga])
    shard = NamedSharding(mesh, P("graph"))
    xd = jax.device_put(jnp.asarray(dist.pad_nodes(p["x"], n_pad)), shard)
    logits = np.asarray(train_step.logits(params, xd))[: p["n"]]

    adj = build_gat_adjacency(p["support"], fused_attention=True,
                              attn_impl="gather")
    ref = np.asarray(single.apply(params, adj, jnp.asarray(p["x"]), []))
    np.testing.assert_allclose(logits, ref, rtol=1e-5, atol=1e-5)


def test_dist_attention_dropout_trains(problem):
    """Full dropout (input + attention-coefficient) composes with the
    sharded attention: finite decreasing-ish loss over a few steps."""
    p = problem
    mesh = make_mesh(8)
    _, dist_m, params = _models(p, in_drop=0.4, attn_drop=0.4)
    tx = optax.adam(0.01, eps=1e-7)
    opt_state = tx.init(params)
    dga, n_pad = pattn.shard_attention_gather(p["support"], 8)
    train_step, eval_step = ptrain.build_dist_steps(dist_m, tx, mesh, [dga])
    shard = NamedSharding(mesh, P("graph"))
    xd = jax.device_put(jnp.asarray(dist.pad_nodes(p["x"], n_pad)), shard)
    yd = jax.device_put(jnp.asarray(dist.pad_nodes(p["y"], n_pad)), shard)
    md = jax.device_put(jnp.asarray(dist.pad_nodes(p["mask"], n_pad)), shard)
    losses = []
    for step in range(4):
        params, opt_state, loss = train_step(
            params, opt_state, jax.random.PRNGKey(step), xd, yd, md)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    metrics = eval_step(params, xd, yd, md)
    assert 0.0 <= float(metrics["acc"]) <= 1.0 + 1e-5


def test_dist_attention_self_rows_never_travel(problem):
    """Locally-owned source rows are never exchanged: send_idx[d, d] is
    all padding for every shard (the halo discipline, test_parallel.py
    pattern)."""
    dga, _ = pattn.shard_attention_gather(problem["support"], 8)
    send = np.asarray(dga.send_idx)
    for d in range(8):
        np.testing.assert_array_equal(send[d, d], 0)


def test_dist_attention_padding_edges_inert(problem):
    """Shards pad their edge lists to a uniform static size; padding edges
    must contribute NOTHING (they point at dead zero-valued slots). Pinned
    by comparing two shard counts whose padding differs."""
    p = problem
    mesh = make_mesh(8)
    single, dist_m, params = _models(p)
    adj = build_gat_adjacency(p["support"], fused_attention=True,
                              attn_impl="gather")
    ref = np.asarray(single.apply(params, adj, jnp.asarray(p["x"]), []))
    for D in (2, 4):
        sub_mesh = make_mesh(D)
        dga, n_pad = pattn.shard_attention_gather(p["support"], D)
        train_step, _ = ptrain.build_dist_steps(
            dist_m, optax.sgd(0.1), sub_mesh, [dga])
        shard = NamedSharding(sub_mesh, P("graph"))
        xd = jax.device_put(jnp.asarray(dist.pad_nodes(p["x"], n_pad)),
                            shard)
        logits = np.asarray(train_step.logits(params, xd))[: p["n"]]
        np.testing.assert_allclose(logits, ref, rtol=1e-5, atol=1e-5)


def test_dryrun_gat_mode():
    from h2gcn_tpu.parallel import dryrun

    out = dryrun.run(8, mode="gat")
    assert np.isfinite(out["loss"])


def test_distributed_gat_cli(planetoid_path, tmp_path):
    """--mesh_shards through the real GAT CLI: the dest-stripe sharded
    attention trains citeseer end-to-end on the virtual mesh."""
    from h2gcn_tpu.run_experiments import main

    args = main([
        "GAT", "planetoid", "--dataset", "ind.citeseer",
        "--dataset_path", planetoid_path,
        "--epochs", "12", "--mesh_shards", "8",
        "--in_drop", "0.2", "--attn_drop", "0.2",
        "--checkpoint_dir", str(tmp_path / "ck" / "{model}_{dataset}_{runname}"),
    ])
    acc = float(args.objects["best_val_stats"]["test_accuracy"])
    assert acc > 0.3
