"""Multi-chip sharding correctness on an 8-device virtual CPU mesh.

The distributed path (edge-partitioned SpMM, all-gather halo exchange,
psum'd loss/grads) must agree with the single-chip reference computation to
float tolerance — the core scaling-correctness guarantee.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import scipy.sparse as sp
from jax.sharding import NamedSharding, PartitionSpec as P

from h2gcn_tpu.nn import NetworkModel, parse_network_setup
from h2gcn_tpu.parallel import dist, train as ptrain
from h2gcn_tpu.parallel.mesh import make_mesh
from h2gcn_tpu.sparse import SparseMatrix, transforms


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    n, f, c = 120, 24, 5
    A = sp.random(n, n, density=0.06, random_state=1, format="csr")
    A = ((A + A.T) > 0).astype(np.float32)
    A = transforms.remove_eye(A)
    hops = transforms.nhood_split(A, 2)
    mats = [transforms.normalize(hops[1]), transforms.normalize(hops[2])]
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = np.zeros((n, c), np.float32)
    y[np.arange(n), rng.integers(0, c, n)] = 1
    mask = rng.random(n) < 0.4
    return dict(n=n, f=f, c=c, mats=mats, x=x, y=y, mask=mask)


def test_dist_spmm_matches_scipy(problem):
    mesh = make_mesh(8)
    m = problem["mats"][0]
    shard, n_pad = dist.shard_matrix(m, 8)
    x = dist.pad_nodes(problem["x"], n_pad)

    def body(sh, x_local):
        return dist.dist_spmm(sh.local(), x_local)

    f = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P("graph"), shard),
                      P("graph")),
            out_specs=P("graph"),
            check_vma=False,
        )
    )
    y = np.asarray(f(shard, jnp.asarray(x)))[: problem["n"]]
    ref = m @ problem["x"]
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_dist_eval_matches_single_chip(problem):
    p = problem
    mesh = make_mesh(8)
    conf = parse_network_setup(
        "M16-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO", p["c"], _dense_units=16,
        _dropout_rate=0.5,
    )
    model = NetworkModel(conf, l2_regularize_weight=5e-4)
    params = model.init(jax.random.PRNGKey(0), p["f"], 2)
    tx = optax.adam(0.01, eps=1e-7)

    hop_shards, n_pad = dist.shard_hops(p["mats"], 8)
    _, eval_step = ptrain.build_dist_steps(model, tx, mesh, hop_shards)

    shard = NamedSharding(mesh, P("graph"))
    xd = jax.device_put(jnp.asarray(dist.pad_nodes(p["x"], n_pad)), shard)
    yd = jax.device_put(jnp.asarray(dist.pad_nodes(p["y"], n_pad)), shard)
    md = jax.device_put(jnp.asarray(dist.pad_nodes(p["mask"], n_pad)), shard)
    metrics = eval_step(params, xd, yd, md)

    # single-chip reference
    ah = [SparseMatrix.from_scipy(m, backend="segment") for m in p["mats"]]
    logits = model.apply(params, ah[0], jnp.asarray(p["x"]), ah)
    from h2gcn_tpu.nn import masked_accuracy, masked_softmax_cross_entropy

    acc_ref = float(masked_accuracy(logits, jnp.asarray(p["y"]),
                                    jnp.asarray(p["mask"])))
    loss_ref = float(masked_softmax_cross_entropy(logits, jnp.asarray(p["y"]),
                                                  jnp.asarray(p["mask"])))
    np.testing.assert_allclose(float(metrics["acc"]), acc_ref, atol=1e-5)
    np.testing.assert_allclose(float(metrics["loss"]), loss_ref, rtol=1e-4)


def test_dist_grads_match_single_chip(problem):
    """One no-dropout train step: distributed grads == single-chip grads."""
    p = problem
    mesh = make_mesh(8)
    conf = parse_network_setup(
        "M16-R-T1-G-V-C1-MO", p["c"], _dense_units=16
    )
    model = NetworkModel(conf, l2_regularize_weight=5e-4)
    params = model.init(jax.random.PRNGKey(0), p["f"], 2)
    tx = optax.sgd(0.5)  # big LR exposes gradient errors in one step
    opt_state = tx.init(params)

    hop_shards, n_pad = dist.shard_hops(p["mats"], 8)
    train_step, _ = ptrain.build_dist_steps(model, tx, mesh, hop_shards)
    shard = NamedSharding(mesh, P("graph"))
    xd = jax.device_put(jnp.asarray(dist.pad_nodes(p["x"], n_pad)), shard)
    yd = jax.device_put(jnp.asarray(dist.pad_nodes(p["y"], n_pad)), shard)
    md = jax.device_put(jnp.asarray(dist.pad_nodes(p["mask"], n_pad)), shard)
    new_params, _, loss = train_step(
        params, opt_state, jax.random.PRNGKey(1), xd, yd, md
    )

    # single-chip step
    ah = [SparseMatrix.from_scipy(m, backend="segment") for m in p["mats"]]

    def loss_fn(pp):
        logits = model.apply(pp, ah[0], jnp.asarray(p["x"]), ah)
        return model.loss(logits=logits, params=pp, labels=jnp.asarray(p["y"]),
                          mask=jnp.asarray(p["mask"]))

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params)
    ref_params = optax.apply_updates(params, tx.update(grads_ref, opt_state,
                                                       params)[0])
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(new_params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_dryrun_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 7)


def test_ring_dist_spmm_matches_scipy(problem):
    mesh = make_mesh(8)
    m = problem["mats"][0]
    shard, n_pad = dist.shard_matrix_ring(m, 8)
    x = dist.pad_nodes(problem["x"], n_pad)

    def body(sh, x_local):
        return dist.dist_spmm_ring(sh.local(), x_local)

    f = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P("graph"), shard),
                      P("graph")),
            out_specs=P("graph"),
            check_vma=False,
        )
    )
    y = np.asarray(f(shard, jnp.asarray(x)))[: problem["n"]]
    np.testing.assert_allclose(y, m @ problem["x"], rtol=1e-5, atol=1e-5)


def test_ring_train_matches_single_chip(problem):
    """Ring-scheduled distributed training step == single-chip step."""
    p = problem
    mesh = make_mesh(8)
    conf = parse_network_setup("M16-R-T1-G-V-C1-MO", p["c"], _dense_units=16)
    model = NetworkModel(conf, l2_regularize_weight=5e-4)
    params = model.init(jax.random.PRNGKey(0), p["f"], 2)
    tx = optax.sgd(0.5)
    opt_state = tx.init(params)

    hop_shards, n_pad = dist.shard_hops(p["mats"], 8, mode="ring")
    train_step, eval_step = ptrain.build_dist_steps(model, tx, mesh, hop_shards)
    shard = NamedSharding(mesh, P("graph"))
    xd = jax.device_put(jnp.asarray(dist.pad_nodes(p["x"], n_pad)), shard)
    yd = jax.device_put(jnp.asarray(dist.pad_nodes(p["y"], n_pad)), shard)
    md = jax.device_put(jnp.asarray(dist.pad_nodes(p["mask"], n_pad)), shard)
    new_params, _, loss = train_step(
        params, opt_state, jax.random.PRNGKey(1), xd, yd, md
    )

    ah = [SparseMatrix.from_scipy(m, backend="segment") for m in p["mats"]]

    def loss_fn(pp):
        logits = model.apply(pp, ah[0], jnp.asarray(p["x"]), ah)
        return model.loss(pp, logits, jnp.asarray(p["y"]),
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


@pytest.mark.slow
def test_distributed_cli_training(planetoid_path, tmp_path):
    """--mesh_shards through the real CLI: same accuracy as single-chip."""
    from h2gcn_tpu.run_experiments import main

    args = main([
        "H2GCN", "planetoid", "--dataset", "ind.cora",
        "--dataset_path", planetoid_path,
        "--epochs", "15", "--mesh_shards", "8", "--halo_mode", "ring",
        "--checkpoint_dir", str(tmp_path / "ck" / "{model}_{dataset}_{runname}"),
    ])
    acc = float(args.objects["best_val_stats"]["test_accuracy"])
    assert acc > 0.60


def test_halo_dist_spmm_matches_scipy(problem):
    mesh = make_mesh(8)
    for m in problem["mats"]:
        shard, n_pad = dist.shard_matrix_halo(m, 8)
        x = dist.pad_nodes(problem["x"], n_pad)

        def body(sh, x_local):
            return dist.dist_spmm_halo(sh.local(), x_local)

        f = jax.jit(
            jax.shard_map(
                body, mesh=mesh,
                in_specs=(jax.tree_util.tree_map(lambda _: P("graph"), shard),
                          P("graph")),
                out_specs=P("graph"),
                check_vma=False,
            )
        )
        y = np.asarray(f(shard, jnp.asarray(x)))[: problem["n"]]
        np.testing.assert_allclose(y, m @ problem["x"], rtol=1e-5, atol=1e-5)


def test_halo_train_matches_single_chip(problem):
    """Boundary-exchange distributed train step == single-chip step."""
    p = problem
    mesh = make_mesh(8)
    conf = parse_network_setup("M16-R-T1-G-V-C1-MO", p["c"], _dense_units=16)
    model = NetworkModel(conf, l2_regularize_weight=5e-4)
    params = model.init(jax.random.PRNGKey(0), p["f"], 2)
    tx = optax.sgd(0.5)
    opt_state = tx.init(params)

    hop_shards, n_pad = dist.shard_hops(p["mats"], 8, mode="halo")
    train_step, _ = ptrain.build_dist_steps(model, tx, mesh, hop_shards)
    shard = NamedSharding(mesh, P("graph"))
    xd = jax.device_put(jnp.asarray(dist.pad_nodes(p["x"], n_pad)), shard)
    yd = jax.device_put(jnp.asarray(dist.pad_nodes(p["y"], n_pad)), shard)
    md = jax.device_put(jnp.asarray(dist.pad_nodes(p["mask"], n_pad)), shard)
    new_params, _, loss = train_step(
        params, opt_state, jax.random.PRNGKey(1), xd, yd, md
    )

    ah = [SparseMatrix.from_scipy(m, backend="segment") for m in p["mats"]]

    def loss_fn(pp):
        logits = model.apply(pp, ah[0], jnp.asarray(p["x"]), ah)
        return model.loss(pp, logits, jnp.asarray(p["y"]),
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


@pytest.mark.slow
def test_distributed_blocked_cli(planetoid_path, tmp_path):
    """--mesh_shards + --epochs_per_block + halo mode compose through the
    CLI and reproduce single-chip accuracy."""
    from h2gcn_tpu.run_experiments import main

    args = main([
        "H2GCN", "planetoid", "--dataset", "ind.cora",
        "--dataset_path", planetoid_path,
        "--epochs", "20", "--mesh_shards", "8", "--halo_mode", "halo",
        "--epochs_per_block", "8",
        "--checkpoint_dir", str(tmp_path / "ck" / "{model}_{dataset}_{runname}"),
    ])
    assert float(args.objects["best_val_stats"]["test_accuracy"]) > 0.6


def test_halo_interior_reduce_independent_of_exchange(problem):
    """Overlap evidence (VERDICT #5): in the traced program, the interior
    segment reduce has NO data dependence on the all_to_all — XLA's
    latency-hiding scheduler is therefore free to run the boundary exchange
    underneath it. Verified structurally on the jaxpr: the interior
    scatter-add's transitive inputs exclude the collective's outputs, while
    the final output depends on both."""
    mesh = make_mesh(8)
    m = problem["mats"][0]
    shard, n_pad = dist.shard_matrix_halo(m, 8)
    x = dist.pad_nodes(problem["x"], n_pad)

    def body(sh, x_local):
        return dist.dist_spmm_halo(sh.local(), x_local)

    wrapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P("graph"), shard),
                  P("graph")),
        out_specs=P("graph"),
        check_vma=False,
    )
    jaxpr = jax.make_jaxpr(wrapped)(shard, jnp.asarray(x))

    # descend into the shard_map body
    inner = None
    for eqn in jaxpr.jaxpr.eqns:
        if "jaxpr" in eqn.params:
            inner = eqn.params["jaxpr"]
            inner = getattr(inner, "jaxpr", inner)
            break
    assert inner is not None

    tainted = set()  # vars transitively derived from the all_to_all
    scatter_indep = scatter_dep = 0
    saw_a2a = False
    for eqn in inner.eqns:
        dep = any(str(v) in tainted for v in eqn.invars
                  if not isinstance(v, jax.extend.core.Literal))
        name = eqn.primitive.name
        if name == "all_to_all":
            saw_a2a = True
            dep = True
        if dep:
            tainted.update(str(v) for v in eqn.outvars)
        if name in ("scatter-add", "scatter_add", "segment_sum"):
            if dep:
                scatter_dep += 1
            else:
                scatter_indep += 1
    assert saw_a2a, "halo SpMM must lower to an all_to_all"
    assert scatter_indep >= 1, "interior reduce must not wait on the exchange"
    assert scatter_dep >= 1, "halo reduce must consume the exchange"
    # the result combines both partial reductions
    assert any(str(v) in tainted for v in inner.outvars)


def test_halo_self_rows_never_travel(problem):
    """The overlap split also removes self-shard rows from the exchange:
    send_idx[d, d] must be all-padding (zeros) for every shard."""
    shard, _ = dist.shard_matrix_halo(problem["mats"][1], 8)
    send = np.asarray(shard.send_idx)
    for d in range(8):
        np.testing.assert_array_equal(send[d, d], 0)


def test_halo_cootile_dist_spmm_matches_scipy(problem):
    """MXU-blocked halo mode: local COO-tile reduces + boundary all_to_all
    reproduce the scipy product (kernel in interpret mode on the CPU mesh)."""
    mesh = make_mesh(8)
    for m in problem["mats"]:
        shard, n_pad = dist.shard_matrix_halo_cootile(m, 8, tile=64, e_b=64)
        x = dist.pad_nodes(problem["x"], n_pad)

        def body(sh, x_local):
            return dist.dist_spmm_halo_cootile(sh.local(), x_local)

        f = jax.jit(
            jax.shard_map(
                body, mesh=mesh,
                in_specs=(jax.tree_util.tree_map(lambda _: P("graph"), shard),
                          P("graph")),
                out_specs=P("graph"),
                check_vma=False,
            )
        )
        y = np.asarray(f(shard, jnp.asarray(x)))[: problem["n"]]
        np.testing.assert_allclose(y, m @ problem["x"], rtol=1e-5, atol=1e-5)


def test_halo_cootile_train_matches_single_chip(problem):
    """Distributed train step over halo-cootile shards == single-chip step
    (gradients flow through the kernel's custom VJP transpose tables)."""
    p = problem
    mesh = make_mesh(8)
    conf = parse_network_setup("M16-R-T1-G-V-C1-MO", p["c"], _dense_units=16)
    model = NetworkModel(conf, l2_regularize_weight=5e-4)
    params = model.init(jax.random.PRNGKey(0), p["f"], 2)
    tx = optax.sgd(0.5)
    opt_state = tx.init(params)

    hop_shards, n_pad = dist.shard_hops(p["mats"], 8, mode="halo-cootile")
    train_step, _ = ptrain.build_dist_steps(model, tx, mesh, hop_shards)
    shard = NamedSharding(mesh, P("graph"))
    xd = jax.device_put(jnp.asarray(dist.pad_nodes(p["x"], n_pad)), shard)
    yd = jax.device_put(jnp.asarray(dist.pad_nodes(p["y"], n_pad)), shard)
    md = jax.device_put(jnp.asarray(dist.pad_nodes(p["mask"], n_pad)), shard)
    new_params, _, loss = train_step(
        params, opt_state, jax.random.PRNGKey(1), xd, yd, md
    )

    ah = [SparseMatrix.from_scipy(m, backend="segment") for m in p["mats"]]

    def loss_fn(pp):
        logits = model.apply(pp, ah[0], jnp.asarray(p["x"]), ah)
        return model.loss(pp, logits, jnp.asarray(p["y"]),
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
