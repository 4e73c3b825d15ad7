"""Multi-chip dry run: one distributed H2GCN-2 train step on tiny shapes.

Used by ``__graft_entry__.dryrun_multichip`` and the sharding tests; runs on
N virtual CPU devices or real chips interchangeably.
"""

from __future__ import annotations

import numpy as np


def run(n_devices: int, n: int = 64, f: int = 32, c: int = 5, seed: int = 0,
        mode: str = "ring"):
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..nn import NetworkModel, parse_network_setup
    from ..sparse import transforms
    from . import train as ptrain
    from .dist import pad_nodes, shard_hops
    from .mesh import make_mesh

    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=0.1, random_state=seed, format="csr")
    A = ((A + A.T) > 0).astype(np.float32)
    A = transforms.remove_eye(A)

    if mode == "gat":
        return _run_gat(n_devices, A, f, c, seed)

    hops = transforms.nhood_split(A, 2)
    while len(hops) < 3:
        hops.append(hops[-1])
    mats = [transforms.normalize(hops[1]), transforms.normalize(hops[2])]

    mesh = make_mesh(n_devices)
    hop_shards, n_pad = shard_hops(mats, n_devices, mode=mode)

    x = pad_nodes(rng.standard_normal((n, f)).astype(np.float32), n_pad)
    y = np.zeros((n, c), np.float32)
    y[np.arange(n), rng.integers(0, c, n)] = 1
    y = pad_nodes(y, n_pad)
    mask = pad_nodes((rng.random(n) < 0.5), n_pad)

    conf = parse_network_setup(
        "M16-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO", c, _dense_units=16,
        _dropout_rate=0.5,
    )
    model = NetworkModel(conf, l2_regularize_weight=5e-4)
    params = model.init(jax.random.PRNGKey(seed), f, 2)

    import optax

    tx = optax.adam(0.01, eps=1e-7)
    opt_state = tx.init(params)

    train_step, eval_step = ptrain.build_dist_steps(
        model, tx, mesh, hop_shards
    )

    shard = NamedSharding(mesh, P("graph"))
    xd = jax.device_put(jnp.asarray(x), shard)
    yd = jax.device_put(jnp.asarray(y), shard)
    md = jax.device_put(jnp.asarray(mask), shard)

    params, opt_state, loss = train_step(
        params, opt_state, jax.random.PRNGKey(1), xd, yd, md
    )
    metrics = eval_step(params, xd, yd, md)
    loss = float(loss)
    acc = float(metrics["acc"])
    assert np.isfinite(loss), f"non-finite distributed loss: {loss}"
    assert 0.0 <= acc <= 1.0 + 1e-5
    print(f"dryrun_multichip({n_devices}, {mode}): "
          f"loss={loss:.4f} acc={acc:.3f}")
    return dict(loss=loss, acc=acc, params=params)


def _run_gat(n_devices: int, A, f: int, c: int, seed: int):
    """One distributed GAT train step: dest-stripe-sharded gather
    attention with per-layer [f2|h] boundary exchange
    (parallel/attention.py)."""
    import jax
    import jax.numpy as jnp
    import optax
    import scipy.sparse as sp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from . import train as ptrain
    from .attention import DistGATNetwork, shard_attention_gather
    from .dist import pad_nodes
    from .mesh import make_mesh

    n = A.shape[0]
    rng = np.random.default_rng(seed)
    support = ((A + sp.eye(n, format="csr")) > 0).astype(np.float32)
    mesh = make_mesh(n_devices)
    dga, n_pad = shard_attention_gather(support, n_devices)

    x = pad_nodes(rng.standard_normal((n, f)).astype(np.float32), n_pad)
    y = np.zeros((n, c), np.float32)
    y[np.arange(n), rng.integers(0, c, n)] = 1
    y = pad_nodes(y, n_pad)
    mask = pad_nodes((rng.random(n) < 0.5), n_pad)

    model = DistGATNetwork(c, hid_units=[8], n_heads=[2, 1],
                           in_drop=0.4, attn_drop=0.4)
    params = model.init(jax.random.PRNGKey(seed), f)
    tx = optax.adam(0.005, eps=1e-7)
    opt_state = tx.init(params)
    train_step, eval_step = ptrain.build_dist_steps(model, tx, mesh, [dga])

    shard = NamedSharding(mesh, P("graph"))
    xd = jax.device_put(jnp.asarray(x), shard)
    yd = jax.device_put(jnp.asarray(y), shard)
    md = jax.device_put(jnp.asarray(mask), shard)

    params, opt_state, loss = train_step(
        params, opt_state, jax.random.PRNGKey(1), xd, yd, md
    )
    metrics = eval_step(params, xd, yd, md)
    loss = float(loss)
    acc = float(metrics["acc"])
    assert np.isfinite(loss), f"non-finite distributed GAT loss: {loss}"
    assert 0.0 <= acc <= 1.0 + 1e-5
    print(f"dryrun_multichip({n_devices}, gat): "
          f"loss={loss:.4f} acc={acc:.3f}")
    return dict(loss=loss, acc=acc, params=params)
