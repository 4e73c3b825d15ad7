"""Programmatic-API example: train H2GCN-2 without the CLI.

Shows the functional core directly: load a dataset, build the hop tensors,
compile a layer program from the DSL, and run a fused train/eval loop.

    python examples/train_h2gcn_api.py --dataset_path <planetoid-dir>
"""

import argparse

import jax
import jax.numpy as jnp
import optax

from h2gcn_tpu.datasets._dataset import PlanetoidData
from h2gcn_tpu.nn import (
    NetworkModel,
    masked_accuracy,
    parse_network_setup,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ind.cora")
    ap.add_argument("--dataset_path", required=True)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # 1. data: reference preprocessing semantics, device export
    ds = PlanetoidData(args.dataset, args.dataset_path, val_size=500)
    ds.row_normalize_features()
    ds.adj_remove_eye()
    t = ds.get_tensors(get_adj_norm_hops=["1", "2"])

    # 2. model: H2GCN-2 as a DSL layer program
    conf = parse_network_setup(
        "M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO", ds.num_labels,
        _dense_units=64, _dropout_rate=0.5,
    )
    model = NetworkModel(conf, l2_regularize_weight=5e-4)
    params = model.init(jax.random.PRNGKey(0), ds.feature_dim, 2)
    tx = optax.adam(0.01, eps=1e-7)
    opt_state = tx.init(params)

    # 3. one fused XLA program per step
    @jax.jit
    def step(params, opt_state, rng, hops, x, y, mask):
        def loss_fn(p):
            logits = model.apply(p, hops[0], x, hops, training=True, rng=rng)
            return model.loss(p, logits, y, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def evaluate(params, hops, x):
        return model.apply(params, hops[0], x, hops, training=False)

    hops = list(t.adj_hops)
    key = jax.random.PRNGKey(1)
    for epoch in range(1, args.epochs + 1):
        params, opt_state, loss = step(
            params, opt_state, jax.random.fold_in(key, epoch),
            hops, t.features, t.y_train, t.train_mask,
        )
        if epoch % 20 == 0:
            logits = evaluate(params, hops, t.features)
            val = masked_accuracy(logits, t.y_val, t.val_mask)
            test = masked_accuracy(logits, t.y_test, t.test_mask)
            print(f"epoch {epoch:4d}  loss {float(loss):.4f}  "
                  f"val {float(val):.3f}  test {float(test):.3f}")


if __name__ == "__main__":
    main()
