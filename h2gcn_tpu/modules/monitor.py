"""Runtime monitors: degree-binned accuracy and gradient ranges.

Reference: h2gcn/modules/monitor.py:6-55. The degree-accuracy monitor buckets
nodes by adjacency degree and reports per-bucket masked accuracy for each
scope; the gradient monitor prints per-variable (min, |min|, max) ranges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.metrics import masked_accuracy


def add_subparser_args(parser):
    group = parser.add_argument_group("Monitor arguments (modules/monitor.py)")
    group.add_argument("--deg_acc_monitor", default=[], type=float, nargs="+")
    group.add_argument("--grad_monitor", default=False, action="store_true")


def deg_acc_monitor(args, degree_bins, adj, predictions, y_sample, sample_mask,
                    sample_name, stats_dict=None):
    if stats_dict is None:
        stats_dict = dict()
    degree = jnp.asarray(np.asarray(adj.to_scipy().sum(axis=1)).ravel())
    sample_mask = jnp.asarray(sample_mask).astype(bool)
    prev_mask = None
    accs, counts = [], []

    def record(mask_range):
        mask_range = jnp.logical_and(sample_mask, mask_range)
        accs.append(float(masked_accuracy(predictions, y_sample, mask_range)))
        counts.append(int(jnp.sum(mask_range.astype(jnp.int32))))

    for b in degree_bins:
        deg_mask = degree <= b
        mask_range = (
            deg_mask if prev_mask is None else jnp.logical_and(~prev_mask, deg_mask)
        )
        prev_mask = deg_mask
        record(mask_range)
    record(~prev_mask if prev_mask is not None else jnp.ones_like(sample_mask))

    print(
        f"[deg_acc_monitor - {degree_bins} - {counts} - {sample_name} Acc] {accs}"
    )
    stats_dict[f"deg_acc_{sample_name}"] = dict(
        bins=list(degree_bins), counts=counts, acc=accs
    )
    if args.use_signac:
        job = args.objects["signac_job"]
        job.data[f"deg_acc/{sample_name}/bins"] = np.array(degree_bins)
        job.data[f"deg_acc/{sample_name}/counts"] = np.array(counts)
        job.data[f"deg_acc/{sample_name}/acc"] = np.array(accs)
    return stats_dict


def grad_monitor(params, grads):
    """Print per-leaf gradient ranges (reference monitor.py:52-55)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    parts = []
    for path, g in flat:
        g = np.asarray(g)
        name = jax.tree_util.keystr(path)
        parts.append(
            f"[{name}] ({g.min():.2e}, {np.abs(g).min():.2e}, {g.max():.2e})"
        )
    print("Gradient range: " + "  ".join(parts))
