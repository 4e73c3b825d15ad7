"""Multi-chip scaling benchmark: distributed aggregation edges/s vs mesh size.

Measures the edge-partitioned SpMM (both halo modes) and the full
distributed H2GCN-2 train step at 1/2/4/8-way sharding, reporting edges/s
and scaling efficiency relative to 1-way. On a machine without multiple
accelerators, run with virtual CPU devices to validate the harness:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS='' \
        python bench_scaling.py --platform cpu

On a real pod slice the same script reports the BASELINE.md scaling target
(≥70% efficiency 1→4 hosts).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=10_000)
    parser.add_argument("--features", type=int, default=64)
    parser.add_argument("--edges", type=int, default=60_000)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--modes", nargs="*",
                        default=["ring", "allgather", "halo"],
                        help="halo modes and/or 'gat' (dest-stripe "
                             "distributed gather attention)")
    parser.add_argument("--gat_n", type=int, default=2000,
                        help="graph size for the gat mode (its Pallas "
                             "kernel runs INTERPRET mode on CPU meshes — "
                             "keep small there; raise on real chips)")
    parser.add_argument("--out", default=None,
                        help="also write the report JSON to this path")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bench import build_graph, timeit
    from h2gcn_tpu.parallel import dist, mesh as pmesh
    from h2gcn_tpu.sparse import transforms

    n_dev = len(jax.devices())
    A = build_graph(args.n, args.edges)
    hops = transforms.nhood_split(A, 2)
    mats = [transforms.normalize(hops[1]), transforms.normalize(hops[2])]
    nnz_total = sum(m.nnz for m in mats)
    rng = np.random.default_rng(0)

    report = {"devices": n_dev, "platform": jax.devices()[0].platform,
              "n": args.n, "nnz": int(nnz_total), "modes": {}}

    shard_counts = [s for s in (1, 2, 4, 8, 16) if s <= n_dev]

    def gat_mode():
        """Distributed dest-stripe gather attention (parallel/attention.py)
        per mesh size: one full 8×8-head fused layer incl. the [f2|h]
        boundary all_to_all."""
        import scipy.sparse as sp

        from h2gcn_tpu.parallel import attention as pattn
        from h2gcn_tpu.sparse.pallas_attention_gather import (
            gat_attention_gather)

        H, F = 8, 8
        ng = args.gat_n
        Ag = build_graph(ng, 6 * ng)
        support = ((Ag + sp.eye(ng)) > 0).astype(np.float32)
        interpret = jax.default_backend() not in ("tpu", "gpu")
        per = {}
        for p in shard_counts:
            mesh = pmesh.make_mesh(p)
            dga, n_pad = pattn.shard_attention_gather(support, p)
            sharding = NamedSharding(mesh, P("graph"))
            f1 = jax.device_put(jnp.asarray(dist.pad_nodes(
                rng.standard_normal((ng, H)).astype(np.float32), n_pad)),
                sharding)
            f2 = jax.device_put(jnp.asarray(dist.pad_nodes(
                rng.standard_normal((ng, H)).astype(np.float32), n_pad)),
                sharding)
            h = jax.device_put(jnp.asarray(dist.pad_nodes(
                rng.standard_normal((ng, H * F)).astype(np.float32),
                n_pad)), sharding)

            def body(f1l, f2l, hl, dg):
                sh = dg.local()
                cat = pattn.halo_concat(
                    sh, jnp.concatenate([f2l, hl], axis=1))
                return gat_attention_gather(
                    sh.attn, f1l, cat[:, :H], cat[:, H:], num_heads=H,
                    feat=F, n_out=sh.n_local, interpret=interpret)

            fn = jax.jit(jax.shard_map(
                body, mesh=mesh,
                in_specs=(P("graph"),) * 3
                + (jax.tree_util.tree_map(lambda _: P("graph"), dga),),
                out_specs=P("graph"), check_vma=False,
            ))
            t = timeit(lambda: fn(f1, f2, h, dga), warmup=2, iters=5)
            per[p] = dict(time_s=t, edges_per_s=support.nnz / t)
        base = per[shard_counts[0]]["edges_per_s"]
        for p in shard_counts:
            per[p]["scaling_efficiency"] = (
                per[p]["edges_per_s"] / (base * p / shard_counts[0]))
        per["n"] = ng
        per["nnz"] = int(support.nnz)
        return per

    for mode in args.modes:
        if mode == "gat":
            report["modes"]["gat"] = gat_mode()
            continue
        per_mode = {}
        for p in shard_counts:
            mesh = pmesh.make_mesh(p)
            hop_shards, n_pad = dist.shard_hops(mats, p, mode=mode)
            x = dist.pad_nodes(
                rng.standard_normal((args.n, args.features)).astype(np.float32),
                n_pad,
            )
            sharding = NamedSharding(mesh, P("graph"))
            xd = jax.device_put(jnp.asarray(x), sharding)

            hop_specs = tuple(
                jax.tree_util.tree_map(lambda _: P("graph"), h)
                for h in hop_shards
            )

            def body(x_local, *hs):
                locs = [h.local() for h in hs]
                outs = []
                for loc in locs:
                    if mode == "ring":
                        outs.append(dist.dist_spmm_ring(loc, x_local))
                    elif mode == "halo":
                        outs.append(dist.dist_spmm_halo(loc, x_local))
                    elif mode == "halo-cootile":
                        outs.append(dist.dist_spmm_halo_cootile(loc, x_local))
                    else:
                        outs.append(dist.dist_spmm(loc, x_local))
                return tuple(outs)

            f = jax.jit(
                jax.shard_map(
                    body, mesh=mesh,
                    in_specs=(P("graph"),) + hop_specs,
                    out_specs=(P("graph"),) * len(hop_shards),
                    check_vma=False,
                )
            )
            t = timeit(lambda: f(xd, *hop_shards), warmup=3, iters=10)
            per_mode[p] = dict(time_s=t, edges_per_s=nnz_total / t)
        base = per_mode[shard_counts[0]]["edges_per_s"]
        for p in shard_counts:
            per_mode[p]["scaling_efficiency"] = (
                per_mode[p]["edges_per_s"] / (base * p / shard_counts[0])
            )
        report["modes"][mode] = per_mode

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, default=float)
    print(json.dumps(report, indent=1, default=float))


if __name__ == "__main__":
    main()
