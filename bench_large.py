"""Large-graph benchmark: the regime where the dense backend is impossible.

VERDICT #3: a ~250K-node power-law graph whose Â₁+Â₂ working set
(~25M nnz) rules out the dense-MXU payload entirely (250K² f32 = 250GB).
Measures, and writes to ``docs/bench_large.json``:

* exact-hop precompute: scipy vs native OpenMP vs the distributed
  row-sharded spgemm (h2gcn_tpu/parallel/spgemm.py) at 1/2/4 workers,
  with measured halo-exchange volume;
* single-chip aggregation edges/s for every backend that fits: segment
  (gather + sorted segment-sum) always, BSR only if its block payload fits
  device memory — block counts are reported for the natural and RCM-reordered
  orderings either way, so the block-occupancy economics at this scale are
  recorded numbers, not assumptions;
* an HBM roofline figure for the segment path.

Usage: python bench_large.py [--n 250000] [--edges 1250000] [--skip_tpu]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import scipy.sparse as sp

from bench import build_graph, interleaved_timeit, spmm_bytes, tpu_hbm_bw

# BSR payload budget: beyond this the backend is recorded as infeasible
_BSR_PAYLOAD_BUDGET_GB = 6.0


def count_bsr_blocks(a: sp.csr_matrix, block=128) -> int:
    coo = a.tocoo()
    ncb = -(-a.shape[1] // block)
    return int(np.unique((coo.row // block).astype(np.int64) * ncb
                         + coo.col // block).size)


def build_sbm_graph(n, m_edges, n_blocks=200, p_in=0.9, seed=0,
                    shuffle=True):
    """Stochastic-block-model graph: ``p_in`` of edges fall inside one of
    ``n_blocks`` equal communities, the rest are uniform background.

    Real at-scale graphs (ogbn-products, social/web graphs) have strong
    community structure — unlike the adversarial uniform power-law default,
    an ordering pass can actually recover locality here. Nodes are
    SHUFFLED before output (``shuffle=True``) so the natural order carries
    no hint of the planted communities: whatever tile locality the
    benchmark measures under ``--reorder`` was *found* by
    ``cluster_order``, not given away by construction.
    """
    rng = np.random.default_rng(seed)
    bs = n // n_blocks
    n_in = int(m_edges * p_in)
    blk = rng.integers(0, n_blocks, size=n_in)
    src_in = blk * bs + rng.integers(0, bs, size=n_in)
    dst_in = blk * bs + rng.integers(0, bs, size=n_in)
    n_out = m_edges - n_in
    src_out = rng.integers(0, n, size=n_out)
    dst_out = rng.integers(0, n, size=n_out)
    src = np.concatenate([src_in, src_out])
    dst = np.concatenate([dst_in, dst_out])
    if shuffle:
        perm = rng.permutation(n)
        src, dst = perm[src], perm[dst]
    keep = src != dst
    src, dst = src[keep], dst[keep]
    a = sp.coo_matrix(
        (np.ones(len(src), np.float32), (src, dst)), shape=(n, n))
    a = ((a + a.T) > 0).astype(np.float32)
    return a.tocsr()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=250_000)
    ap.add_argument("--edges", type=int, default=400_000,
                    help="~400K edges -> ~22M-nnz hop2 at n=250K (the "
                         "VERDICT #3 regime); heavier tails explode "
                         "quadratically through the hubs")
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--graph", choices=("powerlaw", "sbm"),
                    default="powerlaw",
                    help="powerlaw = uniform zipf tail (adversarial for any "
                         "ordering pass); sbm = planted-community graph "
                         "with shuffled node ids (the realistic regime "
                         "where cluster_order recovers tile locality)")
    ap.add_argument("--skip_tpu", action="store_true",
                    help="host-side (precompute) benchmark only")
    ap.add_argument("--skip_train_epoch", action="store_true",
                    help="skip the fused full-train-step measurement")
    ap.add_argument("--skip_agg", action="store_true",
                    help="skip the per-backend aggregation timing (train "
                         "step only — merges into an existing --out)")
    ap.add_argument("--out", default="docs/bench_large.json")
    args = ap.parse_args()

    report = {"n": args.n, "m_requested": args.edges,
              "features": args.features, "graph": args.graph}
    if args.graph == "sbm":
        A = build_sbm_graph(args.n, args.edges, seed=0)
    else:
        A = build_graph(args.n, args.edges, seed=0)
    report["nnz_adj"] = int(A.nnz)

    from h2gcn_tpu.parallel.spgemm import dist_nhood_split
    from h2gcn_tpu.sparse import transforms

    # --- precompute: scipy vs native OpenMP vs distributed ------------------
    t0 = time.perf_counter()
    hops_ref = transforms.nhood_split(A, 2, use_native=False)
    report["precompute_scipy_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    hops = transforms.nhood_split(A, 2)
    report["precompute_native_omp_s"] = time.perf_counter() - t0
    assert all((h1 != h2).nnz == 0 for h1, h2 in zip(hops, hops_ref))

    # threads = the production transport (shared memory IS the single-host
    # interconnect); processes = the semantics-faithful DCN mode whose
    # pickle shipping is measured, not hidden (it anti-scaled in round 2)
    report["precompute_dist"] = {}
    import multiprocessing as mp
    from concurrent.futures import ProcessPoolExecutor

    from h2gcn_tpu.parallel.spgemm import _init_worker

    for transport in ("threads", "processes"):
        rep_t = report["precompute_dist"].setdefault(transport, {})
        for workers in (1, 2, 4):
            pool = None
            if transport == "processes" and workers > 1:
                # pool startup (spawn + interpreter boot) is excluded: a
                # real deployment holds its workers for the whole job
                pool = ProcessPoolExecutor(
                    max_workers=workers, initializer=_init_worker,
                    mp_context=mp.get_context("spawn"))
                # force every worker to boot now (concurrent sleeps pin
                # them all)
                for fut in [pool.submit(time.sleep, 1.0)
                            for _ in range(workers)]:
                    fut.result()
            best, stats = np.inf, None
            for _ in range(2 if transport == "threads" else 1):
                t0 = time.perf_counter()
                hd, stats = dist_nhood_split(
                    A, 2, n_workers=workers, return_stats=True, pool=pool,
                    transport=transport)
                best = min(best, time.perf_counter() - t0)
            if pool is not None:
                pool.shutdown()
            assert all((h1 != h2).nnz == 0
                       for h1, h2 in zip(hd, hops_ref))
            rep_t[workers] = {
                "time_s": best,
                "halo_rows": stats.halo_rows,
                "halo_mbytes": round(stats.total_halo_bytes / 1e6, 2),
            }

    a1 = transforms.normalize(hops[1])
    a2 = transforms.normalize(hops[2])
    nnz_total = a1.nnz + a2.nnz
    report["nnz_hop1"], report["nnz_hop2"] = int(a1.nnz), int(a2.nnz)

    # --- BSR feasibility at this scale (natural vs RCM vs hub clustering) ---
    t0 = time.perf_counter()
    union = ((a1 + a2) > 0).astype(np.float32)  # what aggregation touches
    perms = {
        "rcm": transforms.cluster_order(union, method="rcm"),
        "cluster": transforms.cluster_order(union, method="cluster"),
    }
    report["reorder_s"] = time.perf_counter() - t0
    bsr_stats = {}
    ordered = {"natural": (a1, a2)}
    for name, perm in perms.items():
        ordered[name] = (transforms.permute_graph(a1, perm),
                         transforms.permute_graph(a2, perm))
    for name, (m1, m2) in ordered.items():
        nb = count_bsr_blocks(m1) + count_bsr_blocks(m2)
        payload_gb = nb * 128 * 128 * 2 / 1e9  # bf16
        bsr_stats[name] = {
            "blocks": nb,
            "payload_gb_bf16": round(payload_gb, 2),
            "occupancy_nnz_per_block": round(nnz_total / nb, 2),
            "feasible": payload_gb <= _BSR_PAYLOAD_BUDGET_GB,
        }
    report["bsr"] = bsr_stats
    best_order = min(bsr_stats, key=lambda k: bsr_stats[k]["blocks"])
    report["bsr_order_used"] = best_order
    bsr_feasible = bsr_stats[best_order]["feasible"]
    a1b, a2b = ordered[best_order]

    # --- single-chip aggregation --------------------------------------------
    if not args.skip_tpu:
        import jax
        import jax.numpy as jnp

        from h2gcn_tpu.sparse import SparseMatrix, spmm

        float(jnp.zeros(()))  # eat the first-readback stall
        report["platform"] = jax.devices()[0].platform
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.standard_normal((args.n, args.features)).astype(np.float32))
        agg = jax.jit(lambda s1, s2, xx: (spmm(s1, xx), spmm(s2, xx)))

        fns, sol = {}, {}
        bw, gen = tpu_hbm_bw()
        report["tpu_generation"] = gen
        if args.skip_agg:
            # train-step-only mode: merge into the existing artifact so the
            # aggregation numbers from a prior run survive (keys from THIS
            # partial run overwrite the prior file's — intentional refresh)
            if os.path.exists(args.out):
                with open(args.out) as f:
                    prior = json.load(f)
                prior.update(report)
                report = prior
            # build just the backend the train step uses
            built = {}
            for tag, prec in (("f32", "highest"), ("bf16", "default")):
                p1, p2 = ordered["cluster"]
                built[f"cootile-cluster/{tag}"] = (
                    SparseMatrix.from_scipy(p1, backend="cootile",
                                            precision=prec),
                    SparseMatrix.from_scipy(p2, backend="cootile",
                                            precision=prec), p1, p2)
            del a1b, a2b
        else:
            m1 = SparseMatrix.from_scipy(a1, backend="segment")
            m2 = SparseMatrix.from_scipy(a2, backend="segment")
            fns["segment/f32"] = lambda m1=m1, m2=m2: agg(m1, m2, x)
            sol["segment/f32"] = sum(
                spmm_bytes("segment", "f32", m, args.n, args.features)
                for m in (a1, a2)) / bw
            # COO-tile kernel: the payload-free at-scale path (pallas_cootile),
            # in natural order and under the hub-clustering reorder (the kernel
            # pays one x-tile HBM read per visited tile, so the reorder's tile
            # reduction is direct HBM traffic savings)
            t0 = time.perf_counter()
            built = {}
            geo = {}
            for label, (p1, p2) in (("cootile", (a1, a2)),
                                    ("cootile-cluster", ordered["cluster"])):
                for tag, prec in (("f32", "highest"), ("bf16", "default")):
                    # geometry is precision-dependent (auto_geometry's MXU
                    # roof differs 3x between bf16 and split-3 exact mode),
                    # so each precision gets its own build
                    k1 = SparseMatrix.from_scipy(p1, backend="cootile",
                                                 precision=prec)
                    k2 = SparseMatrix.from_scipy(p2, backend="cootile",
                                                 precision=prec)
                    built[f"{label}/{tag}"] = (k1, k2, p1, p2)
                    geo[f"{label}/{tag}"] = {
                        "hop1": (k1.coot.tile, k1.coot.e_b, k1.coot.kb),
                        "hop2": (k2.coot.tile, k2.coot.e_b, k2.coot.kb)}
            report["cootile_build_s"] = time.perf_counter() - t0
            report["cootile_geometry"] = geo
            for key, (k1, k2, p1, p2) in built.items():
                tag = key.split("/")[1]
                fns[key] = (lambda k1=k1, k2=k2: agg(k1, k2, x))
                # roofline: edge chunks + one x tile per CHUNK (each slot
                # operand of an 8-chunk block DMAs its own tile; bf16 mode
                # stores the x tiles in bf16 — 2 bytes/elem)
                xbytes = 4 if tag == "f32" else 2
                coot_bytes = 0.0
                for cm in (k1, k2):
                    nch = sum(s.ctr.shape[0] for s in cm.coot.segments)
                    coot_bytes += (nch * cm.coot.e_b * 12
                                   + nch * cm.coot.tile * 128 * xbytes
                                   + args.n * args.features * 4)
                sol[key] = coot_bytes / bw
            # gather-scatter backend (pallas_gscatter): the ultra-sparse path —
            # XLA edge-major gather + one-hot MXU scatter; auto routes here
            # below ~32 nnz per occupied 512-tile
            g1 = SparseMatrix.from_scipy(a1, backend="gscatter")
            g2 = SparseMatrix.from_scipy(a2, backend="gscatter")

            # hop2's gather chain must not run concurrently with hop1's (the
            # combined transient gathered buffers exhaust HBM at 34M edges)
            @jax.jit
            def gsc_agg(s1, s2, xx):
                y1 = spmm(s1, xx)
                xx2, _ = jax.lax.optimization_barrier((xx, y1[0, 0]))
                return y1, spmm(s2, xx2)

            for tag, prec in (("f32", "highest"), ("bf16", "default")):
                # the chunk tables are precision-independent — one build,
                # two precision views (no duplicate device payloads)
                v1, v2 = g1.replace(precision=prec), g2.replace(precision=prec)
                built[f"gscatter/{tag}"] = (v1, v2, a1, a2)
                fns[f"gscatter/{tag}"] = (lambda g1=v1, g2=v2: gsc_agg(g1, g2, x))
                xbytes = 4 if tag == "f32" else 2
                gsc_bytes = 0.0
                for gm in (g1, g2):
                    slots = sum(s.cols.shape[0] for s in gm.gsc.segments)
                    # gather pass: read x rows + write gathered; kernel pass:
                    # read gathered + rows tables; output flush
                    gsc_bytes += (slots * args.features * xbytes * 3
                                  + slots * 8
                                  + args.n * args.features * 4)
                sol[f"gscatter/{tag}"] = gsc_bytes / bw
            if bsr_feasible:
                for tag, kw in (("f32", {}), ("bf16",
                                              dict(payload_dtype="bfloat16",
                                                   precision="default"))):
                    b1 = SparseMatrix.from_scipy(a1b, backend="bsr", **kw)
                    b2 = SparseMatrix.from_scipy(a2b, backend="bsr", **kw)
                    fns[f"bsr/{tag}"] = lambda b1=b1, b2=b2: agg(b1, b2, x)
                    sol[f"bsr/{tag}"] = sum(
                        spmm_bytes("bsr", tag, m, args.n, args.features)
                        for m in (a1b, a2b)) / bw

            # two timing GROUPS with the segment path as the common anchor:
            # all backends resident at once exhausted HBM at n=1M (the
            # gscatter/f32 warmup's gathered buffer on top of four cootile
            # variants' tables). Interleaving stays honest within each group
            # and the shared anchor exposes any cross-group relay drift.
            gsc_keys = [k for k in fns if k.startswith("gscatter/")]
            grp1 = {k: v for k, v in fns.items() if k not in gsc_keys}
            timed = interleaved_timeit(grp1, rounds=3, iters=3, warmup=1)
            if gsc_keys:
                grp2 = {k: fns[k] for k in ["segment/f32"] + gsc_keys}
                timed2 = interleaved_timeit(grp2, rounds=3, iters=3, warmup=1)
                report["segment_anchor_group2_s"] = timed2["segment/f32"][0]
                for k in gsc_keys:
                    timed[k] = timed2[k]
            report["agg_edges_per_s"] = {
                name: nnz_total / t for name, (t, _) in timed.items()
            }
            report["roofline"] = {
                name: {"sol_ms": round(sol[name] * 1e3, 2),
                       "achieved_ms": round(timed[name][0] * 1e3, 2),
                       "frac_of_sol": round(sol[name] / timed[name][0], 3)}
                for name in timed
            }
            # checkpoint the report before the train-step section (which can
            # OOM at the largest scales) so the aggregation numbers survive
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "w") as f:
                json.dump(report, f, indent=1, default=float)

            # release the device tables of every backend the train step won't
            # use — at n=1M the extra cootile/segment variants hold several GB
            # of HBM that the backward pass needs
            import gc

            fns.clear()
            grp1.clear()
            # loop locals pin device payloads after fns.clear() drops lambdas
            del timed, m1, m2, g1, g2, v1, v2
            if gsc_keys:
                del grp2, timed2
            if bsr_feasible:
                # the loop locals still pin the BSR device payloads (largest
                # single allocation at 250K+) after fns.clear() drops the
                # lambdas that captured them
                del b1, b2
            del a1b, a2b
            built = {k: v for k, v in built.items()
                     if k.startswith("cootile-cluster")}
            gc.collect()

        if not args.skip_train_epoch:
            # full fused H2GCN-2 train step (forward + masked loss +
            # backward through the transpose-cootile VJP + Adam) at a
            # scale the reference cannot reach at all — same program
            # bench.py times at 10K, here on the cluster-ordered cootile
            # backend. The whole step is ONE compiled XLA program.
            import optax
            from h2gcn_tpu.nn import NetworkModel, parse_network_setup

            c = 16
            conf = parse_network_setup(
                "M64-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO", c, _dense_units=64,
                _dropout_rate=0.5)
            model = NetworkModel(conf, l2_regularize_weight=5e-4)
            rng_np = np.random.default_rng(7)
            y = np.zeros((args.n, c), np.float32)
            y[np.arange(args.n), rng_np.integers(0, c, args.n)] = 1
            y = jnp.asarray(y)
            mask = jnp.asarray(rng_np.random(args.n) < 0.02)
            tx = optax.adam(0.01, eps=1e-7)
            report["train_epoch"] = {}
            for key_name in ("cootile-cluster/bf16", "cootile-cluster/f32"):
                if key_name not in built:
                    continue
                k1, k2, _, _ = built[key_name]
                params = model.init(jax.random.PRNGKey(0),
                                    args.features, 2)
                opt_state = tx.init(params)

                @jax.jit
                def train_step(p, o, key, hops, xx, yy, mm):
                    def loss_fn(pp):
                        logits = model.apply(pp, hops[0], xx, hops,
                                             training=True, rng=key)
                        return model.loss(pp, logits, yy, mm)

                    loss, grads = jax.value_and_grad(loss_fn)(p)
                    updates, o2 = tx.update(grads, o, p)
                    return optax.apply_updates(p, updates), o2, loss

                key = jax.random.PRNGKey(1)
                step = lambda: train_step(params, opt_state, key,
                                          [k1, k2], x, y, mask)
                t = interleaved_timeit({"e": step}, rounds=3, iters=2,
                                       warmup=1)["e"][0]
                report["train_epoch"][key_name] = {
                    "epoch_s": round(t, 4),
                    "epochs_per_s": round(1.0 / t, 3)}

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, default=float)
    print(json.dumps(report, default=float))


if __name__ == "__main__":
    main()
