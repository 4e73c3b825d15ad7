"""Real-TPU evidence for the distributed program (VERDICT r2 item 8).

Two artifacts, no multi-chip hardware required:

1. **Native-TPU compile+run of the sharded train step**: the degenerate
   1-device mesh runs the FULL shard_map H2GCN-2 train step on the v5e for
   every halo mode — proving the halo and halo-cootile paths (including
   the in-shard Pallas kernels) compile natively on TPU rather than only
   under CPU interpret mode.

2. **Analytic comm-volume-vs-mesh-size table** from the halo shard tables:
   for each mesh size D, shard_matrix_halo's measured per-pair halo sizes
   give the exact all_to_all bytes one layer exchanges, against the
   all_gather and ring alternatives' volumes — the capacity-planning
   numbers a real pod deployment would see over ICI.

Emits docs/dist_tpu_evidence.json.

Usage: python workbench/bench_dist_tpu.py
"""
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

F_FEAT = 64  # feature width the volume table assumes


def native_compile_evidence():
    from h2gcn_tpu.parallel import dryrun

    assert jax.default_backend() == "tpu", "run on the real chip"
    out = {}
    for mode in ("ring", "allgather", "halo", "halo-cootile", "gat"):
        t0 = time.time()
        res = dryrun.run(1, mode=mode)
        out[mode] = {
            "loss": round(res["loss"], 4),
            "acc": round(res["acc"], 4),
            "compile_run_s": round(time.time() - t0, 1),
        }
    return out


def comm_volume_table(n=250_000, m_edges=400_000):
    """Halo all_to_all bytes per layer vs mesh size, from the REAL shard
    tables of the 250K bench graph's Â₁/Â₂ (the measured halos, not a
    model)."""
    from bench import build_graph
    from h2gcn_tpu.parallel.dist import shard_matrix_halo
    from h2gcn_tpu.sparse import transforms

    A = build_graph(n, m_edges, seed=0)
    hops = transforms.nhood_split(A, 2)
    mats = {"A1": transforms.normalize(hops[1]),
            "A2": transforms.normalize(hops[2])}
    table = {}
    for D in (2, 4, 8, 16, 32):
        entry = {"mesh": D}
        n_local = -(-n // D)
        for name, mat in mats.items():
            hsm, _ = shard_matrix_halo(mat, D)
            # the exchange ships [D, H, F] per device: D·H·F·4 bytes out
            # of each chip per layer application
            halo_bytes = D * hsm.halo * F_FEAT * 4
            # padding-free volume: unique (dest shard, boundary col) pairs
            coo = mat.tocoo()
            ds = coo.row // n_local
            ss = coo.col // n_local
            bnd = ds != ss
            real_rows = int(np.unique(
                ds[bnd].astype(np.int64) * n + coo.col[bnd]).size)
            entry[name] = {
                "halo_rows_max_pair": int(hsm.halo),
                "alltoall_mb_per_device": round(halo_bytes / 1e6, 2),
                "real_boundary_rows_total": real_rows,
                "allgather_mb_per_device": round(
                    (D - 1) * n_local * F_FEAT * 4 / 1e6, 2),
            }
            entry[name]["reduction_vs_allgather"] = round(
                entry[name]["allgather_mb_per_device"]
                / max(entry[name]["alltoall_mb_per_device"], 1e-9), 1)
        # projected scaling efficiency for one aggregation layer pair,
        # BASELINE.md's 1→D-host criterion: compute time divides by D
        # (row-sharded), the halo all_to_all rides the interconnect.
        # Single-chip compute anchored to the measured 250K cootile rate
        # (docs/bench_large.json agg_edges_per_s); two interconnect
        # scenarios: ICI (v5e 4-way torus ~45 GB/s/link effective) and
        # multi-host DCN (~12.5 GB/s/host, 100 Gb/s).
        nnz = sum(m.nnz for m in mats.values())
        t1 = nnz / 289e6  # measured single-chip edges/s (bench_large r3)
        comm_mb = sum(entry[k]["alltoall_mb_per_device"]
                      for k in ("A1", "A2"))
        for label, bw in (("ici_45GBps", 45e9), ("dcn_12.5GBps", 12.5e9)):
            t_comm = comm_mb * 1e6 / bw
            # serial = no overlap; overlapped = the production halo path's
            # interior-reduce/exchange overlap (dist.py schedules the
            # all_to_all under the interior segment-sum)
            entry[f"projected_efficiency_{label}"] = {
                "serial": round((t1 / D) / (t1 / D + t_comm), 3),
                "overlapped": round((t1 / D) / max(t1 / D, t_comm), 3),
            }
        table[D] = entry
    return table


def gat_comm_volume(n=120_000, m_edges=600_000, heads=8, feat=8, classes=7):
    """Distributed-GAT exchange volume vs mesh size, from the REAL halo
    sets of the 120K GAT bench graph (VERDICT r4 task #1, third
    deliverable).

    Per layer each device ships its boundary rows of the PROJECTED
    ``[f2 | h]`` — ``(H + H·feat)`` floats/row for the hidden layer,
    ``(1 + classes)`` for the output heads — so volume scales with the
    hidden width, independent of the 120K input-feature dimension the
    all_gather alternative would have to move."""
    from bench import build_graph
    import scipy.sparse as sp

    A = build_graph(n, m_edges, seed=0)
    support = ((A + sp.eye(n)) > 0).astype(np.float32).tocsr()
    coo = support.tocoo()
    widths = {"layer1": heads + heads * feat, "layer2": 1 + classes}
    table = {}
    for D in (2, 4, 8, 16, 32):
        n_local = -(-n // D)
        ds = coo.row // n_local
        ss = coo.col // n_local
        bnd = ds != ss
        # max rows any (dest, src) pair exchanges = the h_pad the stacked
        # tables would carry (before the 8-row rounding)
        pair_key = ds[bnd].astype(np.int64) * D + ss[bnd]
        uniq = np.unique(
            pair_key * (n + 1) + coo.col[bnd].astype(np.int64))
        per_pair = np.bincount(
            (uniq // (n + 1)).astype(np.int64), minlength=D * D)
        h_pad = int(-(-per_pair.max() // 8)) * 8
        entry = {"mesh": D, "halo_rows_max_pair": h_pad,
                 "real_boundary_rows_total": int(uniq.size)}
        for lname, w in widths.items():
            a2a_mb = D * h_pad * w * 4 / 1e6
            entry[lname] = {
                "payload_floats_per_row": w,
                "alltoall_mb_per_device": round(a2a_mb, 2),
                "allgather_mb_per_device": round(
                    (D - 1) * n_local * w * 4 / 1e6, 2),
            }
            entry[lname]["reduction_vs_allgather"] = round(
                entry[lname]["allgather_mb_per_device"]
                / max(entry[lname]["alltoall_mb_per_device"], 1e-9), 1)
        # projected scaling efficiency: per-layer attention compute
        # divides by D (dest-stripe sharding splits slots evenly); comm =
        # both layers' all_to_all. Compute anchored to the measured 120K
        # gather fwd+bwd (docs/bench_attn_scale.json gather_fwdbwd_highest
        # = 0.1354 s for the 8-head layer; layer 2 is ~1/9 of the slots).
        t1 = 0.1354 * (1 + 1 / 9)
        comm_mb = sum(entry[k]["alltoall_mb_per_device"] for k in widths)
        for label, bw in (("ici_45GBps", 45e9), ("dcn_12.5GBps", 12.5e9)):
            t_comm = comm_mb * 1e6 / bw
            entry[f"projected_efficiency_{label}"] = {
                "serial": round((t1 / D) / (t1 / D + t_comm), 3),
                # the projection/SDDMM/elementwise work is independent of
                # the exchange, but the combine is not — quote serial as
                # the floor and overlapped as the ceiling
                "overlapped": round((t1 / D) / max(t1 / D, t_comm), 3),
            }
        table[D] = entry
        print(f"D={D}: h_pad={h_pad} comm={comm_mb:.1f}MB "
              f"eff_ici={entry['projected_efficiency_ici_45GBps']}",
              flush=True)
    return table


def _merge_into_artifact(updates: dict):
    """Merge top-level keys into docs/dist_tpu_evidence.json (evidence
    files are never overwritten wholesale — bench_attn_scale.py rule)."""
    path = ROOT / "docs" / "dist_tpu_evidence.json"
    doc = json.loads(path.read_text()) if path.exists() else {}
    doc.update(updates)
    path.write_text(json.dumps(doc, indent=2))
    print(f"merged {sorted(updates)} into docs/dist_tpu_evidence.json")


def main():
    if "--gat_volume_only" in sys.argv:
        # host-side analytics only — no TPU required
        _merge_into_artifact({"gat_comm_volume_120k": gat_comm_volume()})
        return
    float(jnp.zeros(()))
    print(f"backend={jax.default_backend()}", flush=True)
    out = {"native_tpu_1device_mesh": native_compile_evidence()}
    print(json.dumps(out, indent=2), flush=True)
    out["comm_volume_250k"] = comm_volume_table()
    out["gat_comm_volume_120k"] = gat_comm_volume()
    _merge_into_artifact(out)
    print(json.dumps(out["comm_volume_250k"], indent=2))


if __name__ == "__main__":
    main()
