"""GraphSAGE at scale: the in-jit sampler's perf row (VERDICT r4 weak #7).

The reference GraphSAGE (baselines/graphsage-simple/graphsage/model.py:
88-163) samples neighbors with per-node Python ``random.sample`` calls
inside the batch loop — the one minibatch baseline, and the one family
whose at-scale throughput was never measured here. This probe times the
TPU design (padded ELL table + top_k-over-PRNG-scores sampling, whole
step in one XLA program) at 120K nodes:

  * train step (fwd+bwd+adam) with the reference fan-out (5, 5)
  * train step full-neighbor (num_samples 0 — every neighbor, no top_k)
  * eval forward, both modes
  * the sampling stage alone (isolates the top_k cost)

plus a same-protocol CPU wall-clock comparison on cora against the
EXECUTED reference trainer (its own 100×256-node-batch run), so the
"matching-or-beating" claim has a measured reference-side number.

MERGES docs/bench_graphsage.json by key.

Usage: python workbench/bench_graphsage_scale.py [n m_edges] [--tpu_only]
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
import optax

from bench import build_graph, interleaved_timeit
from h2gcn_tpu.models.GRAPHSAGE import (ELLGraph, GraphSAGENetwork,
                                        build_neighbor_table)

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
N = int(_pos[0]) if _pos else 120_000
M = int(_pos[1]) if len(_pos) > 1 else 600_000
F, C = 128, 7


def tpu_scale_rows():
    float(jnp.zeros(()))  # readback warm-up
    print(f"backend={jax.default_backend()} n={N} m={M}", flush=True)
    from h2gcn_tpu.models.GRAPHSAGE import build_mean_adjacencies

    A = build_graph(N, M, seed=0)
    table, valid = build_neighbor_table(A.tocsr())
    # full-neighbor mode rides the SpMM ladder (round-5 fix: the ELL
    # gather for full neighborhoods wanted 256GB at this skew)
    ell = ELLGraph(table=table, valid=valid,
                   mean_adj=build_mean_adjacencies(A, gcn=False),
                   nnz=int(A.nnz))
    dmax = int(table.shape[1])
    print(f"ELL table: dmax={dmax}, {table.nbytes / 1e6:.0f}MB; "
          f"mean_adj backend={ell.mean_adj.backend}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    y = np.zeros((N, C), np.float32)
    y[np.arange(N), rng.integers(0, C, N)] = 1
    y = jnp.asarray(y)
    mask = jnp.asarray((rng.random(N) < 0.3).astype(np.float32))

    out = {"n": N, "m_edges": M, "nnz": int(A.nnz), "dmax": dmax,
           "features": F, "hid": 128, "times_ms": {}}
    timed = {}
    for tag, samples in (("sampled_5_5", (5, 5)),
                         ("sampled_25_10", (25, 10)),
                         ("full_neighbor", (0, 0))):
        model = GraphSAGENetwork(C, hid_units=128, num_samples=samples)
        params = model.init(jax.random.PRNGKey(0), F)
        tx = optax.sgd(0.7)  # reference lr, model.py:114
        opt_state = tx.init(params)

        @jax.jit
        def train(params, opt_state, key, ell, x, y, mask, model=model,
                  tx=tx):
            def loss_fn(p):
                logits = model.apply(p, ell, x, [], training=True, rng=key)
                return model.loss(p, logits, y, mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), new_opt, loss

        @jax.jit
        def fwd(params, key, ell, x, model=model):
            return model.apply(params, ell, x, [], rng=key)

        @jax.jit
        def sample_only(key, ell, x, model=model):
            return model._sampled_mean(ell, x, key,
                                       model.num_samples[0])

        key = jax.random.PRNGKey(1)
        timed[f"train_{tag}"] = (
            lambda train=train, params=params, opt_state=opt_state,
                   key=key: train(params, opt_state, key, ell, x, y, mask))
        timed[f"fwd_{tag}"] = (
            lambda fwd=fwd, params=params, key=key: fwd(params, key, ell, x))
        if samples[0]:
            timed[f"sample_stage_only_k{samples[0]}"] = (
                lambda sample_only=sample_only, key=key:
                    sample_only(key, ell, x))

    ok = {}
    for nm, fn in timed.items():
        t0 = time.time()
        try:
            jax.block_until_ready(fn())
            ok[nm] = fn
            print(f"{nm} compiled+ran in {time.time() - t0:.1f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — per-mode OOM recorded
            # full-neighbor on a power-law graph wants an [N·dmax, F]
            # gather (dmax=4165 here → 256GB): the ELL design is for
            # bounded fan-out — the reference's own operating point
            # (model.py samples 5/5); at-scale full-neighbor aggregation
            # is the SpMM ladder's job, not GraphSAGE's
            out["times_ms"][nm] = f"error: {type(e).__name__}: {str(e)[:160]}"
            print(f"{nm}: {type(e).__name__}: {str(e)[:160]}", flush=True)
    res = interleaved_timeit(ok, rounds=3, iters=3, warmup=1)
    for k, (t, _) in res.items():
        out["times_ms"][k] = round(t * 1e3, 2)
    if "train_full_neighbor" in res:
        out["full_neighbor_train_edges_per_s"] = round(
            2 * A.nnz / res["train_full_neighbor"][0])
    if "train_sampled_5_5" in res:
        # sampled mode touches ≤ (5+5)·N edges per step
        out["sampled_5_5_train_sampled_edges_per_s"] = round(
            10 * N / res["train_sampled_5_5"][0])
    print(json.dumps(out, indent=1), flush=True)
    return out


def cora_reference_comparison():
    """Same-protocol cora wall-clock: executed reference trainer (100
    batches of 256, torch CPU) vs this framework's CLI (100 epochs of
    256-node batches, --platform cpu for apples-to-apples host silicon).
    """
    import subprocess

    gb = ROOT / "workbench" / "golden_baselines"
    out = {}
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, str(gb / "run_graphsage_reference.py"),
         "--dataset", "ind.cora", "--seed", "1"],
        capture_output=True, timeout=1800, text=True)
    ref_line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("Average batch time:")]
    out["reference_avg_batch_time"] = (
        ref_line[-1] if ref_line
        else f"rc={r.returncode}: {r.stdout[-300:]}")
    out["reference_batches"] = 100  # model.py:126-145 (256 nodes each)
    out["reference_wall_s"] = round(time.time() - t0, 1)
    data = "/root/reference/baselines/mixhop/data/planetoid/data"
    t0 = time.time()
    r2 = subprocess.run(
        [sys.executable, "-m", "h2gcn_tpu.run_experiments", "GRAPHSAGE",
         "planetoid", "--platform", "cpu", "--dataset", "ind.cora",
         "--dataset_path", data, "--epochs", "100", "--batch_size", "256",
         "--timing"],
        capture_output=True, timeout=1800, text=True, cwd=str(ROOT))
    ours_lines = [ln for ln in r2.stdout.splitlines()
                  if "===> Timing" in ln or "Test Acc" in ln]
    out["ours_cpu"] = ours_lines[-2:] if ours_lines else r2.stdout[-300:]
    out["ours_wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out, indent=1), flush=True)
    return out


def main():
    path = ROOT / "docs" / "bench_graphsage.json"
    doc = json.loads(path.read_text()) if path.exists() else {}
    if "--cpu_only" not in sys.argv:
        doc[f"tpu_{N // 1000}k"] = tpu_scale_rows()
    if "--tpu_only" not in sys.argv:
        doc["cora_reference_cpu_comparison"] = cora_reference_comparison()
    path.write_text(json.dumps(doc, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
