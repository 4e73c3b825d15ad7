"""Control run for the chained-dispatch timing methodology (VERDICT r2 #9).

The interleaved round-robin in bench.py recalibrated every kernel number
~7x in round 2; this control corroborates it through an INDEPENDENT path:
each backend is measured alone in a FRESH SUBPROCESS (no other compiled
programs resident, no round-robin interleaving, fresh relay session) with
two estimators —

  * the same chained-dispatch estimator (interleaved_timeit on one fn),
  * a raw long-chain wall-time (200 queued launches, one readback, NO sync
    subtraction) whose per-iter time upper-bounds the true kernel time by
    sync/200 < 0.5%.

Agreement of the in-process interleaved number with both subprocess
numbers closes the loop on the methodology.

Emits docs/timing_control.json.

Usage: python workbench/probe_timing_control.py            # orchestrate
       python workbench/probe_timing_control.py one <backend> <tag>
"""
import json
import pathlib
import subprocess
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

CASES = [("dense", "bf16"), ("cootile", "bf16"), ("cootile", "f32")]
N, F = 10_000, 64


def build_case(backend, tag):
    import jax
    import jax.numpy as jnp

    from bench import build_graph
    from h2gcn_tpu.sparse import SparseMatrix, spmm, transforms

    float(jnp.zeros(()))
    A = build_graph(N)
    hops = transforms.nhood_split(A, 2)
    a1 = transforms.normalize(hops[1])
    a2 = transforms.normalize(hops[2])
    kw = (dict(precision="highest", payload_dtype="float32") if tag == "f32"
          else dict(precision="default", payload_dtype="bfloat16"))
    if backend == "cootile":
        kw["payload_dtype"] = "float32"
    m1 = SparseMatrix.from_scipy(a1, backend=backend, **kw)
    m2 = SparseMatrix.from_scipy(a2, backend=backend, **kw)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    agg = jax.jit(lambda s1, s2, xx: (spmm(s1, xx), spmm(s2, xx)))
    nnz = a1.nnz + a2.nnz
    return (lambda: agg(m1, m2, x)), nnz


def measure_one(backend, tag):
    from bench import _block, _sync_overhead_s, interleaved_timeit

    fn, nnz = build_case(backend, tag)
    chained = interleaved_timeit({"f": fn}, rounds=4, iters=10)["f"][0]
    # raw long chain: no subtraction — sync cost amortized below 0.5%
    _block(fn())
    iters = 200
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _block(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return {"backend": backend, "tag": tag, "nnz": int(nnz),
            "chained_s": chained, "rawchain200_s": best,
            "sync_overhead_s": _sync_overhead_s(),
            "edges_per_s_chained": round(nnz / chained / 1e6, 1),
            "edges_per_s_rawchain": round(nnz / best / 1e6, 1)}


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        print("RESULT " + json.dumps(measure_one(sys.argv[2], sys.argv[3])))
        return

    # in-process interleaved measurement (the production methodology):
    # all three cases round-robin in ONE process
    import jax.numpy as jnp

    from bench import interleaved_timeit

    float(jnp.zeros(()))
    fns, nnzs = {}, {}
    for backend, tag in CASES:
        fn, nnz = build_case(backend, tag)
        fns[f"{backend}_{tag}"] = fn
        nnzs[f"{backend}_{tag}"] = nnz
    res = interleaved_timeit(fns, rounds=4, iters=10)
    report = {"n": N, "f": F, "cases": {}}
    for key, (t, _) in res.items():
        report["cases"][key] = {"interleaved_inprocess_s": t}

    # fresh-subprocess controls
    for backend, tag in CASES:
        cmd = [sys.executable, str(pathlib.Path(__file__).resolve()),
               "one", backend, tag]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT,
                             timeout=3000)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            report["cases"][f"{backend}_{tag}"]["subprocess_error"] = \
                out.stderr[-500:]
            continue
        sub = json.loads(line[0][len("RESULT "):])
        c = report["cases"][f"{backend}_{tag}"]
        c.update({"chained_subprocess_s": sub["chained_s"],
                  "rawchain200_subprocess_s": sub["rawchain200_s"],
                  "sync_overhead_s": sub["sync_overhead_s"]})
        c["interleaved_vs_subprocess_ratio"] = round(
            c["interleaved_inprocess_s"] / sub["chained_s"], 3)
        c["chained_vs_rawchain_ratio"] = round(
            sub["chained_s"] / sub["rawchain200_s"], 3)
        print(json.dumps({f"{backend}_{tag}": c}), flush=True)
    (ROOT / "docs" / "timing_control.json").write_text(
        json.dumps(report, indent=2))
    print("wrote docs/timing_control.json")


if __name__ == "__main__":
    main()
