"""Probe: the gather-attention BACKWARD at 40K/4M (7.75M slots).

Round-4's bench recorded `gather_fwdbwd_* = error: JaxRuntimeError`
(remote-compile 500) here. Re-run in isolation the compile SUCCEEDS
(~87s — the 500 was a transient relay failure, likely the bench process'
accumulated compile traffic tripping the relay). This probe compiles and
steady-state-times the backward at both precisions so the artifact can
carry real numbers.

Usage: python workbench/probe_gatherbwd_40k.py [n m_edges]
"""
import json
import pathlib
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import build_graph, interleaved_timeit
from h2gcn_tpu.sparse import transforms
from h2gcn_tpu.sparse.pallas_attention_gather import (build_gatherattn,
                                                      gat_attention_gather)

H, F = 8, 8


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    import os
    cap = os.environ.get("H2GCN_GS_MAX_STEPS")
    if cap:
        # experiment: fewer/larger segments = fewer barrier-serialized
        # combine sub-programs; at 40K/7.75M slots the default 2048-step
        # cap yields 4 segments whose gather buffers would fit HBM as one
        from h2gcn_tpu.sparse import pallas_gscatter as _gs
        _gs._MAX_STEPS = int(cap)
        print(f"_MAX_STEPS={cap}", flush=True)
    print(f"devices: {jax.devices()}", flush=True)
    float(jnp.zeros(()))  # warm up relay readback
    A = build_graph(n, m, seed=0)
    support = transforms.add_eye(A).tocsr()
    t0 = time.time()
    ga = build_gatherattn(support)
    print(f"build {time.time()-t0:.1f}s slots={ga.total_slots_fwd} "
          f"segments fwd={len(ga.fwd.segments)} bwd={len(ga.bwd.segments)}",
          flush=True)
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal((n, H)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((n, H)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((n, H * F)).astype(np.float32))

    results = {}
    for precision in ("default", "highest"):
        @jax.jit
        def step(ga, f1, f2, h, precision=precision):
            return jax.grad(lambda *x: jnp.sum(gat_attention_gather(
                ga, *x, num_heads=H, feat=F, n_out=n,
                precision=precision) ** 2), (0, 1, 2))(f1, f2, h)

        try:
            t0 = time.time()
            jax.block_until_ready(step(ga, f1, f2, h))
            print(f"[{precision}] compile+first {time.time()-t0:.1f}s",
                  flush=True)
            timed = interleaved_timeit(
                {"step": lambda: step(ga, f1, f2, h)}, rounds=2, iters=3,
                warmup=1)
            dt, rounds = timed["step"]
            print(f"[{precision}] fwdbwd steady {dt*1e3:.1f} ms "
                  f"(rounds {rounds})", flush=True)
            results[f"gather_fwdbwd_{precision}"] = round(dt, 5)
        except Exception:
            traceback.print_exc()
            results[f"gather_fwdbwd_{precision}"] = "error"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
