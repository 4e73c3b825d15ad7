import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bench import build_graph, _block, interleaved_timeit
from h2gcn_tpu.sparse import SparseMatrix, transforms
from h2gcn_tpu.sparse.matrix import spmm

float(jnp.zeros(()))
def mem(tag):
    st = jax.local_devices()[0].memory_stats() or {}
    print(f"[{tag}] in_use={st.get('bytes_in_use', 0)/1e9:.2f}GB "
          f"peak={st.get('peak_bytes_in_use', 0)/1e9:.2f}GB", flush=True)

N, F = 1_000_000, 64
A = build_graph(N, 800_000, seed=0)
hops = transforms.nhood_split(A, 2)
a2 = transforms.normalize(hops[2])
print("hop2 nnz:", a2.nnz, flush=True)
g2 = SparseMatrix.from_scipy(a2, backend="gscatter")
segs = g2.gsc.segments
print("segments:", len(segs), "steps each:", int(segs[0].ctr.shape[0]),
      "slots total:", sum(int(s.cols.shape[0]) for s in segs), flush=True)
mem("after build")
rng = np.random.default_rng(1)
x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
fn = jax.jit(lambda m, xx: spmm(m, xx))
for prec in ("default", "highest"):
    m = g2.replace(precision=prec)
    try:
        t0 = time.time(); out = fn(m, x); _block(out)
        print(f"{prec}: compile+run {time.time()-t0:.1f}s", flush=True)
        mem(prec)
        t = interleaved_timeit({"f": lambda: fn(m, x)}, rounds=3, iters=3,
                               warmup=1)["f"][0]
        print(f"{prec}: {t*1e3:.1f} ms | {a2.nnz/t/1e6:.0f}M edges/s", flush=True)
    except Exception as e:
        print(f"{prec} FAILED: {type(e).__name__} {str(e)[:200]}", flush=True)
        mem(prec + "-fail")
