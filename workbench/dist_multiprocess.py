"""Real multi-process distributed training: jax.distributed over localhost.

VERDICT r3 task #5: `parallel/multihost.py` had only ever been validated by
monkeypatching the process-topology accessors — no real process boundary
was crossed. This script spawns P OS processes, each joining a
`jax.distributed` cluster via a localhost coordinator with K virtual CPU
devices, builds the SAME node-sharded H2GCN-2 training program the
`--mesh_shards` CLI path uses (`parallel/train.build_dist_steps`) over the
global P*K-device mesh, runs several train steps + an eval, and asserts
loss/accuracy parity with a single-process run on an equal-size mesh.

Every process holds the full host-side graph (replicated build, like a TPU
pod would) and contributes only its addressable shards via
`jax.make_array_from_callback`; collectives (psum of grads/metrics, the
halo exchanges inside the aggregation) cross the process boundary over the
distributed runtime — the strongest multi-host correctness evidence
obtainable without a pod (SURVEY.md §2 comm-backend row: "jax.distributed
+ XLA collectives over DCN").

Usage (driver):  python workbench/dist_multiprocess.py
                   [--nproc 2] [--devices_per_proc 4] [--steps 3]
                   [--mode ring] [--out docs/dist_multiprocess.json]
Worker mode is internal (--role worker ...).
"""

import argparse
import json
import os
import pathlib
import socket
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_gat_steps(num_steps: int, seed: int = 0, n: int = 96,
                  m_edges: int = None, time_steps: int = 0):
    """Distributed GAT (dest-stripe gather attention) over whatever
    device/process topology this process sees — the attention
    all_to_all and its VJP transpose cross REAL process boundaries
    (round-5: the strongest evidence class, previously H2GCN-only).
    Returns (losses, acc, step_times)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import scipy.sparse as sp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from h2gcn_tpu.parallel import attention as pattn, train as ptrain
    from h2gcn_tpu.parallel.dist import pad_nodes
    from h2gcn_tpu.parallel.mesh import make_mesh

    f, c = 24, 5
    rng = np.random.default_rng(seed)
    me = m_edges or 6 * n
    r = rng.integers(0, n, me)
    cc = rng.integers(0, n, me)
    A = sp.csr_matrix((np.ones(me, np.float32), (r, cc)), shape=(n, n))
    support = ((A + A.T + sp.eye(n)) > 0).astype(np.float32)

    mesh = make_mesh()
    D = jax.device_count()
    dga, n_pad = pattn.shard_attention_gather(support, D)

    x = pad_nodes(rng.standard_normal((n, f)).astype(np.float32), n_pad)
    y = np.zeros((n, c), np.float32)
    y[np.arange(n), rng.integers(0, c, n)] = 1
    y = pad_nodes(y, n_pad)
    mask = pad_nodes((rng.random(n) < 0.5), n_pad)

    model = pattn.DistGATNetwork(c, hid_units=[8], n_heads=[2, 1],
                                 in_drop=0.0, attn_drop=0.0)
    params = model.init(jax.random.PRNGKey(seed), f)
    tx = optax.adam(0.005, eps=1e-7)
    opt_state = tx.init(params)

    def to_global(spec):
        sharding = NamedSharding(mesh, spec)

        def conv(arr):
            a = np.asarray(arr)
            return jax.make_array_from_callback(
                a.shape, sharding, lambda idx: a[idx])

        return conv

    dga = jax.tree_util.tree_map(to_global(P("graph")), dga)
    xd = to_global(P("graph"))(x)
    yd = to_global(P("graph"))(y)
    md = to_global(P("graph"))(mask)
    params = jax.tree_util.tree_map(to_global(P()), params)
    opt_state = jax.tree_util.tree_map(to_global(P()), opt_state)

    train_step, eval_step = ptrain.build_dist_steps(model, tx, mesh, [dga])
    losses = []
    for step in range(num_steps):
        key = to_global(P())(jax.random.PRNGKey(1000 + step))
        params, opt_state, loss = train_step(params, opt_state, key,
                                             xd, yd, md)
        losses.append(float(loss))
    step_times = []
    for step in range(time_steps):
        key = to_global(P())(jax.random.PRNGKey(5000 + step))
        t0 = time.perf_counter()
        params, opt_state, loss = train_step(params, opt_state, key,
                                             xd, yd, md)
        float(loss)
        step_times.append(round(time.perf_counter() - t0, 4))
    metrics = eval_step(params, xd, yd, md)
    return losses, float(metrics["acc"]), step_times


def run_steps(num_steps: int, mode: str, seed: int = 0, n: int = 96,
              m_edges: int = None, time_steps: int = 0):
    if mode == "gat":
        return run_gat_steps(num_steps, seed=seed, n=n, m_edges=m_edges,
                             time_steps=time_steps)
    """Build + run the distributed program on whatever device/process
    topology this process sees. Returns (losses per step, final acc,
    per-step wall times). ``n``/``m_edges`` scale the graph (VERDICT r4
    weak #3: the 64-node toys never exercised the serialization/overlap
    shape at a size where halo vs allgather actually diverge);
    ``time_steps`` adds a post-warmup timed phase (each step synced by the
    loss readback)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import scipy.sparse as sp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from h2gcn_tpu.nn import NetworkModel, parse_network_setup
    from h2gcn_tpu.parallel import train as ptrain
    from h2gcn_tpu.parallel.dist import pad_nodes, shard_hops
    from h2gcn_tpu.parallel.mesh import make_mesh
    from h2gcn_tpu.sparse import transforms

    f, c = 24, 5
    rng = np.random.default_rng(seed)
    if m_edges:
        r = rng.integers(0, n, m_edges)
        cc = rng.integers(0, n, m_edges)
        A = sp.csr_matrix((np.ones(m_edges, np.float32), (r, cc)),
                          shape=(n, n))
    else:
        A = sp.random(n, n, density=0.1, random_state=seed, format="csr")
    A = ((A + A.T) > 0).astype(np.float32)
    A = transforms.remove_eye(A)
    hops = transforms.nhood_split(A, 2)
    while len(hops) < 3:
        hops.append(hops[-1])
    mats = [transforms.normalize(hops[1]), transforms.normalize(hops[2])]

    mesh = make_mesh()  # ALL devices — spans every process in the cluster
    D = jax.device_count()
    hop_shards, n_pad = shard_hops(mats, D, mode=mode)

    x = pad_nodes(rng.standard_normal((n, f)).astype(np.float32), n_pad)
    y = np.zeros((n, c), np.float32)
    y[np.arange(n), rng.integers(0, c, n)] = 1
    y = pad_nodes(y, n_pad)
    mask = pad_nodes((rng.random(n) < 0.5), n_pad)

    conf = parse_network_setup(
        "M16-R-T1-G-V-T2-G-V-C1-C2-D0.5-MO", c, _dense_units=16,
        _dropout_rate=0.5)
    model = NetworkModel(conf, l2_regularize_weight=5e-4)
    params = model.init(jax.random.PRNGKey(seed), f, 2)
    tx = optax.adam(0.01, eps=1e-7)
    opt_state = tx.init(params)

    def to_global(spec):
        sharding = NamedSharding(mesh, spec)

        def conv(arr):
            a = np.asarray(arr)
            return jax.make_array_from_callback(
                a.shape, sharding, lambda idx: a[idx])

        return conv

    # every process holds the full host copy; make_array_from_callback
    # materializes only this process's addressable shards
    hop_shards = jax.tree_util.tree_map(to_global(P("graph")), hop_shards)
    xd = to_global(P("graph"))(x)
    yd = to_global(P("graph"))(y)
    md = to_global(P("graph"))(mask)
    params = jax.tree_util.tree_map(to_global(P()), params)
    opt_state = jax.tree_util.tree_map(to_global(P()), opt_state)

    train_step, eval_step = ptrain.build_dist_steps(
        model, tx, mesh, hop_shards)

    losses = []
    for step in range(num_steps):
        key = to_global(P())(jax.random.PRNGKey(1000 + step))
        params, opt_state, loss = train_step(params, opt_state, key,
                                             xd, yd, md)
        losses.append(float(loss))  # replicated output: readable everywhere
    step_times = []
    for step in range(time_steps):
        key = to_global(P())(jax.random.PRNGKey(5000 + step))
        t0 = time.perf_counter()
        params, opt_state, loss = train_step(params, opt_state, key,
                                             xd, yd, md)
        float(loss)  # sync
        step_times.append(round(time.perf_counter() - t0, 4))
    metrics = eval_step(params, xd, yd, md)
    return losses, float(metrics["acc"]), step_times


def worker_main(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from h2gcn_tpu.parallel import multihost

    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.nproc, process_id=args.pid)
    assert jax.process_count() == args.nproc, jax.process_count()
    assert jax.device_count() == args.nproc * args.devices_per_proc
    losses, acc, times = run_steps(args.steps, args.mode, n=args.n,
                                   m_edges=args.m_edges,
                                   time_steps=args.time_steps)
    if args.pid == 0:
        with open(args.result, "w") as fh:
            json.dump({"losses": losses, "acc": acc,
                       "step_times_s": times,
                       "process_count": jax.process_count(),
                       "device_count": jax.device_count(),
                       "local_device_count": jax.local_device_count()}, fh)
    print(f"[worker {args.pid}] losses={losses} acc={acc:.3f} "
          f"times={times}")


def control_main(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    losses, acc, times = run_steps(args.steps, args.mode, n=args.n,
                                   m_edges=args.m_edges,
                                   time_steps=args.time_steps)
    with open(args.result, "w") as fh:
        json.dump({"losses": losses, "acc": acc, "step_times_s": times,
                   "device_count": jax.device_count()}, fh)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def driver_main(args):
    tmp = tempfile.mkdtemp(prefix="distmp_")
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}

    # multi-process cluster: P workers x K virtual CPU devices each
    procs = []
    mp_result = os.path.join(tmp, "multi.json")
    size_args = ["--n", str(args.n), "--m_edges", str(args.m_edges or 0),
                 "--time_steps", str(args.time_steps)]
    for pid in range(args.nproc):
        env = dict(env_base,
                   XLA_FLAGS="--xla_force_host_platform_device_count="
                             f"{args.devices_per_proc}")
        procs.append(subprocess.Popen(
            [sys.executable, "-u", __file__, "--role", "worker",
             "--pid", str(pid), "--nproc", str(args.nproc),
             "--devices_per_proc", str(args.devices_per_proc),
             "--coordinator", f"localhost:{port}",
             "--steps", str(args.steps), "--mode", args.mode,
             "--result", mp_result] + size_args,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for pid, (p, o) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(o)
            raise SystemExit(f"worker {pid} failed rc={p.returncode}")

    # single-process control on an equal-size mesh
    sp_result = os.path.join(tmp, "single.json")
    env = dict(env_base,
               XLA_FLAGS="--xla_force_host_platform_device_count="
                         f"{args.nproc * args.devices_per_proc}")
    ctl = subprocess.run(
        [sys.executable, "-u", __file__, "--role", "control",
         "--steps", str(args.steps), "--mode", args.mode,
         "--result", sp_result] + size_args,
        env=env, capture_output=True, timeout=900)
    if ctl.returncode != 0:
        print(ctl.stdout.decode(), ctl.stderr.decode())
        raise SystemExit("control failed")

    multi = json.load(open(mp_result))
    single = json.load(open(sp_result))
    max_dl = max(abs(a - b)
                 for a, b in zip(multi["losses"], single["losses"]))
    report = {
        "nproc": args.nproc,
        "devices_per_proc": args.devices_per_proc,
        "mesh_size": args.nproc * args.devices_per_proc,
        "mode": args.mode,
        "steps": args.steps,
        "n": args.n,
        "m_edges": args.m_edges,
        "multi_process": multi,
        "single_process_control": single,
        "max_abs_loss_delta": max_dl,
        "acc_delta": abs(multi["acc"] - single["acc"]),
        "parity": bool(max_dl < 1e-5
                       and abs(multi["acc"] - single["acc"]) < 1e-6),
    }
    if multi.get("step_times_s") and single.get("step_times_s"):
        report["multiprocess_overhead_per_step_s"] = round(
            min(multi["step_times_s"]) - min(single["step_times_s"]), 4)
    print(json.dumps(report, indent=1))
    if args.out:
        if args.merge_key:
            # merge into a keyed artifact — evidence files are never
            # overwritten wholesale (bench_attn_scale.py rule)
            p = pathlib.Path(args.out)
            doc = json.loads(p.read_text()) if p.exists() else {}
            doc[args.merge_key] = report
            p.write_text(json.dumps(doc, indent=1))
        else:
            with open(args.out, "w") as fh:
                json.dump(report, fh, indent=1)
    if not report["parity"]:
        raise SystemExit("PARITY FAILURE")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", default="driver",
                    choices=["driver", "worker", "control"])
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--devices_per_proc", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--mode", default="ring")
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--m_edges", type=int, default=0)
    ap.add_argument("--time_steps", type=int, default=0)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--result", default=None)
    ap.add_argument("--merge_key", default=None,
                    help="merge the report under this key into --out "
                         "instead of overwriting the file")
    ap.add_argument("--out", default=str(REPO / "docs" /
                                         "dist_multiprocess.json"))
    args = ap.parse_args()
    if args.role == "worker":
        worker_main(args)
    elif args.role == "control":
        control_main(args)
    else:
        driver_main(args)


if __name__ == "__main__":
    main()
