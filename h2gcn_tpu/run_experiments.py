"""Generic training entry point.

``python -m h2gcn_tpu.run_experiments <MODEL> <DATAFMT> --dataset ... ``

The epoch protocol matches the reference's 20-line loop
(reference: h2gcn/run_experiments.py:42-65): pretrain callbacks, per-epoch
train_step + test_step merging their stat dicts, pre/post-epoch callbacks,
then post-train callbacks — all driven through ``args.objects`` closures so
model/dataset plugins stay decoupled from the loop.
"""

from __future__ import annotations

import jax

from . import datasets, models
from .modules import arguments, logger, monitor


def main(argv=None):
    parser = arguments.create_parser()
    parser.add_argument("--random_seed", type=int, default=123)
    parser.add_argument("--epochs", type=int, default=2000,
                        help="(default: %(default)s)")
    parser.add_argument("--platform", type=str, default=None, dest="_platform",
                        help="Force a JAX platform (tpu/cpu) for this run")
    parser.add_argument("--profile_dir", type=str, default=None,
                        dest="_profile_dir",
                        help="Write a jax.profiler trace of epochs 3-5 here")
    parser.add_argument("--timing", action="store_true", dest="_timing",
                        help="Record per-epoch wall time and edges/s")
    parser.add_argument("--mesh_shards", type=int, default=0,
                        dest="_mesh_shards",
                        help="Train distributed over an N-device mesh "
                             "(node-sharded activations, edge-partitioned "
                             "SpMM)")
    parser.add_argument("--halo_mode", choices=["ring", "allgather"],
                        default="ring", dest="_halo_mode",
                        help="Boundary-feature exchange strategy for "
                             "distributed SpMM")

    known_args, _ = parser.parse_known_args(argv)
    if known_args._platform:
        jax.config.update("jax_platforms", known_args._platform)

    models.add_subparsers(parser, argv)
    datasets.add_subparsers(parser, argv)
    logger.add_subparser_args(parser)
    monitor.add_subparser_args(parser)

    args = arguments.parse_args(parser, argv)

    # Transfer-path warmup: some tunneled TPU runtimes stall for minutes on
    # the FIRST device→host readback of a process; take the hit before the
    # epoch loop so per-epoch stats readback is fast.
    float(jax.numpy.zeros(()))

    for func in args.objects["pretrain_callbacks"]:
        func(**args.objects["tensors"])

    # observability: per-epoch wall time + aggregation edges/s (the
    # reference has no tracing/profiling at all, SURVEY.md §5)
    timing = getattr(args, "_timing", False)
    nnz_per_epoch = 0
    if timing:
        hops = args.objects["tensors"].get("adj_hops") or []
        if isinstance(hops, (list, tuple)):
            nnz_per_epoch = sum(getattr(h, "nnz", 0) for h in hops)
        args.objects["epoch_times"] = []
    profile_dir = getattr(args, "_profile_dir", None)

    import time as _time

    args.current_epoch = 0
    while args.current_epoch < args.epochs:
        args.current_epoch += 1
        if profile_dir and args.current_epoch == 3:
            jax.profiler.start_trace(profile_dir)
        t_epoch = _time.perf_counter()
        for func in args.objects["pre_epoch_callbacks"]:
            func(args.current_epoch, args)
        args.objects["epoch_stats"] = dict()
        args.objects["epoch_stats"].update(
            args.objects["train_step"](**args.objects["tensors"])
        )
        args.objects["epoch_stats"].update(
            args.objects["test_step"](**args.objects["tensors"])
        )
        if timing:
            dt = _time.perf_counter() - t_epoch
            args.objects["epoch_times"].append(dt)
            args.objects["epoch_stats"]["epoch_time_s"] = dt
            if nnz_per_epoch:
                # 2 forward passes (train+eval) + backward ≈ 3 aggregations
                args.objects["epoch_stats"]["agg_edges_per_s"] = (
                    3 * nnz_per_epoch / dt
                )
        if profile_dir and args.current_epoch == 5:
            jax.profiler.stop_trace()
            print(f"===> Profiler trace written to {profile_dir}")
            profile_dir = None
        for func in args.objects["post_epoch_callbacks"]:
            func(args.current_epoch, args)
        while (args.current_epoch >= args.epochs
               and len(args.objects["post_train_callbacks"]) > 0):
            func = args.objects["post_train_callbacks"].popleft()
            func(args)

    if timing and args.objects.get("epoch_times"):
        times = args.objects["epoch_times"]
        steady = times[min(2, len(times) - 1):]
        print(f"===> Timing: {len(times)} epochs, "
              f"median {1e3 * sorted(steady)[len(steady) // 2]:.2f} ms/epoch "
              f"(first epoch {1e3 * times[0]:.1f} ms incl. compile)")
    return args


if __name__ == "__main__":
    main()
