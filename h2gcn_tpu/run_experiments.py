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
    parser.add_argument("--interactive", "-i", action="store_true",
                        dest="_interactive",
                        help="Drop into IPython after training (reference "
                             "run_experiments.py:63-65)")
    parser.add_argument("--restore_checkpoint", type=str, default=None,
                        dest="_restore_checkpoint",
                        help="Path to a ckpt.npz (or its directory) to "
                             "resume training from")
    parser.add_argument("--epochs", type=int, default=2000,
                        help="(default: %(default)s)")
    parser.add_argument("--platform", type=str, default=None, dest="_platform",
                        help="Force a JAX platform (tpu/cpu) for this run")
    parser.add_argument("--profile_dir", type=str, default=None,
                        dest="_profile_dir",
                        help="Write a jax.profiler trace of epochs 3-5 here")
    parser.add_argument("--timing", action="store_true", dest="_timing",
                        help="Record per-epoch wall time and edges/s")
    parser.add_argument("--epochs_per_block", type=int, default=1,
                        dest="_epochs_per_block",
                        help="Run K epochs per compiled block (lax.scan) "
                             "with device-side best-val tracking — one "
                             "dispatch + one stats readback per K epochs")
    parser.add_argument("--mesh_shards", type=int, default=0,
                        dest="_mesh_shards",
                        help="Train distributed over an N-device mesh "
                             "(node-sharded activations, edge-partitioned "
                             "SpMM)")
    parser.add_argument("--halo_mode",
                        choices=["ring", "allgather", "halo", "halo-cootile"],
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

    if getattr(args, "_restore_checkpoint", None) and "state" in args.objects:
        from pathlib import Path

        from .modules import checkpoint as ckpt_io

        path = Path(args._restore_checkpoint)
        if path.is_dir():
            path = path / "ckpt.npz"
        args.objects["state"] = ckpt_io.load_pytree(path, args.objects["state"])
        print(f"===> Resumed training state from {path}")

    for func in args.objects["pretrain_callbacks"]:
        func(**args.objects["tensors"])

    # observability: per-epoch wall time + aggregation edges/s (the
    # reference has no tracing/profiling at all, SURVEY.md §5)
    timing = getattr(args, "_timing", False)
    nnz_per_epoch = 0
    if timing:
        hops = args.objects["tensors"].get("adj_hops")
        if isinstance(hops, (list, tuple)):  # dense-stack hops have no nnz
            nnz_per_epoch = sum(getattr(h, "nnz", 0) for h in hops)
        args.objects["epoch_times"] = []
    profile_dir = getattr(args, "_profile_dir", None)

    import time as _time

    block_k = getattr(args, "_epochs_per_block", 1) or 1
    ran_blocked = False
    if block_k > 1 and "train_block" in args.objects:
        if args.objects["pre_epoch_callbacks"]:
            print("===> --epochs_per_block ignored: model registered "
                  "per-epoch callbacks (e.g. minibatch re-masking)")
        else:
            if profile_dir:
                print("===> --profile_dir is a per-epoch-loop feature; "
                      "ignored with --epochs_per_block")
            _blocked_loop(args, block_k)
            ran_blocked = True

    args.current_epoch = 0 if not ran_blocked else args.current_epoch
    trace_active = False
    while not ran_blocked and args.current_epoch < args.epochs:
        args.current_epoch += 1
        if profile_dir and args.current_epoch == 3:
            jax.profiler.start_trace(profile_dir)
            trace_active = True
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
            # Honest device time: the step calls above return as soon as the
            # dispatch is ACKed (through the axon relay that reads ~ms
            # regardless of work), so force completion of every stat output
            # before reading the clock. test_step stats depend on the
            # updated params, so this covers the train step's update too.
            jax.block_until_ready(args.objects["epoch_stats"])
            dt = _time.perf_counter() - t_epoch
            args.objects["epoch_times"].append(dt)
            args.objects["epoch_stats"]["epoch_time_s"] = dt
            if nnz_per_epoch:
                # 2 forward passes (train+eval) + backward ≈ 3 aggregations
                args.objects["epoch_stats"]["agg_edges_per_s"] = (
                    3 * nnz_per_epoch / dt
                )
        if profile_dir and trace_active and args.current_epoch >= 5:
            jax.profiler.stop_trace()
            trace_active = False
            print(f"===> Profiler trace written to {profile_dir}")
            profile_dir = None
        for func in args.objects["post_epoch_callbacks"]:
            func(args.current_epoch, args)
        while (args.current_epoch >= args.epochs
               and len(args.objects["post_train_callbacks"]) > 0):
            func = args.objects["post_train_callbacks"].popleft()
            func(args)

    if profile_dir and trace_active:
        # run ended before epoch 5 (short run or early stop): flush the trace
        jax.profiler.stop_trace()
        print(f"===> Profiler trace written to {profile_dir}")

    if timing and args.objects.get("epoch_times"):
        times = args.objects["epoch_times"]
        steady = times[min(2, len(times) - 1):]
        print(f"===> Timing: {len(times)} epochs, "
              f"median {1e3 * sorted(steady)[len(steady) // 2]:.2f} ms/epoch "
              f"(first epoch {1e3 * times[0]:.1f} ms incl. compile)")
    if getattr(args, "_interactive", False):
        import IPython

        IPython.embed()
    return args


def _blocked_loop(args, k):
    """K-epochs-per-dispatch training (see --epochs_per_block).

    Replays the epoch protocol on the host from the stacked per-epoch stats:
    same stat lines, sliding-mean early stopping, and best-val bookkeeping
    (parameters at the best epoch are tracked on device inside the block).
    """
    import time as _time

    from .models._runtime import update_best_val_stats

    stats_printer = args.objects["statsPrinter"]
    early_stopping = args.objects["early_stopping"]
    es_metric = args.objects.get("es_metric", "val_loss")

    timing = bool(getattr(args, "_timing", False))
    block_times = []  # (k_eff, device_s) per dispatched block

    t0 = _time.perf_counter()
    args.current_epoch = 0
    stopped = False
    while args.current_epoch < args.epochs and not stopped:
        # tail blocks shrink so device-side best tracking never sees epochs
        # past --epochs (one extra compile for the final partial block)
        k_eff = min(k, args.epochs - args.current_epoch)
        t_block = _time.perf_counter()
        stack = args.objects["train_block"](
            k_eff, args.current_epoch + 1, **args.objects["tensors"]
        )
        if timing:
            # force completion before the host-side replay (whose per-stat
            # readbacks each pay relay RTT and would pollute the number)
            import jax

            jax.block_until_ready(stack)
            block_times.append((k_eff, _time.perf_counter() - t_block))
        n_avail = len(next(iter(stack.values())))
        for i in range(n_avail):
            if args.current_epoch >= args.epochs:
                break
            args.current_epoch += 1
            epoch_stats = {key: v[i] for key, v in stack.items()}
            epoch_stats["monitor"] = dict()
            args.objects["epoch_stats"] = epoch_stats
            stats_printer(args.current_epoch, epoch_stats)
            update_best_val_stats(args, epoch_stats, args.current_epoch)
            if early_stopping(epoch_stats[es_metric]):
                print("Early stopping...")
                args.epochs = args.current_epoch
                stopped = True
                break

    wall = _time.perf_counter() - t0
    print(f"===> Blocked training: {args.current_epoch} epochs in "
          f"{wall:.2f}s ({1e3 * wall / max(args.current_epoch, 1):.2f} "
          f"ms/epoch incl. compile)")
    if timing and len(block_times) > 1:
        # steady state: every block after the first full-size one (block 0
        # pays the compile; a shrunken tail block pays its own compile too,
        # so report only blocks whose k matches block 0's)
        k0 = block_times[0][0]
        steady = [t / ke for ke, t in block_times[1:] if ke == k0]
        if steady:
            print(f"===> Timing (blocked, device): "
                  f"{1e3 * sorted(steady)[len(steady) // 2]:.2f} ms/epoch "
                  f"steady-state over {len(steady)} block(s) of {k0} "
                  f"(first block {block_times[0][1]:.2f}s incl. compile)")
    while len(args.objects["post_train_callbacks"]) > 0:
        func = args.objects["post_train_callbacks"].popleft()
        func(args)
    return args


if __name__ == "__main__":
    main()
