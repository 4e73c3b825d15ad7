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

    known_args, _ = parser.parse_known_args(argv)
    if known_args._platform:
        jax.config.update("jax_platforms", known_args._platform)

    models.add_subparsers(parser, argv)
    datasets.add_subparsers(parser, argv)
    logger.add_subparser_args(parser)
    monitor.add_subparser_args(parser)

    args = arguments.parse_args(parser, argv)

    for func in args.objects["pretrain_callbacks"]:
        func(**args.objects["tensors"])

    args.current_epoch = 0
    while args.current_epoch < args.epochs:
        args.current_epoch += 1
        for func in args.objects["pre_epoch_callbacks"]:
            func(args.current_epoch, args)
        args.objects["epoch_stats"] = dict()
        args.objects["epoch_stats"].update(
            args.objects["train_step"](**args.objects["tensors"])
        )
        args.objects["epoch_stats"].update(
            args.objects["test_step"](**args.objects["tensors"])
        )
        for func in args.objects["post_epoch_callbacks"]:
            func(args.current_epoch, args)
        while (args.current_epoch >= args.epochs
               and len(args.objects["post_train_callbacks"]) > 0):
            func = args.objects["post_train_callbacks"].popleft()
            func(args)

    return args


if __name__ == "__main__":
    main()
