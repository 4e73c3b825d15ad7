"""Inference entry point: load a checkpoint, emit predictions.

``python -m h2gcn_tpu.predict <MODEL> <DATAFMT> --dataset ...
--restore_checkpoint <ckpt.npz> --output preds.npz``

Reuses the full plugin stack (model + dataset + preprocessing hooks), then
runs the registered ``predict_step`` once and writes class probabilities,
predicted labels, and the split masks.
"""

from __future__ import annotations

import jax
import numpy as np

from . import datasets, models
from .modules import arguments, logger, monitor


def main(argv=None):
    parser = arguments.create_parser()
    parser.add_argument("--random_seed", type=int, default=123)
    parser.add_argument("--epochs", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None, dest="_platform")
    parser.add_argument("--restore_checkpoint", type=str, required=False,
                        default=None, dest="_restore_checkpoint",
                        help="ckpt.npz (or directory) with trained state; "
                             "omit to predict with fresh init (smoke use)")
    parser.add_argument("--output", type=str, default="predictions.npz",
                        dest="_output")

    known_args, _ = parser.parse_known_args(argv)
    if known_args._platform:
        jax.config.update("jax_platforms", known_args._platform)

    models.add_subparsers(parser, argv)
    datasets.add_subparsers(parser, argv)
    logger.add_subparser_args(parser)
    monitor.add_subparser_args(parser)
    args = arguments.parse_args(parser, argv)

    if args._restore_checkpoint:
        from pathlib import Path

        from .modules import checkpoint as ckpt_io

        path = Path(args._restore_checkpoint)
        if path.is_dir():
            path = path / "ckpt.npz"
        args.objects["state"] = ckpt_io.load_pytree(path, args.objects["state"])
        print(f"===> Restored state from {path}")

    tensors = args.objects["tensors"]
    logits = np.asarray(args.objects["predict_step"](**tensors))
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    out = dict(
        logits=logits,
        predicted_prob=probs,
        predicted_label=logits.argmax(1),
    )
    for key in ("train_mask", "val_mask", "test_mask"):
        if key in tensors:
            out[key] = np.asarray(tensors[key])
    np.savez(args._output, **out)
    print(f"===> Wrote predictions for {logits.shape[0]} nodes to "
          f"{args._output}")
    return args


if __name__ == "__main__":
    main()
