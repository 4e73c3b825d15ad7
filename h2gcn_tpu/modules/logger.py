"""Checkpoint path management and epoch-stat printing.

Mirrors the reference logger semantics (h2gcn/modules/logger.py:11-98):
metric-templated checkpoint names, collision-safe relocation of a
pre-existing checkpoint dir, save/remove/restore of the training state, and
the fixed-format epoch line.
"""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime
from pathlib import Path

from . import checkpoint as ckpt_io


def add_subparser_args(parser):
    group = parser.add_argument_group("Logging arguments (modules/logger.py)")
    group.add_argument(
        "--checkpoint_dir",
        type=str,
        default="results/checkpoints/{model}_{dataset}_{runname}",
    )
    group.add_argument(
        "--checkpoint_name",
        type=str,
        default="{model}_{dataset}_{{epoch:04d}}_ta{{test_accuracy:.4f}}_va{{val_acc:.4f}}",
    )
    group.add_argument("--message", "-m", default=None,
                       help="Comments appended after runname")
    group.add_argument(
        "--run_id",
        default=datetime.now().strftime("%Y%m%d_%H%M%S"),
        help="(default: %(default)s)",
    )
    group.add_argument(
        "--ckpt_every_epoch", action="store_true", dest="_ckpt_every_epoch",
        help="Write every epoch's checkpoint to disk (reference behavior); "
        "default keeps the best state in device memory and writes only it.",
    )
    parser.function_hooks["argparse"].append(init_checkpoint_path)


def init_checkpoint_path(args):
    if not args.use_signac:
        if args.message is not None:
            args.run_id = args.run_id + "-" + args.message
        args.objects["checkpoint_dir"] = args.checkpoint_dir.format(
            runname=args.run_id, model=args.model, dataset=args.dataset
        )
    else:
        args.objects["checkpoint_dir"] = str(
            Path(args.objects["signac_job"].workspace()) / "checkpoints"
        )
    args.objects["checkpoint_name"] = args.checkpoint_name.format(
        model=args.model, dataset=args.dataset
    )
    target = Path(args.objects["checkpoint_dir"])
    if target.exists():
        mv_target = tempfile.mkdtemp(prefix="checkpoints_", dir=target.parent)
        target.replace(mv_target)
    target.mkdir(parents=True)
    print("===> Checkpoints will be saved to {}".format(args.objects["checkpoint_dir"]))


def save_ckpt(state, args, epoch, epoch_stats) -> str:
    """Save the training-state pytree under a metric-templated name."""
    stats = {k: (float(v) if hasattr(v, "item") else v)
             for k, v in epoch_stats.items()
             if not isinstance(v, dict) and k != "epoch"}
    ckpt_name = args.objects["checkpoint_name"].format(epoch=epoch, **stats)
    ckpt_path = Path(args.objects["checkpoint_dir"]) / ckpt_name / "ckpt.npz"
    ckpt_io.save_pytree(ckpt_path, state)
    return ckpt_name


def remove_ckpt(args, ckpt_name):
    if ckpt_name is None:
        return
    path = Path(args.objects["checkpoint_dir"]) / ckpt_name
    if path.exists():
        shutil.rmtree(str(path))


def restore_ckpt(state, args, ckpt_name):
    path = Path(args.objects["checkpoint_dir"]) / ckpt_name / "ckpt.npz"
    return ckpt_io.load_pytree(path, state)


class EpochStatsPrinter:
    """Fixed-format epoch line (reference logger.py:82-98)."""

    def __init__(self, format_str=None):
        self.format_str = format_str or "    ".join(
            [
                "Epoch: {epoch:04}",
                "Train Loss: {train_loss:9.6f}",
                "Train Acc: {train_acc:7.2%}",
                "Val Loss: {val_loss:9.6f}",
                "Val Acc: {val_acc:7.2%}",
                "Test Acc: {test_accuracy:7.2%}",
            ]
        )

    @staticmethod
    def _floats(stats: dict) -> dict:
        return {
            k: (float(v) if hasattr(v, "item") else v) for k, v in stats.items()
        }

    def __call__(self, epoch, epoch_stats: dict):
        print(self.format_str.format(epoch=epoch, **self._floats(epoch_stats)))

    def from_dict(self, epoch_stats: dict):
        print(self.format_str.format(**self._floats(epoch_stats)))
        if "monitor" in epoch_stats:
            print(epoch_stats["monitor"])
