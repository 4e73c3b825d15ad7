"""Restore the reference's intended learning rate under tf-keras 2.21.

The reference builds its optimizer with
``keras.optimizers.get(name).from_config({"lr": lr})``
(reference h2gcn/models/H2GCN.py:62-63). The TF-2.1-era keras honored the
deprecated "lr" alias; tf-keras 2.21 warns and silently DROPS it, so the
reference-as-executed trains at the Adam default 1e-3 instead of --lr.
``apply()`` translates the alias back before from_config sees it.
Set H2GCN_REF_KEEP_LR_BUG=1 to reproduce the modern-keras drop.
"""
import os


def apply():
    if os.environ.get("H2GCN_REF_KEEP_LR_BUG"):
        return
    import tf_keras

    base = tf_keras.optimizers.Optimizer
    orig = base.from_config.__func__

    def from_config(cls, config, custom_objects=None):
        config = dict(config)
        if "lr" in config and "learning_rate" not in config:
            config["learning_rate"] = config.pop("lr")
        return orig(cls, config, custom_objects)

    base.from_config = classmethod(from_config)
