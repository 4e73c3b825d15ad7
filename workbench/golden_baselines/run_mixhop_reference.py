"""Execute the reference TF1 MixHop baseline under tf.compat.v1 for parity.

The reference trainer (baselines/mixhop/mixhop_trainer.py) targets TF1 +
tf.contrib.slim.  TF 2.21 has no contrib, so this wrapper installs a
minimal faithful shim for exactly the two contrib surfaces MixHop touches:

  * ``tf.contrib.layers.batch_norm`` (mixhop_model.py:79,192,203) — slim
    defaults: decay 0.999, epsilon 0.001, center, no scale, and
    ``is_training=True`` (the reference never passes is_training, so batch
    statistics are used at train AND eval — reproduced exactly via
    tf.compat.v1.layers.batch_normalization(training=True));
  * ``slim.learning.create_train_op`` (mixhop_trainer.py:290) — gradient
    application under UPDATE_OPS control deps, returning the loss tensor.

Everything else (absl flags, placeholders, Session, sparse ops) runs on the
compat.v1 surface via ``sys.modules["tensorflow"] = tf.compat.v1``.

Usage:
    python run_mixhop_reference.py --dataset_name ind.cora \
        [any mixhop_trainer.py flags]
"""
import os
import sys
import types

MIXHOP_DIR = "/root/reference/baselines/mixhop"


def main():
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

    # The reference trainer has no seed flag (init randomness is TF's
    # default); --seed here pins it for a reproducible seed set.
    seed = None
    argv = sys.argv[1:]
    if "--seed" in argv:
        i = argv.index("--seed")
        seed = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sys.argv = [sys.argv[0]] + argv

    import tensorflow.compat.v1 as tf1

    tf1.disable_eager_execution()
    if seed is not None:
        import numpy as _np

        tf1.set_random_seed(seed)
        _np.random.seed(seed)

    def _batch_norm(inputs, *args, **kwargs):
        # slim batch_norm defaults; the reference passes no arguments.
        return tf1.layers.batch_normalization(
            inputs, momentum=0.999, epsilon=0.001, center=True, scale=False,
            training=kwargs.get("is_training", True))

    def _bias_add(inputs, scope=None):
        with tf1.variable_scope(scope, default_name="BiasAdd"):
            b = tf1.get_variable(
                "biases", shape=[int(inputs.shape[-1])], dtype=inputs.dtype,
                initializer=tf1.zeros_initializer())
            return tf1.nn.bias_add(inputs, b)

    def _create_train_op(total_loss, optimizer, gradient_multipliers=None,
                         global_step=None):
        if global_step is None:
            global_step = tf1.train.get_or_create_global_step()
        update_ops = tf1.get_collection(tf1.GraphKeys.UPDATE_OPS)
        with tf1.control_dependencies(update_ops):
            opt_op = optimizer.minimize(total_loss, global_step=global_step)
        with tf1.control_dependencies([opt_op]):
            return tf1.identity(total_loss, name="train_op")

    contrib = types.ModuleType("tensorflow.contrib")
    contrib_layers = types.ModuleType("tensorflow.contrib.layers")
    contrib_layers.batch_norm = _batch_norm
    contrib_layers.bias_add = _bias_add
    slim_mod = types.ModuleType("tensorflow.contrib.slim")
    slim_mod.learning = types.SimpleNamespace(create_train_op=_create_train_op)
    contrib.layers = contrib_layers
    contrib.slim = slim_mod
    tf1.contrib = contrib
    sys.modules["tensorflow"] = tf1
    sys.modules["tensorflow.contrib"] = contrib
    sys.modules["tensorflow.contrib.layers"] = contrib_layers
    sys.modules["tensorflow.contrib.slim"] = slim_mod

    scratch = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scratch", "mixhop")
    os.makedirs(scratch, exist_ok=True)
    os.chdir(scratch)

    # The planetoid files are python2 pickles; the reference's
    # numpy.load calls (mixhop_dataset.py:32-44) relied on py2-era
    # defaults.  Default the encoding for them.
    import numpy

    _orig_load = numpy.load

    def _latin1_load(*args, **kwargs):
        kwargs.setdefault("encoding", "latin1")
        return _orig_load(*args, **kwargs)

    numpy.load = _latin1_load

    sys.path.insert(0, MIXHOP_DIR)
    import runpy

    sys.argv = ["mixhop_trainer.py"] + sys.argv[1:]
    runpy.run_path(os.path.join(MIXHOP_DIR, "mixhop_trainer.py"),
                   run_name="__main__")


if __name__ == "__main__":
    main()
