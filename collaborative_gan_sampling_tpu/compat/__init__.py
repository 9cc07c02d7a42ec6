"""Reference-flag-compatible entry points.

The reference exposes per-experiment scripts with argparse/tf.app.flags
(SURVEY.md C16): ``synthetic/main_synthetic.py``, ``mnist/main_mnist.py``,
``celebA/main.py`` (approximate paths). These wrappers accept the reference's
flag *names* (``--mode``, ``--rollout_steps``, ``--rollout_rate``,
``--rejection_gamma``, ...) and map them onto the typed config tree, so a
user of the reference can run familiar command lines unchanged:

    python -m collaborative_gan_sampling_tpu.compat.main_synthetic \
        --mode benchmark --rollout_steps 10 --rollout_rate 0.1
    python -m collaborative_gan_sampling_tpu.compat.main_mnist --mode train
    python -m collaborative_gan_sampling_tpu.compat.main_celeba --mode collab

``tf1_import`` completes the migration: it converts the reference's trained
``tf.train.Saver`` checkpoints (SURVEY.md C15) into native framework
checkpoints (``cgs import-tf1 --config celeba tf1=/path/to/ckpts``), so
existing TF1 training runs carry over without retraining.
"""
