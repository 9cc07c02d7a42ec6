"""collaborative_gan_sampling_tpu — a TPU-native collaborative GAN sampling framework.

A ground-up JAX/XLA/Flax/Pallas rebuild of the capabilities of
vita-epfl/collaborative-gan-sampling (AAAI 2020, arXiv:1902.00813):

* train GAN generator/discriminator pairs (MLP for 2D synthetic mixtures,
  DCGAN for MNIST / Fashion-MNIST / CIFAR-10 / CelebA-64, class-conditional
  for ImageNet-64);
* improve sample quality *after* training via collaborative sampling:
  iterative discriminator-guided refinement of samples in data space
  (gradient ascent along dD/dx, fused into a single jitted ``lax.scan`` with
  an optional Pallas inner kernel), probabilistic rejection (DRS) and
  Metropolis-Hastings baselines, and discriminator shaping (fine-tuning D on
  refined samples);
* evaluate with on-device FID and 2D-mixture metrics (%HQ, KL);
* scale data-parallel over a ``jax.sharding.Mesh`` (e.g. a TPU v5e-8) with
  XLA-emitted ICI collectives.

The reference is a single-process TF1 research codebase organised
per-experiment (``synthetic/``, ``mnist/``, ``celebA/``, ``teaser/`` — see
SURVEY.md section 1); this package inverts that into one shared layered core
with thin per-experiment config presets.

Layer map (SURVEY.md section 1 -> subpackages here):

=====  ==========================  ==============================
Layer  Reference                   Here
=====  ==========================  ==============================
L6     ``main*.py`` scripts        :mod:`.cli`
L5     FID / 2D metrics / plots    :mod:`.evals`, :mod:`.viz`
L4     sampling strategies         :mod:`.sampling`
L3     training loops              :mod:`.training`
L2     models & ops                :mod:`.models`, :mod:`.ops`
L1     data                        :mod:`.data`
L0     TF1 + tf.Session            JAX/XLA (+ :mod:`.parallel`)
=====  ==========================  ==============================
"""

__version__ = "0.1.0"

from collaborative_gan_sampling_tpu.config import (  # noqa: F401
    Config,
    EvalConfig,
    MeshConfig,
    ModelConfig,
    RefineConfig,
    TrainConfig,
    get_preset,
    list_presets,
)
