"""NN op library (C8).

The reference vendors carpedm20-style primitives (``celebA/ops.py``,
approximate path — SURVEY.md C8): ``conv2d``, ``deconv2d`` (transposed conv
with explicit output shape), ``lrelu``, ``linear`` and a ``batch_norm``
wrapper class. On TPU these are XLA-fused Flax/lax primitives, so this module
only defines what Flax lacks plus thin wrappers that pin down the TF1
semantics the reference relied on:

* ``lrelu``     — leaky relu, reference default slope 0.2;
* ``Conv / ConvTranspose`` config helpers — stride-2 'SAME' padding matching
  ``tf.nn.conv2d_transpose(output_shape=2*input)``, which for even sizes is
  exactly Flax's ``ConvTranspose(strides=(2,2), padding='SAME')``;
* DCGAN weight init — ``N(0, 0.02)`` for conv/deconv kernels (carpedm20
  convention).

Everything takes/returns NHWC, the TPU-preferred layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def lrelu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    """Leaky ReLU; reference ops.py uses leak=0.2."""
    return nn.leaky_relu(x, negative_slope=slope)


# carpedm20 DCGAN init: truncated-ish normal stddev 0.02 for conv kernels,
# normal 0.02 for linear; zeros bias. We use normal(0.02) throughout.
dcgan_kernel_init = nn.initializers.normal(stddev=0.02)


def conv2d(features: int, kernel: int = 5, stride: int = 2,
           dtype=jnp.bfloat16, name: str | None = None) -> nn.Conv:
    """Stride-2 'SAME' conv, 5x5 kernel — reference conv2d defaults."""
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding="SAME", kernel_init=dcgan_kernel_init,
                   dtype=dtype, name=name)


def deconv2d(features: int, kernel: int = 5, stride: int = 2,
             dtype=jnp.bfloat16, name: str | None = None) -> nn.ConvTranspose:
    """Stride-2 'SAME' transposed conv, 5x5 kernel — reference deconv2d.

    For even input sizes this reproduces TF1
    ``conv2d_transpose(..., output_shape=2*in, padding='SAME')`` shape
    semantics (out = stride * in).
    """
    return nn.ConvTranspose(features, (kernel, kernel),
                            strides=(stride, stride), padding="SAME",
                            kernel_init=dcgan_kernel_init, dtype=dtype,
                            name=name)
