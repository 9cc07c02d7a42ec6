"""DCGAN generator/discriminator in Flax (C7), incl. class-conditional variant.

Re-designs the reference's carpedm20-derived DCGAN (``celebA/model.py`` /
``mnist/model*.py``, approximate paths — SURVEY.md C7): generator =
linear project -> reshape -> stacked stride-2 deconv + batchnorm + relu ->
tanh; discriminator = stacked stride-2 conv + lrelu (batchnorm on all but the
first) -> linear logit. NHWC layout, bfloat16 compute / float32 params for
the MXU, 5x5 kernels.

Resolution handling generalises the reference's fixed 28x28 / 64x64 graphs:
the number of stride-2 stages is the largest n <= 4 with size % 2^n == 0 and
size / 2^n >= 4 (28 -> 7x7 base with 2 stages, 32 -> 4x4 with 3, 64 -> 4x4
with 4), covering every BASELINE.json config with one module.

Batchnorm semantics (a TF1<->JAX parity hazard, SURVEY.md section 7 hard part
4): training uses batch statistics and updates `batch_stats`
(`use_running_average=False`); sampling/refinement uses the running averages,
making D(x) per-sample decoupled and deterministic — required for exact
per-sample refinement gradients dD/dx_i.

Class conditioning (the ImageNet-64 extension required by BASELINE.json,
beyond the reference): label embedding concatenated to z in G; projection
discriminator (logit += <embed(y), features>) in D.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from collaborative_gan_sampling_tpu.config import ModelConfig
from collaborative_gan_sampling_tpu.ops.nn import (conv2d, dcgan_kernel_init,
                                                   deconv2d, lrelu)


def num_stages(size: int) -> int:
    n = 0
    while n < 4 and size % 2 == 0 and size // 2 >= 4:
        size //= 2
        n += 1
    return n


class DCGANGenerator(nn.Module):
    image_size: int = 32
    channels: int = 3
    base_filters: int = 64  # gf_dim: filters entering the last deconv
    z_dim: int = 100
    num_classes: int = 0
    label_embed_dim: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z: jax.Array, labels: jax.Array | None = None,
                 train: bool = True) -> jax.Array:
        n = num_stages(self.image_size)
        s0 = self.image_size // (2 ** n)
        h = z.astype(self.dtype)
        if self.num_classes > 0:
            emb = nn.Embed(self.num_classes, self.label_embed_dim,
                           embedding_init=dcgan_kernel_init,
                           dtype=self.dtype, name="label_embed")(labels)
            h = jnp.concatenate([h, emb], axis=-1)

        def bn(x, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)(x)

        ch0 = self.base_filters * (2 ** (n - 1))
        h = nn.Dense(s0 * s0 * ch0, kernel_init=dcgan_kernel_init,
                     dtype=self.dtype, name="project")(h)
        h = h.reshape(h.shape[0], s0, s0, ch0)
        h = nn.relu(bn(h, "bn_project"))
        for i in range(n - 1):
            ch = self.base_filters * (2 ** (n - 2 - i))
            h = deconv2d(ch, dtype=self.dtype, name=f"deconv{i}")(h)
            h = nn.relu(bn(h, f"bn{i}"))
        h = deconv2d(self.channels, dtype=self.dtype, name="deconv_out")(h)
        return jnp.tanh(h).astype(jnp.float32)


class DCGANDiscriminator(nn.Module):
    image_size: int = 32
    channels: int = 3
    base_filters: int = 64  # df_dim
    num_classes: int = 0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, labels: jax.Array | None = None,
                 train: bool = True) -> jax.Array:
        n = num_stages(self.image_size)
        h = x.astype(self.dtype)

        def bn(t, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)(t)

        h = lrelu(conv2d(self.base_filters, dtype=self.dtype,
                         name="conv0")(h))
        for i in range(1, n):
            h = conv2d(self.base_filters * (2 ** i), dtype=self.dtype,
                       name=f"conv{i}")(h)
            h = lrelu(bn(h, f"bn{i}"))
        feat = h.reshape(h.shape[0], -1)
        logit = nn.Dense(1, kernel_init=dcgan_kernel_init, dtype=self.dtype,
                         name="out")(feat)[..., 0]
        if self.num_classes > 0:
            # Projection discriminator: logit += <embed(y), feat>.
            emb = nn.Embed(self.num_classes, feat.shape[-1],
                           embedding_init=dcgan_kernel_init,
                           dtype=self.dtype, name="proj_embed")(labels)
            logit = logit + jnp.sum(emb * feat, axis=-1)
        return logit.astype(jnp.float32)


def make_dcgan_pair(cfg: ModelConfig) -> tuple[DCGANGenerator, DCGANDiscriminator]:
    dtype = jnp.dtype(cfg.compute_dtype)
    g = DCGANGenerator(image_size=cfg.image_size, channels=cfg.channels,
                       base_filters=cfg.g_base_filters, z_dim=cfg.z_dim,
                       num_classes=cfg.num_classes, dtype=dtype)
    d = DCGANDiscriminator(image_size=cfg.image_size, channels=cfg.channels,
                           base_filters=cfg.d_base_filters,
                           num_classes=cfg.num_classes, dtype=dtype)
    return g, d
