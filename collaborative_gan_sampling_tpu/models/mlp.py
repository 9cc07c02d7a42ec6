"""MLP generator/discriminator for 2D synthetic mixtures (C2).

Mirrors the reference's ``synthetic/model.py`` (approximate path — SURVEY.md
C2): a small MLP generator z in R^{z_dim} -> R^2 and MLP discriminator
R^2 -> logit with a few relu hidden layers. Kept deliberately tiny — the value
of the 2D stack is that it reproduces the paper's scientific claim with zero
dataset dependencies (SURVEY.md section 7 stage 2).

The discriminator is a pure function of x (no normalisation layers), so
per-sample refinement gradients dD/dx are exact and decoupled across the
batch — the property the refinement engine (sampling/refine.py) and its
Pallas fast path (ops/refine_pallas.py) rely on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from collaborative_gan_sampling_tpu.config import ModelConfig


class MLPGenerator(nn.Module):
    """z -> 2D point. Linear output (2D data is unbounded, unlike images)."""

    hidden: int = 128
    layers: int = 3
    out_dim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, labels: jax.Array | None = None,
                 train: bool = True) -> jax.Array:
        # labels/train accepted for interface uniformity with the DCGAN
        # modules; the synthetic models are unconditional and stateless.
        del labels, train
        h = z.astype(self.dtype)
        for i in range(self.layers):
            h = nn.Dense(self.hidden, dtype=self.dtype, name=f"fc{i}")(h)
            h = nn.relu(h)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="out")(h)
        return out.astype(jnp.float32)


class MLPDiscriminator(nn.Module):
    """x (B, 2) -> logit (B,)."""

    hidden: int = 128
    layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, labels: jax.Array | None = None,
                 train: bool = True) -> jax.Array:
        del labels, train
        h = x.astype(self.dtype)
        for i in range(self.layers):
            h = nn.Dense(self.hidden, dtype=self.dtype, name=f"fc{i}")(h)
            h = nn.relu(h)
        logit = nn.Dense(1, dtype=self.dtype, name="out")(h)
        return logit.astype(jnp.float32)[..., 0]


def make_mlp_pair(cfg: ModelConfig) -> tuple[MLPGenerator, MLPDiscriminator]:
    dtype = jnp.dtype(cfg.compute_dtype)
    g = MLPGenerator(hidden=cfg.g_hidden, layers=cfg.g_layers,
                     out_dim=cfg.data_dim, dtype=dtype)
    d = MLPDiscriminator(hidden=cfg.d_hidden, layers=cfg.d_layers,
                         dtype=dtype)
    return g, d
