"""Unified model factory: one interface over the MLP and DCGAN (G, D) pairs.

Downstream code (training, sampling strategies, eval) sees only:

* ``bundle.generate(g_vars, z, labels, train)`` -> samples (+ BN updates),
* ``bundle.discriminate(d_vars, x, labels, train)`` -> logits (+ BN updates),
* ``bundle.sample_z(key, n)``, ``bundle.init(key)``.

This replaces the reference's per-experiment model duplication (SURVEY.md
section 1: each of ``synthetic/``, ``mnist/``, ``celebA/`` carries its own
model code) with one shared core.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from collaborative_gan_sampling_tpu.config import ModelConfig
from collaborative_gan_sampling_tpu.models.dcgan import (  # noqa: F401
    DCGANDiscriminator,
    DCGANGenerator,
    make_dcgan_pair,
)
from collaborative_gan_sampling_tpu.models.mlp import (  # noqa: F401
    MLPDiscriminator,
    MLPGenerator,
    make_mlp_pair,
)

Variables = FrozenDict | dict


@dataclass(frozen=True)
class GANBundle:
    """A (G, D) pair plus the static facts the pipelines need."""

    g: nn.Module
    d: nn.Module
    z_dim: int
    data_shape: tuple[int, ...]  # per-sample shape: (2,) or (H, W, C)
    num_classes: int = 0
    _cfg: ModelConfig = field(default=None, repr=False)

    @property
    def conditional(self) -> bool:
        return self.num_classes > 0

    def sample_z(self, key: jax.Array, n: int) -> jax.Array:
        """z ~ N(0, I) — the reference uses uniform for some experiments but
        N(0, I) for the paper's main results."""
        return jax.random.normal(key, (n, self.z_dim), dtype=jnp.float32)

    def sample_labels(self, key: jax.Array, n: int) -> jax.Array | None:
        if not self.conditional:
            return None
        return jax.random.randint(key, (n,), 0, self.num_classes)

    def init(self, key: jax.Array, batch: int = 2) -> tuple[Variables, Variables]:
        """Initialise (g_vars, d_vars); each is {'params', ['batch_stats']}."""
        kg, kd, kl = jax.random.split(key, 3)
        z = jnp.zeros((batch, self.z_dim), jnp.float32)
        x = jnp.zeros((batch, *self.data_shape), jnp.float32)
        labels = (jnp.zeros((batch,), jnp.int32) if self.conditional else None)
        g_vars = self.g.init(kg, z, labels, train=True)
        d_vars = self.d.init(kd, x, labels, train=True)
        del kl
        return g_vars, d_vars

    def generate(self, g_vars: Variables, z: jax.Array,
                 labels: jax.Array | None = None, train: bool = False
                 ) -> jax.Array | tuple[jax.Array, Variables]:
        """G(z). With train=True also returns updated batch_stats."""
        if train and "batch_stats" in g_vars:
            x, updates = self.g.apply(g_vars, z, labels, train=True,
                                      mutable=["batch_stats"])
            return x, updates
        out = self.g.apply(g_vars, z, labels, train=False)
        return (out, {}) if train else out

    def discriminate(self, d_vars: Variables, x: jax.Array,
                     labels: jax.Array | None = None, train: bool = False
                     ) -> jax.Array | tuple[jax.Array, Variables]:
        """D(x) logits. With train=True also returns updated batch_stats."""
        if train and "batch_stats" in d_vars:
            logits, updates = self.d.apply(d_vars, x, labels, train=True,
                                           mutable=["batch_stats"])
            return logits, updates
        out = self.d.apply(d_vars, x, labels, train=False)
        return (out, {}) if train else out


def make_bundle(cfg: ModelConfig) -> GANBundle:
    if cfg.kind == "mlp":
        g, d = make_mlp_pair(cfg)
        return GANBundle(g=g, d=d, z_dim=cfg.z_dim,
                         data_shape=(cfg.data_dim,), num_classes=0, _cfg=cfg)
    if cfg.kind == "dcgan":
        from collaborative_gan_sampling_tpu.models.dcgan import num_stages
        if num_stages(cfg.image_size) == 0:
            # Clear error here, not a cryptic flax TypeError at init time
            # (n=0 would make the generator's channel count fractional).
            raise ValueError(
                f"model.image_size={cfg.image_size} is not supported by the "
                "DCGAN stack: it must halve at least once to a spatial size "
                ">= 4 (use an even size >= 8, e.g. 16/28/32/64)")
        g, d = make_dcgan_pair(cfg)
        shape = (cfg.image_size, cfg.image_size, cfg.channels)
        return GANBundle(g=g, d=d, z_dim=cfg.z_dim, data_shape=shape,
                         num_classes=cfg.num_classes, _cfg=cfg)
    raise ValueError(f"unknown model kind {cfg.kind!r}")
