"""2D Gaussian-mixture data (C1).

Covers the reference's synthetic distributions (``synthetic/utils.py`` in the
reference tree, approximate path — SURVEY.md C1): the 8-Gaussian ring, its
*imbalanced* variant (the paper's mode-coverage stress test, arXiv:1902.00813),
and a 5x5 grid mixture. Unlike the reference's stateful numpy generators, the
sampler here is a pure jittable function of a PRNG key so it can live inside a
fused train step and be sharded over the batch axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MixtureSpec(NamedTuple):
    """Static description of a 2D Gaussian mixture."""

    means: jax.Array  # (M, 2)
    weights: jax.Array  # (M,), sums to 1
    std: float  # shared isotropic std


def make_mixture(name: str, radius: float = 2.0, std: float = 0.1) -> MixtureSpec:
    if name in ("ring8", "ring8_imbalanced"):
        angles = np.arange(8) * (2.0 * np.pi / 8.0)
        means = radius * np.stack([np.cos(angles), np.sin(angles)], axis=1)
        if name == "ring8":
            weights = np.full(8, 1.0 / 8.0)
        else:
            # Imbalanced ring: geometric mode weights (dominant mode ~40x the
            # rarest) — the regime where collaborative sampling's mode-coverage
            # advantage shows up in the paper.
            weights = 0.6 ** np.arange(8)
            weights = weights / weights.sum()
    elif name == "grid25":
        xs = np.linspace(-radius, radius, 5)
        means = np.stack(np.meshgrid(xs, xs), axis=-1).reshape(-1, 2)
        weights = np.full(25, 1.0 / 25.0)
    else:
        raise ValueError(f"unknown 2D mixture {name!r}")
    return MixtureSpec(
        means=jnp.asarray(means, jnp.float32),
        weights=jnp.asarray(weights, jnp.float32),
        std=float(std),
    )


def sample_mixture(key: jax.Array, spec: MixtureSpec, n: int) -> jax.Array:
    """Draw n points: categorical mode choice + isotropic Gaussian noise."""
    k_mode, k_noise = jax.random.split(key)
    idx = jax.random.categorical(
        k_mode, jnp.log(spec.weights)[None, :], shape=(n,))
    centers = spec.means[idx]
    noise = spec.std * jax.random.normal(k_noise, (n, 2), dtype=jnp.float32)
    return centers + noise


def log_density(spec: MixtureSpec, x: jax.Array) -> jax.Array:
    """Exact mixture log-density at x (used by viz and tests), shape (N,)."""
    d2 = jnp.sum((x[:, None, :] - spec.means[None, :, :]) ** 2, axis=-1)
    var = spec.std ** 2
    log_comp = -d2 / (2 * var) - jnp.log(2 * jnp.pi * var)
    return jax.nn.logsumexp(jnp.log(spec.weights)[None, :] + log_comp, axis=1)
