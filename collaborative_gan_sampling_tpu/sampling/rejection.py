"""Discriminator rejection sampling (C5) — DRS, arXiv:1810.06758.

Reference behavior (``synthetic/sampler.py``, shared with C4 — SURVEY.md C5):
probabilistic acceptance from D logits with burn-in calibration. With F(x)
the D logit and M an estimate of max_x F(x) from a burn-in pool, acceptance
probability is sigmoid(F_hat) with

    F_hat = F - M - log(1 - exp(F - M - eps)) - gamma,

where eps avoids log(0) and gamma shifts the acceptance rate (the DRS paper's
dynamic-percentile constant). In collab mode the same test is applied to
*refined* samples (paper arXiv:1902.00813).

All pure jnp — runs inside the fused sampling scan; the variable-size
"accepted set" is represented as a static-shape boolean mask (SURVEY.md
section 7 hard part 5), compacted on the host only at the very end.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def drs_logit_shift(logits: jax.Array, logit_max: jax.Array,
                    gamma: float = 0.0, eps: float = 1e-6) -> jax.Array:
    """F_hat as above; logits may be any shape, broadcast against scalar M."""
    f = logits - logit_max  # <= 0 when M is a true max
    # Guard: if a new logit exceeds the burn-in max, clamp so exp() < 1.
    f = jnp.minimum(f, -eps)
    return f - jnp.log(-jnp.expm1(f - eps)) - gamma


def drs_acceptance_prob(logits: jax.Array, logit_max: jax.Array,
                        gamma: float = 0.0, eps: float = 1e-6,
                        gamma_percentile: float = 0.0) -> jax.Array:
    """Acceptance probability sigmoid(F_hat - gamma_total).

    With `gamma_percentile` > 0, gamma additionally includes the batch
    percentile of F_hat — the DRS paper's *dynamic* gamma: it re-centers the
    acceptance test on the batch's own score distribution, keeping the accept
    rate usable even when D's logit spread is large (samples at the
    percentile get p = 0.5). `gamma` then acts as a static offset on top.
    """
    shifted = drs_logit_shift(logits, logit_max, 0.0, eps)
    g = jnp.float32(gamma)
    if gamma_percentile > 0:
        g = g + jnp.percentile(shifted, gamma_percentile)
    return jax.nn.sigmoid(shifted - g)


def drs_accept_mask(key: jax.Array, logits: jax.Array, logit_max: jax.Array,
                    gamma: float = 0.0, eps: float = 1e-6,
                    gamma_percentile: float = 0.0,
                    use_pallas: bool = False) -> jax.Array:
    """Boolean accept mask, same shape as logits.

    With use_pallas on a TPU backend, the shift+sigmoid+RNG+compare runs as
    one fused Pallas VPU kernel with in-kernel hardware PRNG
    (ops/accept_pallas.py); statistically equivalent, different RNG stream.
    """
    if use_pallas and logits.ndim == 1 and jax.default_backend() == "tpu":
        from collaborative_gan_sampling_tpu.ops.accept_pallas import (
            drs_accept_mask_pallas,
        )
        g = jnp.float32(gamma)
        if gamma_percentile > 0:
            shifted = drs_logit_shift(logits, logit_max, 0.0, eps)
            g = g + jnp.percentile(shifted, gamma_percentile)
        return drs_accept_mask_pallas(key, logits,
                                      jnp.asarray(logit_max, jnp.float32),
                                      g, eps)
    p = drs_acceptance_prob(logits, logit_max, gamma, eps, gamma_percentile)
    u = jax.random.uniform(key, logits.shape)
    return u < p


def estimate_logit_max(bundle, d_vars: Any, sample_fn: Callable,
                       key: jax.Array, burn_in: int,
                       batch_size: int) -> jax.Array:
    """Burn-in estimate of M = max_x F(x) over `burn_in` generated samples.

    `sample_fn(key, n) -> (x, labels_or_None)` produces candidate samples
    (typically G(z), or refined G(z) in collab mode) with their conditioning
    labels. Jittable: fixed number of batches.
    """
    n_batches = max(1, burn_in // batch_size)

    def body(carry, i):
        k = jax.random.fold_in(key, i)
        x, labels = sample_fn(k, batch_size)
        logits = bundle.discriminate(d_vars, x, labels, train=False)
        return jnp.maximum(carry, jnp.max(logits)), None

    m, _ = jax.lax.scan(body, jnp.asarray(-jnp.inf, jnp.float32),
                        jnp.arange(n_batches))
    return m


def estimate_logit_max_per_class(bundle, d_vars: Any, sample_fn: Callable,
                                 key: jax.Array, burn_in: int,
                                 batch_size: int,
                                 num_classes: int) -> jax.Array:
    """Per-class burn-in estimate M_c = max_{x: class c} F(x), shape (C,).

    Conditional DRS calibration: a projection discriminator's logit scale
    differs per class, so one global M over-rejects whole classes. Computed
    with a scatter-max inside the same scan; classes never drawn during
    burn-in fall back to the global max. The per-sample shift is then
    ``logits - M[labels]`` fed to `drs_accept_mask` with logit_max=0 —
    `drs_logit_shift` depends only on the difference, so the fold-in is
    exact (tests/test_rejection.py pins this identity).
    """
    n_batches = max(1, burn_in // batch_size)

    def body(carry, i):
        k = jax.random.fold_in(key, i)
        x, labels = sample_fn(k, batch_size)
        logits = bundle.discriminate(d_vars, x, labels, train=False)
        return carry.at[labels].max(logits), None

    m0 = jnp.full((num_classes,), -jnp.inf, jnp.float32)
    m, _ = jax.lax.scan(body, m0, jnp.arange(n_batches))
    return jnp.where(jnp.isfinite(m), m, jnp.max(m))
