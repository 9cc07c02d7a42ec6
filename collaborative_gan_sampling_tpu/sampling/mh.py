"""MH-GAN baseline (C6) — Metropolis-Hastings sampling from a trained GAN.

Reference behavior (``synthetic/sampler.py``, SURVEY.md C6; method from
Turner et al. 2019, cited by the collaborative-sampling paper): treat G as an
independence proposal and run an MH chain whose stationary distribution is the
data distribution implied by a (calibrated) discriminator. With D-score
s(x) = sigmoid_calibrated(D(x)), the acceptance probability for proposal x'
given current x is

    alpha = min(1, (1/s(x) - 1) / (1/s(x') - 1)).

Calibration is Platt scaling (a, b) of the raw logits fit on held-out
real/fake scores — fit with a few jitted Newton/gradient steps on device.

TPU-native design: the whole chain is a ``lax.scan`` over chain length, fully
batched (B independent chains), zero host round-trips — versus the
reference's one sess.run per chain step. Chains initialise from a real data
sample ("MH-GAN (cal)" variant) or from a generator sample.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from collaborative_gan_sampling_tpu.models import GANBundle


def fit_platt(logits_real: jax.Array, logits_fake: jax.Array,
              iters: int = 200, lr: float = 0.1) -> tuple[jax.Array, jax.Array]:
    """Fit (a, b) so sigmoid(a * logit + b) separates real (1) / fake (0).

    Plain jitted gradient descent on the logistic loss — tiny problem
    (2 scalars), runs on device in one compiled call. The logits are
    standardized to unit scale for the fit (and the slope unscaled after),
    so the fixed step size is stable regardless of D's raw logit spread —
    on unnormalized logits with spread ~30 the loss curvature in `a` is
    ~E[logit^2]/4 and lr=0.1 would oscillate instead of converging.
    """
    logits = jnp.concatenate([logits_real, logits_fake])
    y = jnp.concatenate([jnp.ones_like(logits_real),
                         jnp.zeros_like(logits_fake)])
    scale = jnp.std(logits) + 1e-6
    zs = logits / scale

    def loss(ab):
        a, b = ab
        z = a * zs + b
        return jnp.mean(jax.nn.softplus(z) - y * z)

    grad = jax.grad(loss)

    def step(ab, _):
        return ab - lr * grad(ab), None

    ab0 = jnp.array([1.0, 0.0], jnp.float32)
    ab, _ = jax.lax.scan(step, ab0, None, length=iters)
    return ab[0] / scale, ab[1]


def calibrated_score(logits: jax.Array, a: jax.Array,
                     b: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(a * logits + b)


def make_mh_sampler(bundle: GANBundle, chain_len: int):
    """Build `mh(d_vars, key, x_init, labels, a, b) -> (x_final, aux)`.

    `x_init` (B, ...) seeds B independent chains; each chain consumes
    `chain_len` fresh G proposals. aux['accept_rate'] is the mean MH
    acceptance over the run; aux['n_accepts'] (B,) counts acceptances per
    chain — a chain with n_accepts == 0 still holds its initializer, which
    callers that seed chains with real data must filter out.
    """

    def mh(d_vars: Any, g_vars: Any, key: jax.Array, x_init: jax.Array,
           labels: jax.Array | None, a: jax.Array, b: jax.Array):
        batch = x_init.shape[0]
        s_init = calibrated_score(
            bundle.discriminate(d_vars, x_init, labels, train=False), a, b)

        def step(carry, i):
            x_cur, s_cur, n_acc = carry
            k = jax.random.fold_in(key, i)
            k_z, k_u = jax.random.split(k)
            z = bundle.sample_z(k_z, batch)
            x_prop = bundle.generate(g_vars, z, labels, train=False)
            s_prop = calibrated_score(
                bundle.discriminate(d_vars, x_prop, labels, train=False),
                a, b)
            eps = 1e-8
            ratio = (1.0 / (s_cur + eps) - 1.0) / (1.0 / (s_prop + eps) - 1.0)
            alpha = jnp.minimum(1.0, ratio)
            u = jax.random.uniform(k_u, (batch,))
            take = u < alpha
            take_x = take.reshape((batch,) + (1,) * (x_cur.ndim - 1))
            x_new = jnp.where(take_x, x_prop, x_cur)
            s_new = jnp.where(take, s_prop, s_cur)
            return (x_new, s_new, n_acc + take.astype(jnp.float32)), None

        (x_fin, s_fin, n_acc), _ = jax.lax.scan(
            step, (x_init, s_init, jnp.zeros((batch,), jnp.float32)),
            jnp.arange(chain_len))
        aux = {"score": s_fin, "accept_rate": jnp.mean(n_acc) / chain_len,
               "n_accepts": n_acc}
        return x_fin, aux

    return mh
