"""Discriminator shaping (C11) — the 'collaborative' half of collab sampling.

In the reference this is the sampling-phase branch of
``synthetic/main_synthetic.py`` (approximate path — SURVEY.md C11): after
training, D is fine-tuned on (real, *refined-fake*) batches so that its
data-space gradient field points toward the data manifold; G stays frozen.
Alternating this with refinement is what the paper (arXiv:1902.00813) calls
collaborative sampling.

Here shaping is its own tiny train state (D params + a fresh Adam at
`shaping_lr`) and a jitted step, reusing the same non-saturating D loss as
training (training/gan.py). It composes with the refinement scan inside one
jit in sampling/collab.py — refine K steps, shape D, repeat, with zero host
round-trips.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from collaborative_gan_sampling_tpu.models import GANBundle
from collaborative_gan_sampling_tpu.training.gan import (
    _merge_stats,
    _with_params,
    nonsaturating_d_loss,
)


class ShapingState(struct.PyTreeNode):
    d_vars: Any
    opt: Any
    step: jax.Array


def _make_tx(lr: float, decay: float = 1.0) -> optax.GradientTransformation:
    if decay != 1.0:
        # Exponential lr decay per shaping update (the 'anneal shaping'
        # schedule): update n runs at lr * decay**n.
        return optax.adam(lambda count: lr * decay ** count, b1=0.5)
    return optax.adam(lr, b1=0.5)


def create_shaping_state(d_vars: Any, lr: float, decay: float = 1.0
                         ) -> tuple[ShapingState,
                                    optax.GradientTransformation]:
    tx = _make_tx(lr, decay)
    return ShapingState(d_vars=dict(d_vars), opt=tx.init(d_vars["params"]),
                        step=jnp.zeros((), jnp.int32)), tx


def make_shaping_step(bundle: GANBundle, lr: float, decay: float = 1.0,
                      target: float = 0.0):
    """Build `shape_step(state, x_real, x_refined, labels_r, labels_f)
    -> (state, d_loss)` — one D update on a (real, refined) pair.

    With `target > 0` ('shape until target'), the update is skipped (state
    unchanged, step not counted) when D's mean real-vs-refined logit
    separation is already below `target` — shaping exists to keep D's
    gradient field informative, and once D can barely tell refined fakes
    from real, further fine-tuning only destabilises the field."""
    tx = _make_tx(lr, decay)

    def shape_step(state: ShapingState, x_real, x_refined,
                   labels_r=None, labels_f=None):
        x_refined = jax.lax.stop_gradient(x_refined)

        def loss_fn(d_params):
            d_vars = _with_params(state.d_vars, d_params)
            lr_real, upd = bundle.discriminate(d_vars, x_real, labels_r,
                                               train=True)
            d_vars2 = _merge_stats(d_vars, upd)
            lr_fake, upd2 = bundle.discriminate(d_vars2, x_refined, labels_f,
                                                train=True)
            sep = jnp.mean(lr_real) - jnp.mean(lr_fake)
            return nonsaturating_d_loss(lr_real, lr_fake), (upd2, sep)

        (loss, (upd, sep)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.d_vars["params"])

        def apply(state):
            updates, opt = tx.update(grads, state.opt,
                                     state.d_vars["params"])
            d_params = optax.apply_updates(state.d_vars["params"], updates)
            d_vars = _merge_stats(_with_params(state.d_vars, d_params), upd)
            return state.replace(d_vars=d_vars, opt=opt,
                                 step=state.step + 1)

        if target > 0:
            state = jax.lax.cond(sep > target, apply, lambda s: s, state)
        else:
            state = apply(state)
        return state, loss

    return shape_step
