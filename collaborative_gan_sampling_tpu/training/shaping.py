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
    _real_pass,
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
    """Standalone state constructor. NOTE: the optimizer state structure
    depends on `decay` (a schedule adds a count to the Adam state), so the
    (lr, decay) pair MUST match the `make_shaping_step` call that will
    consume the state — prefer ``make_shaping_step(...).init(d_vars)``,
    which pairs them structurally."""
    tx = _make_tx(lr, decay)
    return ShapingState(d_vars=dict(d_vars), opt=tx.init(d_vars["params"]),
                        step=jnp.zeros((), jnp.int32)), tx


def _class_weights(labels: jax.Array, num_classes: int) -> jax.Array:
    """Per-sample inverse-frequency weights, normalized to mean 1.

    Each class *present in the batch* contributes equally to a weighted-mean
    loss (class-stratified shaping): with C_present distinct labels, a class
    with cnt samples gets per-sample weight B / (C_present * cnt). A
    class-balanced batch (all counts equal) yields all-ones — the weighting
    is exactly a no-op there, so it only acts when the label draw is skewed."""
    cnt = jnp.zeros((num_classes,), jnp.float32).at[labels].add(1.0)
    present = jnp.sum((cnt > 0).astype(jnp.float32))
    w = jnp.where(cnt > 0, 1.0 / jnp.maximum(cnt, 1.0), 0.0)[labels]
    return w * (labels.shape[0] / jnp.maximum(present, 1.0))


def _embed_grad_mask(params: Any) -> Any:
    """1.0/0.0 mask over the D param tree zeroing class-embedding subtrees.

    Matches the projection discriminator's ``proj_embed`` (models/dcgan.py)
    and any other ``*embed*``-named module: with num_classes >> batch each
    embedding row receives a gradient from ~batch/num_classes samples —
    pure noise — while the shared trunk sees the whole batch."""

    def mask(tree, frozen):
        if isinstance(tree, dict):
            return {k: mask(v, frozen or "embed" in k.lower())
                    for k, v in tree.items()}
        return jnp.zeros_like(tree) if frozen else jnp.ones_like(tree)

    return mask(params, False)


def make_shaping_step(bundle: GANBundle, lr: float, decay: float = 1.0,
                      target: float = 0.0, freeze_embed: bool = False,
                      anchor: float = 0.0, class_weight: bool = False,
                      r1_gamma: float = 0.0):
    """Build `shape_step(state, x_real, x_refined, labels_r, labels_f)
    -> (state, d_loss)` — one D update on a (real, refined) pair.

    With `target > 0` ('shape until target'), the update is skipped (state
    unchanged, step not counted) when D's mean real-vs-refined logit
    separation is already below `target` — shaping exists to keep D's
    gradient field informative, and once D can barely tell refined fakes
    from real, further fine-tuning only destabilises the field.

    ``freeze_embed`` zeroes gradients on class-embedding params (trunk-only
    shaping for many-class conditional models); ``anchor > 0`` adds an
    L2-SP trust-region term ``0.5 * anchor * ||p - p_restored||^2`` pulling
    the shaped D toward the D it started from; ``class_weight`` stratifies
    the loss by class (conditional models): each class present in the batch
    contributes equally, so frequent classes cannot drown rare ones in the
    shaping gradient (exactly a no-op on class-balanced batches);
    ``r1_gamma > 0`` adds the R1 penalty 0.5*gamma*E||grad_x D(x_real)||^2
    (arXiv:1801.04406) to each shaping update — shaping's whole point is
    D's data-space gradient field, and R1 bounds that field's magnitude on
    the manifold, complementing ``anchor``'s parameter-space pull."""
    tx = _make_tx(lr, decay)
    num_classes = bundle.num_classes if class_weight else 0

    def shape_step(state: ShapingState, x_real, x_refined,
                   labels_r=None, labels_f=None, anchor_params=None):
        x_refined = jax.lax.stop_gradient(x_refined)

        def loss_fn(d_params):
            d_vars = _with_params(state.d_vars, d_params)
            lr_real, upd, r1 = _real_pass(bundle, d_vars, x_real, labels_r,
                                          r1_gamma)
            d_vars2 = _merge_stats(d_vars, upd)
            lr_fake, upd2 = bundle.discriminate(d_vars2, x_refined, labels_f,
                                                train=True)
            sep = jnp.mean(lr_real) - jnp.mean(lr_fake)
            if class_weight and labels_f is not None and labels_r is not None:
                w_r = _class_weights(labels_r, num_classes)
                w_f = _class_weights(labels_f, num_classes)
                loss = (jnp.mean(w_r * jax.nn.softplus(-lr_real))
                        + jnp.mean(w_f * jax.nn.softplus(lr_fake)))
            else:
                loss = nonsaturating_d_loss(lr_real, lr_fake)
            if anchor > 0 and anchor_params is not None:
                # Standard L2-SP: 0.5 * anchor * ||p - p_restored||^2 (sum
                # over ALL params, so the pull-back gradient on each param
                # is anchor * (p - p0) regardless of layer size).
                sq = jax.tree_util.tree_map(
                    lambda p, p0: jnp.sum(jnp.square(
                        p.astype(jnp.float32) - p0.astype(jnp.float32))),
                    d_params, anchor_params)
                loss = loss + 0.5 * anchor * sum(
                    jax.tree_util.tree_leaves(sq))
            if r1 is not None:
                loss = loss + 0.5 * r1_gamma * r1
            return loss, (upd2, sep)

        (loss, (upd, sep)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.d_vars["params"])
        if freeze_embed:
            grads = jax.tree_util.tree_map(
                lambda g, m: g * m.astype(g.dtype), grads,
                _embed_grad_mask(grads))

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

    def init(d_vars: Any) -> ShapingState:
        """ShapingState whose Adam state structurally matches THIS step fn
        (the tx is shared, so lr/decay cannot drift apart across the pair)."""
        return ShapingState(d_vars=dict(d_vars),
                            opt=tx.init(d_vars["params"]),
                            step=jnp.zeros((), jnp.int32))

    shape_step.init = init
    return shape_step
