"""GAN training (C3/C10): non-saturating loss, Adam, fully-jitted step chunks.

The reference's train loops (``synthetic/main_synthetic.py`` and
``celebA/model.py::DCGAN.train`` — approximate paths, SURVEY.md sections 3.1
and 3.3) dispatch one ``sess.run`` per optimizer per iteration; host Python
drives every step, and per-step dispatch overhead dominates on small models.

TPU-native design: one `train_step` = (data draw + d_steps D updates +
g_steps G updates), and ``make_train_chunk`` wraps `steps_per_call` of them
in a single ``lax.scan`` under one ``jit`` — the host dispatches once per
chunk, XLA pipelines everything on device, and data is drawn *inside* the
step from device-resident sources (pure function of the PRNG key), so the
host never touches a batch.

Loss is the non-saturating GAN loss (paper arXiv:1902.00813 uses it for both
the synthetic and image experiments):
    d_loss = E[softplus(-D(x_real))] + E[softplus(D(G(z)))]
    g_loss = E[softplus(-D(G(z)))]
equivalent to the reference's sigmoid-BCE formulation but numerically stable
in bfloat16/float32.

Multi-chip: the step is pure; under a Mesh the batch from `data_fn` is
annotated with a 'data' sharding constraint and params stay replicated, so
XLA inserts the psum gradient all-reduce over ICI (SURVEY.md C18/C19
equivalents). No pmap, no hand-written collectives.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from collaborative_gan_sampling_tpu.config import TrainConfig
from collaborative_gan_sampling_tpu.models import GANBundle
from collaborative_gan_sampling_tpu.utils.prng import step_key

# data_fn(key, batch_size) -> (x_real, labels_or_None); must be pure & jittable
DataFn = Callable[[jax.Array, int], tuple[jax.Array, jax.Array | None]]


def nonsaturating_d_loss(logits_real: jax.Array,
                         logits_fake: jax.Array) -> jax.Array:
    return (jnp.mean(jax.nn.softplus(-logits_real))
            + jnp.mean(jax.nn.softplus(logits_fake)))


def nonsaturating_g_loss(logits_fake: jax.Array) -> jax.Array:
    return jnp.mean(jax.nn.softplus(-logits_fake))


class TrainState(struct.PyTreeNode):
    """Everything that evolves during training — one checkpointable pytree."""

    g_vars: Any  # {'params': ..., ['batch_stats': ...]}
    d_vars: Any
    g_opt: Any
    d_opt: Any
    step: jax.Array  # int32 scalar
    g_ema: Any = None  # EMA of g_vars['params'] when train.g_ema_decay > 0


def sampling_g_vars(state: TrainState) -> dict:
    """G variables for sampling/eval/serving: the EMA generator when
    tracked (train.g_ema_decay > 0), else the live params. BN running
    averages come from g_vars either way."""
    if getattr(state, "g_ema", None) is None:
        return state.g_vars
    return _with_params(state.g_vars, state.g_ema)


def _with_params(variables: Any, params: Any) -> dict:
    v = dict(variables)
    v["params"] = params
    return v


def _merge_stats(variables: Any, updates: Any) -> dict:
    v = dict(variables)
    if updates and "batch_stats" in updates:
        v["batch_stats"] = updates["batch_stats"]
    return v


def _real_pass(bundle: GANBundle, d_vars: Any, x_real: jax.Array,
               labels_r: jax.Array | None, r1_gamma: float):
    """D forward on the real batch; with R1 also E[||grad_x D||^2].

    R1 gradient penalty (Mescheder et al., arXiv:1801.04406): differentiate
    the same train-mode forward used by the loss with respect to its input,
    so enabling the penalty costs one extra backward (plus the second-order
    terms in the parameter gradient), not an extra forward. Returns
    ``(logits_real, stats_update, r1 | None)`` — the raw E||grad||^2; the
    caller scales by gamma/2.
    """
    if r1_gamma <= 0.0:
        lr, upd = bundle.discriminate(d_vars, x_real, labels_r, train=True)
        return lr, upd, None

    def real_sum(x):
        lr, upd = bundle.discriminate(d_vars, x, labels_r, train=True)
        return jnp.sum(lr), (lr, upd)

    gx, (lr, upd) = jax.grad(real_sum, has_aux=True)(x_real)
    r1 = jnp.mean(jnp.sum(jnp.square(gx.astype(jnp.float32)),
                          axis=tuple(range(1, gx.ndim))))
    return lr, upd, r1


def make_optimizers(cfg: TrainConfig) -> tuple[optax.GradientTransformation,
                                               optax.GradientTransformation]:
    # Matches the reference's AdamOptimizer(lr, beta1) (carpedm20 defaults
    # beta1=0.5); beta2/eps are TF defaults.
    g_tx = optax.adam(cfg.g_lr, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8)
    d_tx = optax.adam(cfg.d_lr, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8)
    return g_tx, d_tx


def create_train_state(bundle: GANBundle, cfg: TrainConfig,
                       key: jax.Array) -> TrainState:
    g_vars, d_vars = bundle.init(key, batch=max(2, min(cfg.batch_size, 8)))
    g_tx, d_tx = make_optimizers(cfg)
    ema = (jax.tree.map(jnp.copy, g_vars["params"])
           if getattr(cfg, "g_ema_decay", 0.0) > 0 else None)
    return TrainState(
        g_vars=dict(g_vars), d_vars=dict(d_vars),
        g_opt=g_tx.init(g_vars["params"]),
        d_opt=d_tx.init(d_vars["params"]),
        step=jnp.zeros((), jnp.int32),
        g_ema=ema,
    )


def make_train_chunk(bundle: GANBundle, cfg: TrainConfig, data_fn: DataFn,
                     base_key: jax.Array, mesh: Mesh | None = None,
                     steps_per_call: int | None = None):
    """Build `chunk(state) -> (state, metrics)` running `steps_per_call`
    full train iterations in one compiled call."""
    g_tx, d_tx = make_optimizers(cfg)
    n_steps = steps_per_call or cfg.steps_per_call
    batch = cfg.batch_size

    def constrain(x):
        if mesh is None or x is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))

    def d_update(state: TrainState, key: jax.Array):
        k_data, k_z, k_lab = jax.random.split(key, 3)
        x_real, labels_r = data_fn(k_data, batch)
        x_real = constrain(x_real)
        z = constrain(bundle.sample_z(k_z, batch))
        labels_f = (bundle.sample_labels(k_lab, batch)
                    if bundle.conditional else None)
        # G in train mode (batch statistics) but its stats only advance in
        # the G update — clean ownership of BN state.
        x_fake, _ = bundle.generate(state.g_vars, z, labels_f, train=True)
        x_fake = jax.lax.stop_gradient(x_fake)

        def loss_fn(d_params):
            d_vars = _with_params(state.d_vars, d_params)
            lr_real, upd, r1 = _real_pass(bundle, d_vars, x_real, labels_r,
                                          cfg.r1_gamma)
            d_vars2 = _merge_stats(d_vars, upd)
            lr_fake, upd2 = bundle.discriminate(d_vars2, x_fake, labels_f,
                                                train=True)
            loss = nonsaturating_d_loss(lr_real, lr_fake)
            if r1 is not None:
                loss = loss + 0.5 * cfg.r1_gamma * r1
            return loss, (upd2, lr_real, lr_fake, r1)

        (loss, (upd, lr_real, lr_fake, r1)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.d_vars["params"])
        updates, d_opt = d_tx.update(grads, state.d_opt,
                                     state.d_vars["params"])
        d_params = optax.apply_updates(state.d_vars["params"], updates)
        d_vars = _merge_stats(_with_params(state.d_vars, d_params), upd)
        state = state.replace(d_vars=d_vars, d_opt=d_opt)
        metrics = {"d_loss": loss,
                   "d_real": jnp.mean(lr_real),
                   "d_fake": jnp.mean(lr_fake)}
        if r1 is not None:
            metrics["r1"] = r1
        return state, metrics

    def g_update(state: TrainState, key: jax.Array):
        k_z, k_lab = jax.random.split(key)
        z = constrain(bundle.sample_z(k_z, batch))
        labels = (bundle.sample_labels(k_lab, batch)
                  if bundle.conditional else None)

        def loss_fn(g_params):
            g_vars = _with_params(state.g_vars, g_params)
            x_fake, upd = bundle.generate(g_vars, z, labels, train=True)
            # D in train mode (batch statistics — running stats are not yet
            # meaningful early in training) but its stat updates discarded.
            logits, _ = bundle.discriminate(state.d_vars, x_fake, labels,
                                            train=True)
            return nonsaturating_g_loss(logits), upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.g_vars["params"])
        updates, g_opt = g_tx.update(grads, state.g_opt,
                                     state.g_vars["params"])
        g_params = optax.apply_updates(state.g_vars["params"], updates)
        g_vars = _merge_stats(_with_params(state.g_vars, g_params), upd)
        state = state.replace(g_vars=g_vars, g_opt=g_opt)
        return state, {"g_loss": loss}

    def fused_update(state: TrainState, key: jax.Array):
        """FusedProp (arXiv:2004.03335): one G-fwd + one D-fwd on the fake
        batch serve BOTH parameter updates — jax.vjp's pullbacks are
        re-applied with the D-loss and G-loss cotangents:

            d softplus(l)/dl  =  sigmoid(l)      (D's fake term)
            d softplus(-l)/dl = -sigmoid(-l)     (G's non-saturating loss)

        Cost: Gf + Df(fake) + Df(real)+Db(real) + 2*Db(fake) + Gb versus the
        alternating trainer's 2*Gf + 3*Df + 2*Db + Gb — one full G forward
        and one D forward cheaper per (D,G) update pair, with
        simultaneous-update semantics (same z for both losses).
        """
        k_data, k_z, k_lab = jax.random.split(key, 3)
        x_real, labels_r = data_fn(k_data, batch)
        x_real = constrain(x_real)
        z = constrain(bundle.sample_z(k_z, batch))
        labels_f = (bundle.sample_labels(k_lab, batch)
                    if bundle.conditional else None)

        def g_fwd(g_params):
            g_vars = _with_params(state.g_vars, g_params)
            x, upd = bundle.generate(g_vars, z, labels_f, train=True)
            return x, upd

        x_fake, g_pull, g_upd = jax.vjp(g_fwd, state.g_vars["params"],
                                        has_aux=True)

        def d_real_loss(d_params):
            d_vars = _with_params(state.d_vars, d_params)
            lr, upd, r1 = _real_pass(bundle, d_vars, x_real, labels_r,
                                     cfg.r1_gamma)
            loss = jnp.mean(jax.nn.softplus(-lr))
            if r1 is not None:
                loss = loss + 0.5 * cfg.r1_gamma * r1
            return loss, (upd, lr, r1)

        (loss_real, (d_upd_r, lr, r1)), d_grads_real = jax.value_and_grad(
            d_real_loss, has_aux=True)(state.d_vars["params"])

        # Fake pass runs on the post-real-pass BN stats so the running
        # averages thread real-then-fake exactly as d_update's loss_fn does
        # (the fake-pass stat update below subsumes the real-pass one).
        d_vars_r = _merge_stats(state.d_vars, d_upd_r)

        def d_fwd(d_params, x):
            d_vars = _with_params(d_vars_r, d_params)
            logits, upd = bundle.discriminate(d_vars, x, labels_f,
                                              train=True)
            return logits, upd

        lf, d_pull, d_upd = jax.vjp(d_fwd, state.d_vars["params"], x_fake,
                                    has_aux=True)

        inv_b = 1.0 / lf.shape[0]
        cot_d = jax.nn.sigmoid(lf) * inv_b  # d mean softplus(lf) / d lf
        cot_g = -jax.nn.sigmoid(-lf) * inv_b  # d mean softplus(-lf) / d lf

        d_grads_fake, _ = d_pull(cot_d)  # x_fake cotangent unused: the D
        # update must not flow into G (the naive trainer's stop_gradient)
        _, dx = d_pull(cot_g)
        (g_grads,) = g_pull(dx)

        d_grads = jax.tree.map(jnp.add, d_grads_real, d_grads_fake)

        updates, d_opt = d_tx.update(d_grads, state.d_opt,
                                     state.d_vars["params"])
        d_params = optax.apply_updates(state.d_vars["params"], updates)
        updates, g_opt = g_tx.update(g_grads, state.g_opt,
                                     state.g_vars["params"])
        g_params = optax.apply_updates(state.g_vars["params"], updates)

        state = state.replace(
            d_vars=_merge_stats(_with_params(state.d_vars, d_params), d_upd),
            g_vars=_merge_stats(_with_params(state.g_vars, g_params), g_upd),
            d_opt=d_opt, g_opt=g_opt)
        d_loss = loss_real + jnp.mean(jax.nn.softplus(lf))
        metrics = {"d_loss": d_loss,
                   "g_loss": jnp.mean(jax.nn.softplus(-lf)),
                   "d_real": jnp.mean(lr), "d_fake": jnp.mean(lf)}
        if r1 is not None:
            metrics["r1"] = r1
        return state, metrics

    def train_step(state: TrainState, _):
        if getattr(cfg, "fused_prop", False):
            state, metrics = fused_update(
                state, step_key(base_key, state.step, "data"))
            return _update_ema(state.replace(step=state.step + 1)), metrics
        metrics = {}
        for i in range(cfg.d_steps):
            state, m = d_update(
                state, step_key(base_key, state.step * cfg.d_steps + i,
                                "data"))
            metrics.update(m)
        for i in range(cfg.g_steps):
            state, m = g_update(
                state, step_key(base_key, state.step * cfg.g_steps + i, "z"))
            metrics.update(m)
        state = state.replace(step=state.step + 1)
        return _update_ema(state), metrics

    def _update_ema(state: TrainState) -> TrainState:
        if state.g_ema is None:  # structural — static at trace time
            return state
        d_max = getattr(cfg, "g_ema_decay", 0.0)
        # Decay warmup (TF1 ExponentialMovingAverage num_updates= schedule):
        # min(d, (1+t)/(10+t)). Without it a short run keeps d_max^t of the
        # random init in the average — measured FID 34 vs 0.89 at MNIST
        # it1000 with a flat 0.999 (runs/mnist_ema/).
        t = jnp.asarray(state.step, jnp.float32)
        d = jnp.minimum(d_max, (1.0 + t) / (10.0 + t))
        ema = jax.tree.map(
            lambda e, p: (d * e + (1.0 - d) * p).astype(e.dtype),
            state.g_ema, state.g_vars["params"])
        return state.replace(g_ema=ema)

    # Donating the state lets XLA update params/opt-state in place (no
    # copy of the full model state per chunk). Callers use the returned
    # state and never touch the donated input again (linear state threading).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk(state: TrainState):
        state, ms = jax.lax.scan(train_step, state, None, length=n_steps)
        return state, jax.tree.map(lambda a: a.mean(0), ms)

    return chunk
