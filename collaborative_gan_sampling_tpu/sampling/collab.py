"""Sampling-strategy orchestration (C12) — the reference's mode dispatch.

Reference behavior (mode dispatch in ``*/main*.py`` — SURVEY.md C12 /
section 3.2): a trained (G, D) checkpoint is restored and one of five
strategies produces samples:

  standard    raw G(z)
  reject      DRS probabilistic rejection on G(z)            [C5]
  mhgan       Metropolis-Hastings chain over G proposals     [C6]
  refinement  K-step discriminator-guided gradient refinement [C4]
  collab      refine -> accept/reject -> (periodically) shape D [C4+C5+C11]

TPU-native design: each strategy is ONE jitted program; the loop over sample
batches is a ``lax.scan`` (zero host round-trips), accept/reject produces a
static-shape boolean mask (compacted on host at the end — SURVEY.md section 7
hard part 5), and in collab mode the D-shaping update lives *inside* the same
scan, so refine->reject->shape->refine runs as a single XLA program. Under a
Mesh, batches are sharded over the 'data' axis and the shaping gradient is
all-reduced by XLA over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from collaborative_gan_sampling_tpu.config import RefineConfig
from collaborative_gan_sampling_tpu.models import GANBundle
from collaborative_gan_sampling_tpu.parallel.mesh import constrain_batch
from collaborative_gan_sampling_tpu.sampling.mh import (
    fit_platt,
    make_mh_sampler,
)
from collaborative_gan_sampling_tpu.sampling.refine import (
    make_draw_refine_fn,
)
from collaborative_gan_sampling_tpu.sampling.rejection import (
    drs_accept_mask,
    estimate_logit_max,
    estimate_logit_max_per_class,
)

METHODS = ("standard", "reject", "mhgan", "refinement", "collab")


class SampleResult(NamedTuple):
    """Output of any sampling strategy. Static shapes throughout.

    samples:  (N, ...) candidate samples (N = num_batches * batch_size)
    accepted: (N,) bool — which candidates the strategy accepts
    logits:   (N,) final D logits of each candidate
    labels:   (N,) int32 class labels, or None
    aux:      strategy-specific scalars/arrays (accept_rate, shaped d_vars, ...)
    """

    samples: jax.Array
    accepted: jax.Array
    logits: jax.Array
    labels: jax.Array | None
    aux: dict[str, Any]

    def accepted_samples(self) -> jax.Array:
        """Host-side compaction of the accepted set (variable size)."""
        mask = jax.device_get(self.accepted).astype(bool)
        return jax.device_get(self.samples)[mask]

    @property
    def accept_rate(self) -> float:
        return float(jnp.mean(self.accepted.astype(jnp.float32)))


def sample(bundle: GANBundle, g_vars: Any, d_vars: Any, cfg: RefineConfig,
           key: jax.Array, method: str | None = None,
           data_fn: Callable | None = None,
           mesh: Mesh | None = None,
           cond_data_fn: Callable | None = None) -> SampleResult:
    """Run a sampling strategy end-to-end. `data_fn(key, n) -> (x, labels)`
    supplies real data (needed by collab shaping and MH calibration);
    `cond_data_fn(key, labels) -> (x, labels)` optionally supplies
    class-matched real data for collab's class-balanced shaping."""
    method = method or cfg.method
    if method not in METHODS:
        raise ValueError(f"unknown method {method!r}; have {METHODS}")
    if method == "collab":
        return _sample_collab(bundle, g_vars, d_vars, cfg, key, data_fn,
                              mesh, cond_data_fn=cond_data_fn)
    fn = {
        "standard": _sample_standard,
        "reject": _sample_reject,
        "mhgan": _sample_mhgan,
        "refinement": _sample_refinement,
    }[method]
    return fn(bundle, g_vars, d_vars, cfg, key, data_fn, mesh)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _per_class_drs(bundle, cfg) -> bool:
    return bool(getattr(cfg, "per_class_drs", False)) and bundle.conditional


def _draw(bundle, g_vars, key, n, mesh):
    """z -> G(z) with per-batch labels when conditional."""
    k_z, k_lab = jax.random.split(key)
    z = constrain_batch(mesh, bundle.sample_z(k_z, n))
    labels = bundle.sample_labels(k_lab, n) if bundle.conditional else None
    x = bundle.generate(g_vars, z, labels, train=False)
    return x, labels


def _flatten(batched: jax.Array) -> jax.Array:
    """(R, B, ...) -> (R*B, ...)."""
    return batched.reshape((-1,) + batched.shape[2:])


def _scan_batches(body, key, num_batches):
    """Scan `body(key_i, i)` over batch rounds, stacking outputs."""
    def wrapped(carry, i):
        out = body(jax.random.fold_in(key, i), i)
        return carry, out
    _, outs = jax.lax.scan(wrapped, None, jnp.arange(num_batches))
    return outs


# ---------------------------------------------------------------------------
# standard / refinement
# ---------------------------------------------------------------------------


def _sample_standard(bundle, g_vars, d_vars, cfg, key, data_fn, mesh):
    @jax.jit
    def run(g_vars, d_vars, key):
        def body(k, i):
            x, labels = _draw(bundle, g_vars, k, cfg.batch_size, mesh)
            logits = bundle.discriminate(d_vars, x, labels, train=False)
            return (x, logits,
                    labels if labels is not None else jnp.zeros((), jnp.int32))
        return _scan_batches(body, key, cfg.num_batches)

    xs, logits, labels = run(g_vars, d_vars, key)
    samples, logits = _flatten(xs), logits.reshape(-1)
    labels = _flatten(labels) if bundle.conditional else None
    return SampleResult(samples, jnp.ones(samples.shape[0], bool), logits,
                        labels, {})


def _sample_refinement(bundle, g_vars, d_vars, cfg, key, data_fn, mesh):
    draw_refine = make_draw_refine_fn(bundle, cfg, mesh)

    # rate rides as a traced scalar: one compiled program per K serves
    # every rate the tuner sweeps (grid cells differ only in inputs).
    @jax.jit
    def run(g_vars, d_vars, key, rate):
        def body(k, i):
            x, labels, logits = draw_refine(g_vars, d_vars, k,
                                            cfg.batch_size, rate=rate)
            return (x, logits,
                    labels if labels is not None else jnp.zeros((), jnp.int32))
        return _scan_batches(body, key, cfg.num_batches)

    xs, logits, labels = run(g_vars, d_vars, key, jnp.float32(cfg.rate))
    samples, logits = _flatten(xs), logits.reshape(-1)
    labels = _flatten(labels) if bundle.conditional else None
    return SampleResult(samples, jnp.ones(samples.shape[0], bool), logits,
                        labels, {})


# ---------------------------------------------------------------------------
# DRS reject
# ---------------------------------------------------------------------------


def _sample_reject(bundle, g_vars, d_vars, cfg, key, data_fn, mesh,
                   refine_first: bool = False):
    draw_refine = (make_draw_refine_fn(bundle, cfg, mesh) if refine_first
                   else None)
    per_class = _per_class_drs(bundle, cfg)

    @jax.jit
    def run(g_vars, d_vars, key, rate):
        k_burn, k_main = jax.random.split(key)

        def burn_sample(k, n):
            if draw_refine is not None:
                x, labels, _ = draw_refine(g_vars, d_vars, k, n, rate=rate)
            else:
                x, labels = _draw(bundle, g_vars, k, n, mesh)
            return x, labels

        if per_class:
            m = estimate_logit_max_per_class(
                bundle, d_vars, burn_sample, k_burn, cfg.burn_in,
                cfg.batch_size, bundle.num_classes)
        else:
            m = estimate_logit_max(bundle, d_vars, burn_sample, k_burn,
                                   cfg.burn_in, cfg.batch_size)

        def body(k, i):
            k_draw, k_acc = jax.random.split(k)
            if draw_refine is not None:
                x, labels, logits = draw_refine(g_vars, d_vars, k_draw,
                                                cfg.batch_size, rate=rate)
            else:
                x, labels = _draw(bundle, g_vars, k_draw, cfg.batch_size,
                                  mesh)
                logits = bundle.discriminate(d_vars, x, labels, train=False)
            # Per-class M folds into the logits: the DRS shift depends only
            # on logits - M, so logit_max becomes 0 (exact identity).
            eff_logits = logits - m[labels] if per_class else logits
            eff_m = jnp.float32(0.0) if per_class else m
            acc = drs_accept_mask(k_acc, eff_logits, eff_m, cfg.gamma,
                                  cfg.eps_drs, cfg.gamma_percentile,
                                  use_pallas=cfg.use_pallas)
            return (x, logits, acc,
                    labels if labels is not None else jnp.zeros((), jnp.int32))

        xs, logits, acc, labels = _scan_batches(body, k_main, cfg.num_batches)
        return xs, logits, acc, labels, m

    xs, logits, acc, labels, m = run(g_vars, d_vars, key,
                                     jnp.float32(cfg.rate))
    samples = _flatten(xs)
    labels = _flatten(labels) if bundle.conditional else None
    return SampleResult(samples, acc.reshape(-1), logits.reshape(-1), labels,
                        {"logit_max": m})


# ---------------------------------------------------------------------------
# MH-GAN
# ---------------------------------------------------------------------------


def _sample_mhgan(bundle, g_vars, d_vars, cfg, key, data_fn, mesh):
    mh = make_mh_sampler(bundle, cfg.mh_chain_len)

    @jax.jit
    def run(g_vars, d_vars, key):
        k_cal, k_init, k_chain = jax.random.split(key, 3)
        # Platt calibration on held-out real vs fake scores when real data is
        # available; identity calibration otherwise.
        if data_fn is not None:
            k_r, k_f = jax.random.split(k_cal)
            x_real, labels_r = data_fn(k_r, cfg.batch_size)
            lr_real = bundle.discriminate(d_vars, x_real, labels_r,
                                          train=False)
            x_fake, labels_f = _draw(bundle, g_vars, k_f, cfg.batch_size,
                                     mesh)
            lr_fake = bundle.discriminate(d_vars, x_fake, labels_f,
                                          train=False)
            a, b = fit_platt(lr_real, lr_fake)
        else:
            a, b = jnp.float32(1.0), jnp.float32(0.0)

        def body(k, i):
            k_i, k_c = jax.random.split(k)
            # Chain init: real sample when available (Turner et al.'s
            # correctness fallback), else a G sample.
            if data_fn is not None:
                x0, labels = data_fn(k_i, cfg.batch_size)
            else:
                x0, labels = _draw(bundle, g_vars, k_i, cfg.batch_size, mesh)
            x, aux = mh(d_vars, g_vars, k_c, x0, labels, a, b)
            logits = bundle.discriminate(d_vars, x, labels, train=False)
            return (x, logits, aux["n_accepts"],
                    labels if labels is not None else jnp.zeros((), jnp.int32))

        xs, logits, n_accs, labels = _scan_batches(body, k_chain,
                                                   cfg.num_batches)
        return xs, logits, n_accs, labels, a, b

    xs, logits, n_accs, labels, a, b = run(g_vars, d_vars, key)
    samples = _flatten(xs)
    labels = _flatten(labels) if bundle.conditional else None
    # Real-data chain init (Turner et al.): a chain that never accepted any
    # G proposal still holds its REAL initializer — emitting it as a
    # "generated" sample would leak training data into the output pool (and
    # flatter every metric). Mark those chains rejected. G-initialized
    # chains (no data_fn) are generator samples from step 0, so accept-all
    # stays correct there.
    n_accs = n_accs.reshape(-1)
    accepted = (n_accs > 0 if data_fn is not None
                else jnp.ones(samples.shape[0], bool))
    return SampleResult(samples, accepted,
                        logits.reshape(-1), labels,
                        {"mh_accept_rate": jnp.mean(n_accs) / cfg.mh_chain_len,
                         "mh_never_accepted":
                             jnp.mean((n_accs == 0).astype(jnp.float32)),
                         "platt_a": a, "platt_b": b})


# ---------------------------------------------------------------------------
# collab: refine -> reject -> shape, all inside one scan
# ---------------------------------------------------------------------------


def _sample_collab(bundle, g_vars, d_vars, cfg, key, data_fn, mesh,
                   cond_data_fn=None):
    if data_fn is None:
        raise ValueError("collab sampling needs data_fn for D shaping")
    balanced = (cond_data_fn is not None and bundle.conditional
                and getattr(cfg, "class_balanced_shaping", True))
    per_class = _per_class_drs(bundle, cfg)
    from collaborative_gan_sampling_tpu.training.shaping import (
        make_shaping_step,
    )

    draw_refine = make_draw_refine_fn(bundle, cfg, mesh)
    anchor = getattr(cfg, "shaping_anchor", 0.0)
    shape_step = make_shaping_step(
        bundle, cfg.shaping_lr, decay=getattr(cfg, "shaping_decay", 1.0),
        target=getattr(cfg, "shaping_target", 0.0),
        freeze_embed=getattr(cfg, "shaping_freeze_embed", False),
        anchor=anchor,
        class_weight=(getattr(cfg, "shaping_class_weight", False)
                      and bundle.conditional),
        r1_gamma=getattr(cfg, "shaping_r1_gamma", 0.0))
    # Trust-region anchor: the D params we restored with, captured once.
    anchor_params = d_vars["params"] if anchor > 0 else None
    # shape_step.init shares the step's optax transform, so the Adam state
    # structure (which depends on the decay schedule) cannot drift from it.
    shaping_state0 = shape_step.init(d_vars)
    shaping_on = cfg.shape_every > 0

    @jax.jit
    def run(g_vars, shaping_state0, anchor_params, key, rate):
        k_burn, k_main = jax.random.split(key)

        def burn_sample(k, n):
            x, labels, _ = draw_refine(g_vars, shaping_state0.d_vars, k, n,
                                       rate=rate)
            return x, labels

        if per_class:
            m0 = estimate_logit_max_per_class(
                bundle, shaping_state0.d_vars, burn_sample, k_burn,
                cfg.burn_in, cfg.batch_size, bundle.num_classes)
        else:
            m0 = estimate_logit_max(bundle, shaping_state0.d_vars,
                                    burn_sample, k_burn, cfg.burn_in,
                                    cfg.batch_size)

        def body(carry, i):
            shaping_state, m = carry
            k = jax.random.fold_in(k_main, i)
            k_draw, k_acc, k_real, k_shape = jax.random.split(k, 4)

            x, labels, logits = draw_refine(g_vars, shaping_state.d_vars,
                                            k_draw, cfg.batch_size,
                                            rate=rate)
            # D's logit scale drifts while it is being shaped, so a running
            # max over all rounds goes stale (it only grows) and acceptance
            # collapses. Recalibrate with an EMA of the per-round max —
            # batch_size logits give a solid max estimate each round. With
            # shaping disabled (shape_every=0) D is static, so the burn-in M
            # is kept as-is and collab reduces exactly to refine+reject.
            if per_class:
                if shaping_on:
                    # Per-class EMA; classes absent this round keep their M.
                    rm = jnp.full_like(m, -jnp.inf).at[labels].max(logits)
                    seen = jnp.isfinite(rm)
                    m = jnp.where(seen, 0.7 * m + 0.3 * rm, m)
                    m_eff = jnp.where(seen, jnp.maximum(m, rm), m)
                else:
                    m_eff = m
                acc = drs_accept_mask(k_acc, logits - m_eff[labels],
                                      jnp.float32(0.0), cfg.gamma,
                                      cfg.eps_drs, cfg.gamma_percentile,
                                      use_pallas=cfg.use_pallas)
            else:
                if shaping_on:
                    m = 0.7 * m + 0.3 * jnp.max(logits)
                    m_eff = jnp.maximum(m, jnp.max(logits))
                else:
                    m_eff = m
                acc = drs_accept_mask(k_acc, logits, m_eff,
                                      cfg.gamma, cfg.eps_drs,
                                      cfg.gamma_percentile,
                                      use_pallas=cfg.use_pallas)

            if cfg.shape_every > 0:
                def do_shape(st):
                    # cfg.shaping_steps D updates per shaping event (0 =
                    # none), each on a fresh real batch (static unroll
                    # inside the scan body).
                    # Class-balanced shaping (conditional models): draw the
                    # real batch with the SAME labels as the refined fakes,
                    # so the projection D compares within-class — with many
                    # classes a random real batch shares almost no class
                    # with the fakes and shaping destabilises D
                    # (BASELINE.md ImageNet-64 boundary).
                    loss = jnp.float32(0.0)
                    for j in range(cfg.shaping_steps):
                        kj = jax.random.fold_in(k_real, j)
                        if balanced:
                            x_real, labels_r = cond_data_fn(kj, labels)
                        else:
                            x_real, labels_r = data_fn(kj, cfg.batch_size)
                        x_real = constrain_batch(mesh, x_real)
                        st, loss = shape_step(st, x_real, x, labels_r,
                                              labels, anchor_params)
                    return st, loss

                shaping_state, shape_loss = jax.lax.cond(
                    (i % cfg.shape_every) == 0,
                    do_shape,
                    lambda st: (st, jnp.float32(0.0)),
                    shaping_state)
            else:
                shape_loss = jnp.float32(0.0)

            out = (x, logits, acc, shape_loss,
                   labels if labels is not None else jnp.zeros((), jnp.int32))
            return (shaping_state, m), out

        (shaping_state, m), outs = jax.lax.scan(
            body, (shaping_state0, m0), jnp.arange(cfg.num_batches))
        return shaping_state, m, outs

    shaping_state, m, (xs, logits, acc, shape_losses, labels) = run(
        g_vars, shaping_state0, anchor_params, key, jnp.float32(cfg.rate))
    samples = _flatten(xs)
    labels = _flatten(labels) if bundle.conditional else None
    return SampleResult(
        samples, acc.reshape(-1), logits.reshape(-1), labels,
        {"logit_max": m, "shape_losses": shape_losses,
         "shaped_d_vars": shaping_state.d_vars,
         "shaping_steps_done": shaping_state.step})


def sample_refine_reject(bundle, g_vars, d_vars, cfg, key, data_fn=None,
                         mesh=None) -> SampleResult:
    """Refinement followed by DRS rejection but NO shaping (an ablation the
    reference's benchmark matrix includes implicitly)."""
    return _sample_reject(bundle, g_vars, d_vars, cfg, key, data_fn, mesh,
                          refine_first=True)
