"""Refinement engine (C4) — the reference's core IP, rebuilt as one fused scan.

Reference behavior (``synthetic/sampler.py`` + mirrors, approximate paths —
SURVEY.md C4 / section 3.2): K-step gradient ascent of *samples* in data
space along dD/dx,

    x_{k+1} = x_k - lambda * grad_x softplus(-D(x_k))
            = x_k + lambda * sigmoid(-D(x_k)) * grad_x D(x_k),

i.e. descent on the non-saturating generator loss evaluated at the sample.
K is the reference's "rollout steps" flag, lambda its "rollout rate";
optional per-sample gradient-norm clipping. In the reference this is a host
Python loop doing one ``sess.run(grad_op)`` per step — 2K host<->device
round-trips per batch (SURVEY.md section 3.2, "the hot loop is the product").

TPU-native design: the whole K-step loop is ONE ``lax.scan`` inside the
caller's jit. x stays device-resident across all K steps; memory is O(1) in K
(only the current x is live) unless a trajectory is explicitly requested for
visualization. D is applied in eval mode (deterministic, per-sample
decoupled), so grad of the summed loss yields exact per-sample gradients.
For the MLP discriminator there is a hand-fused Pallas kernel fast path
(ops/refine_pallas.py) with this scan as its parity oracle.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from collaborative_gan_sampling_tpu.config import RefineConfig
from collaborative_gan_sampling_tpu.models import GANBundle


OBJECTIVES = ("ns", "kl", "saturating")


def refine_loss_per_sample(logits: jax.Array,
                           objective: str = "ns") -> jax.Array:
    """Per-sample refinement objective as a function of the D logit d.

    All three descend toward higher D score but weight samples differently
    (the f-divergence drift families of DGflow, arXiv:2012.00780):

      ns          softplus(-d)   reference default; grad weight sigmoid(-d)
                                 (= the JS-flow drift) — pushes hardest on
                                 low-scored samples
      kl          -d             pure logit ascent, uniform weight; with
                                 RefineConfig.noise > 0 this is the KL
                                 Langevin flow
      saturating  -softplus(d)   descent on log(1 - D); grad weight
                                 sigmoid(d) — pushes hardest on samples D
                                 already likes
    """
    if objective == "ns":
        return jax.nn.softplus(-logits)
    if objective == "kl":
        return -logits
    if objective == "saturating":
        return -jax.nn.softplus(logits)
    raise ValueError(f"unknown refine objective {objective!r}; "
                     f"have {OBJECTIVES}")


def _clip_per_sample(g: jax.Array, max_norm: float) -> jax.Array:
    """Clip each sample's gradient to `max_norm` (L2 over non-batch axes)."""
    axes = tuple(range(1, g.ndim))
    norm = jnp.sqrt(jnp.sum(g * g, axis=axes, keepdims=True) + 1e-12)
    scale = jnp.minimum(1.0, max_norm / norm)
    return g * scale


def _freeze_stopped(x_new: jax.Array, x: jax.Array, logits: jax.Array,
                    stop_score: float) -> jax.Array:
    """Keep x (not x_new) for samples D already scores >= stop_score.

    The mask uses the logits at x (before the update): a sample crossing
    the threshold takes no further steps, bounding the D-score ascent per
    sample instead of per run (see RefineConfig.stop_score)."""
    active = jax.nn.sigmoid(logits) < stop_score
    return jnp.where(active.reshape(active.shape + (1,) * (x.ndim - 1)),
                     x_new, x)


def make_refine_fn(bundle: GANBundle, cfg: RefineConfig,
                   return_trajectory: bool = False) -> Callable:
    """Build `refine(d_vars, x0, labels=None, key=None, rate=None)
    -> (x_K, aux)`.

    aux = {'logits': D(x_K) logits, 'traj': (K+1, B, ...) if requested}.
    Pure and jittable; call inside your own jit/scan (collab.py does).
    ``rate`` may be a traced scalar overriding cfg.rate — the hparam
    tuner's compile-once-per-K path (one program serves every rate); with
    rate=None, cfg.rate is baked as a constant and the fully-static fast
    paths (Pallas MLP kernel) stay eligible.
    """
    steps, clip_norm = cfg.steps, cfg.clip_norm
    noise = getattr(cfg, "noise", 0.0)
    objective = getattr(cfg, "objective", "ns")
    stop_score = getattr(cfg, "stop_score", 0.0)
    proximal = getattr(cfg, "proximal", 0.0)

    def refine(d_vars: Any, x0: jax.Array,
               labels: jax.Array | None = None,
               key: jax.Array | None = None, rate=None):
        # Fused Pallas fast path (MLP D, unconditional, no clipping, no
        # noise, no trajectory): whole K-step loop in one kernel,
        # x VMEM-resident. Needs a STATIC rate (kernel constant).
        if not return_trajectory and noise == 0.0 and rate is None:
            from collaborative_gan_sampling_tpu.ops.refine_pallas import (
                fused_refine_mlp,
                supports_pallas_refine,
            )
            if supports_pallas_refine(bundle, cfg, labels):
                x_k, logits = fused_refine_mlp(d_vars, x0, steps, cfg.rate)
                return x_k, {"logits": logits}
        # Space-to-depth fast path (conv D): same scan math in s2d
        # coordinates, turning the 2-4%-MFU first conv + VJP into dense
        # stride-1 convs (ops/refine_s2d.py; this scan is its oracle).
        from collaborative_gan_sampling_tpu.ops.refine_s2d import (
            make_refine_s2d,
            supports_s2d_refine,
        )
        if supports_s2d_refine(bundle, cfg, return_trajectory, noise):
            return make_refine_s2d(bundle, cfg)(d_vars, x0, labels,
                                                rate=rate)
        return _refine_scan(d_vars, x0, labels, key, rate)

    def _refine_scan(d_vars: Any, x0: jax.Array,
                     labels: jax.Array | None = None,
                     key: jax.Array | None = None, rate=None):
        # Cast to the sample dtype: a traced f32 scalar must not promote
        # bf16 math (the scan carry dtype would change mid-loop).
        rate = jnp.asarray(cfg.rate if rate is None else rate, x0.dtype)
        def loss_sum(x):
            logits = bundle.discriminate(d_vars, x, labels, train=False)
            return jnp.sum(refine_loss_per_sample(logits, objective)), logits

        grad_fn = jax.grad(loss_sum, has_aux=True)
        if noise > 0 and key is None:
            # Deterministic fallback seed from x0 would break independence;
            # derive from a fixed key — callers wanting proper streams pass
            # their own (collab.py does via the round key).
            key = jax.random.PRNGKey(0)

        def step(x, k):
            g, logits = grad_fn(x)
            if proximal > 0:
                # DOT-style transport cost: + grad of (p/2)||x - x0||^2.
                g = g + proximal * (x - x0)
            if clip_norm > 0:
                g = _clip_per_sample(g, clip_norm)
            x_new = x - rate * g
            if noise > 0:
                x_new = x_new + jnp.sqrt(2.0 * rate * noise) * \
                    jax.random.normal(k, x.shape, dtype=x.dtype)
            if stop_score > 0:
                x_new = _freeze_stopped(x_new, x, logits, stop_score)
            return x_new, (x_new if return_trajectory else None)

        xs = (jax.random.split(key, steps) if noise > 0 else None)
        x_k, traj = jax.lax.scan(step, x0, xs, length=steps)
        logits = bundle.discriminate(d_vars, x_k, labels, train=False)
        aux = {"logits": logits}
        if return_trajectory:
            aux["traj"] = jnp.concatenate([x0[None], traj], axis=0)
        return x_k, aux

    return refine


def make_draw_refine_fn(bundle: GANBundle, cfg: RefineConfig, mesh=None):
    """Build `draw_refine(g_vars, d_vars, key, n) -> (x, labels, logits)` —
    the z-draw + G + K-step refinement unit every refinement-family sampler
    runs per batch. With cfg.space == 'z' the K steps drift the latent
    instead (see _make_draw_refine_z). When the x-space s2d fast path
    applies, the WHOLE unit is fused in s2d coordinates (G's output deconv
    emits s2d directly — see ops/refine_s2d.py); otherwise it reproduces
    the historical _draw-then-refine sequence with identical PRNG streams."""
    from collaborative_gan_sampling_tpu.models.dcgan import DCGANGenerator
    from collaborative_gan_sampling_tpu.ops.refine_s2d import (
        make_draw_refine_s2d,
        supports_s2d_refine,
    )
    from collaborative_gan_sampling_tpu.parallel.mesh import constrain_batch

    space = getattr(cfg, "space", "x")
    if space not in ("x", "z"):
        raise ValueError(f"refine.space must be 'x' or 'z', got {space!r}")
    if space == "z":
        return _make_draw_refine_z(bundle, cfg, mesh)
    noise = getattr(cfg, "noise", 0.0)
    if (supports_s2d_refine(bundle, cfg, False, noise)
            and isinstance(getattr(bundle, "g", None), DCGANGenerator)):
        return make_draw_refine_s2d(bundle, cfg, mesh)

    refine = make_refine_fn(bundle, cfg)

    def draw_refine(g_vars: Any, d_vars: Any, key: jax.Array, n: int,
                    labels: jax.Array | None = None, rate=None):
        k_z, k_lab = jax.random.split(key)
        z = constrain_batch(mesh, bundle.sample_z(k_z, n))
        if bundle.conditional and labels is None:
            labels = bundle.sample_labels(k_lab, n)
        x0 = bundle.generate(g_vars, z, labels, train=False)
        x, aux = refine(d_vars, x0, labels, key=jax.random.fold_in(key, 1),
                        rate=rate)
        return x, labels, aux["logits"]

    return draw_refine


def _make_draw_refine_z(bundle: GANBundle, cfg: RefineConfig, mesh=None):
    """Latent-space refinement (DGflow arXiv:2012.00780 section 4.1):

        z_{k+1} = z_k - rate * grad_z l(D(G(z_k)))   (+ Langevin noise),
        emit x = G(z_K),

    with l the same per-sample objective family as x-space refinement.
    Every iterate stays ON the generator's output manifold — the drift
    moves *which* sample G produces rather than pushing pixels off-manifold,
    which is the DGflow recipe for high-dimensional images. One lax.scan;
    each step is a G-forward + D-forward + joint VJP, all XLA-fused; z
    (B, z_dim) is the only carried state, O(1) memory in K."""
    steps, clip_norm = cfg.steps, cfg.clip_norm
    noise = getattr(cfg, "noise", 0.0)
    objective = getattr(cfg, "objective", "ns")
    stop_score = getattr(cfg, "stop_score", 0.0)
    proximal = getattr(cfg, "proximal", 0.0)
    from collaborative_gan_sampling_tpu.parallel.mesh import constrain_batch

    def draw_refine(g_vars: Any, d_vars: Any, key: jax.Array, n: int,
                    labels: jax.Array | None = None, rate=None):
        k_z, k_lab = jax.random.split(key)
        z0 = constrain_batch(mesh, bundle.sample_z(k_z, n))
        # Sample-dtype cast (see _refine_scan): traced scalars must not
        # promote the z carry's dtype.
        rate = jnp.asarray(cfg.rate if rate is None else rate, z0.dtype)
        if bundle.conditional and labels is None:
            labels = bundle.sample_labels(k_lab, n)

        def loss_sum(z):
            x = bundle.generate(g_vars, z, labels, train=False)
            logits = bundle.discriminate(d_vars, x, labels, train=False)
            return jnp.sum(refine_loss_per_sample(logits, objective)), logits

        grad_fn = jax.grad(loss_sum, has_aux=True)

        def step(z, k):
            g, logits = grad_fn(z)
            if proximal > 0:
                g = g + proximal * (z - z0)  # anchor to the drawn latent
            if clip_norm > 0:
                g = _clip_per_sample(g, clip_norm)
            z_new = z - rate * g
            if noise > 0:
                z_new = z_new + jnp.sqrt(2.0 * rate * noise) * \
                    jax.random.normal(k, z.shape, dtype=z.dtype)
            if stop_score > 0:
                z_new = _freeze_stopped(z_new, z, logits, stop_score)
            return z_new, None

        xs = (jax.random.split(jax.random.fold_in(key, 1), steps)
              if noise > 0 else None)
        z_k, _ = jax.lax.scan(step, z0, xs, length=steps)
        x = bundle.generate(g_vars, z_k, labels, train=False)
        logits = bundle.discriminate(d_vars, x, labels, train=False)
        return x, labels, logits

    return draw_refine


def refine_samples(bundle: GANBundle, d_vars: Any, x0: jax.Array,
                   cfg: RefineConfig, labels: jax.Array | None = None,
                   return_trajectory: bool = False):
    """One-shot convenience wrapper (jits internally)."""
    fn = make_refine_fn(bundle, cfg, return_trajectory)
    return jax.jit(fn)(d_vars, x0, labels)
