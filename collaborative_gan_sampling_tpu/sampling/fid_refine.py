"""FID-backprop sample refinement (arXiv:2009.14075, PAPERS.md).

A capability beyond the reference, built from its own paper set:
instead of following the discriminator's gradient field (C4), refine a batch
of samples by descending the *Frechet distance itself* — the on-device FID
path (streaming moments + Newton-Schulz matrix sqrt, ops/sqrtm.py) is
differentiable end-to-end, so

    x  <-  x - rate * d FID(stats(features(x)), real_stats) / dx

is one jax.grad through feature net -> batch moments -> matrix sqrt. This is
the "Backpropagating through Frechet Inception Distance" recipe with the
framework's feature nets standing in for Inception.

Notes:
* the batch's own (mu, Sigma) enter the loss, so the gradient couples
  samples within the batch — intentionally (it matches batch statistics to
  the real statistics; per-sample decoupling is C4's property, not this
  one's);
* Newton-Schulz (not eigh) is used for the cross term: its unrolled matmul
  iterations differentiate stably, while eigh gradients blow up on the
  near-degenerate eigenvalues batch covariances have;
* a trace-scaled jitter keeps the rank-deficient batch covariance (batch <
  feature dim) inside Newton-Schulz's convergence region.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from collaborative_gan_sampling_tpu.evals.fid import (
    FIDStats,
    stats_from_features,
)
from collaborative_gan_sampling_tpu.ops.sqrtm import trace_sqrtm_product


def fid_loss(x: jax.Array, feature_fn: Callable, real_stats: FIDStats,
             ns_iters: int = 10, eps: float = 1e-3) -> jax.Array:
    """Differentiable Frechet distance between batch stats and real stats."""
    feats = feature_fn(x)
    st = stats_from_features(feats)
    diff = st.mu - real_stats.mu
    tr_cross = trace_sqrtm_product(st.sigma, real_stats.sigma, ns_iters, eps)
    return (jnp.dot(diff, diff) + jnp.trace(st.sigma)
            + jnp.trace(real_stats.sigma) - 2.0 * tr_cross)


def make_fid_refine_fn(feature_fn: Callable, real_stats: FIDStats,
                       steps: int, rate: float, ns_iters: int = 10,
                       clip_norm: float = 1.0) -> Callable:
    """Build `refine(x0) -> (x_K, aux)`: K gradient steps on the batch FID.

    aux = {'fid_start', 'fid_end'} (the differentiable-loss values).
    Pure and jittable.

    ns_iters defaults to 10: Newton-Schulz on the (non-symmetric, nearly
    rank-deficient) covariance product is a CONTRACTION only for its first
    ~10 iterations at f32 on real feature stats — more iterations amplify
    the asymmetric noise modes and the loss/grad blow up. 10 iterations give
    a slightly smoothed FID whose gradient is a fine descent direction.
    Per-sample gradient clipping bounds steps where the linearisation is
    poor.
    """
    val_fn = lambda x: fid_loss(x, feature_fn, real_stats, ns_iters)  # noqa: E731
    grad_fn = jax.value_and_grad(val_fn)

    def refine(x0: jax.Array):
        # Batch moments average over B samples, so dFID/dx_i is O(1/B);
        # scaling by B makes `rate` a per-sample step size comparable to the
        # discriminator-guided refiner's lambda.
        scale = rate * x0.shape[0]

        def step(x, _):
            val, g = grad_fn(x)
            u = scale * g  # per-sample update
            if clip_norm > 0:
                axes = tuple(range(1, u.ndim))
                nrm = jnp.sqrt(jnp.sum(u * u, axis=axes, keepdims=True)
                               + 1e-20)
                u = u * jnp.minimum(1.0, clip_norm / nrm)
            return x - u, val

        x_k, vals = jax.lax.scan(step, x0, None, length=steps)
        # vals[0] is the loss AT x0 (each step emits the value at its input),
        # and the end value needs no gradient — no extra backward passes.
        # steps=0 leaves vals empty; fall back to one value-only call.
        fid_start = vals[0] if steps > 0 else val_fn(x0)
        return x_k, {"fid_start": fid_start, "fid_end": val_fn(x_k),
                     "fid_trajectory": vals}

    return refine
