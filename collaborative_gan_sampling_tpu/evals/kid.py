"""Kernel Inception Distance (KID) — MMD^2 with a polynomial kernel.

Binkowski et al., "Demystifying MMD GANs" (arXiv:1801.01401): the kernel
distance KID = MMD^2(feat_real, feat_fake) with k(x, y) = (x.y/d + 1)^3,
reported as mean +/- std over random subsets. Unlike FID it has an unbiased
estimator (no Gaussian assumption, no matrix sqrt) and is meaningful at
small sample counts — the right companion metric for this framework's
classifier/RotNet substitute features, whose FIDs have a measured noise
floor (BASELINE.md).

The reference repo ships only FID (SURVEY.md C13); KID is an addition in
the same spirit as `evals/prd.py`. TPU-native: the estimator is three
matmuls (Gram matrices) + reductions per subset, batched over subsets with
``jax.vmap`` — all MXU work, jittable, O(subset_size^2) memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def polynomial_kernel(x: jax.Array, y: jax.Array, degree: int = 3,
                      coef: float = 1.0) -> jax.Array:
    """k(x, y) = (x.y / d + coef)^degree, the KID paper's default kernel."""
    d = x.shape[-1]
    return (x @ y.T / d + coef) ** degree


def mmd2_unbiased(x: jax.Array, y: jax.Array) -> jax.Array:
    """Unbiased MMD^2 estimator (U-statistic) with the polynomial kernel.

    E[k(x,x')] + E[k(y,y')] - 2 E[k(x,y)] with the diagonal (i=j) terms of
    the within-set Gram matrices excluded (arXiv:1801.01401 eq. 2).
    """
    m = x.shape[0]
    n = y.shape[0]
    kxx = polynomial_kernel(x, x)
    kyy = polynomial_kernel(y, y)
    kxy = polynomial_kernel(x, y)
    sum_xx = (jnp.sum(kxx) - jnp.trace(kxx)) / (m * (m - 1))
    sum_yy = (jnp.sum(kyy) - jnp.trace(kyy)) / (n * (n - 1))
    sum_xy = jnp.mean(kxy)
    return sum_xx + sum_yy - 2.0 * sum_xy


def kid(feats_real: jax.Array, feats_fake: jax.Array, key: jax.Array,
        n_subsets: int = 10, subset_size: int = 1024
        ) -> tuple[jax.Array, jax.Array]:
    """KID mean and std over ``n_subsets`` random subsets.

    Each subset draws ``min(subset_size, n)`` rows without replacement from
    each side (the paper's protocol). Returns float32 scalars; wrap in
    ``jax.jit`` freely — subset count/size are static.
    """
    feats_real = feats_real.astype(jnp.float32)
    feats_fake = feats_fake.astype(jnp.float32)
    s = min(subset_size, feats_real.shape[0], feats_fake.shape[0])

    def one(k):
        kr, kf = jax.random.split(k)
        xi = jax.random.choice(kr, feats_real.shape[0], (s,), replace=False)
        yi = jax.random.choice(kf, feats_fake.shape[0], (s,), replace=False)
        return mmd2_unbiased(feats_real[xi], feats_fake[yi])

    vals = jax.vmap(one)(jax.random.split(key, n_subsets))
    return jnp.mean(vals), jnp.std(vals)
