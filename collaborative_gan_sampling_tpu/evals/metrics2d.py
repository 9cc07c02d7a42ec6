"""2D mixture metrics (C13, synthetic half): %HQ and mode-histogram KL.

Reference behavior (``synthetic/utils.py`` metrics, approximate path —
SURVEY.md C13; definitions from the paper arXiv:1902.00813):

* **%HQ** ("high quality"): fraction of samples within ``hq_std`` standard
  deviations of their nearest mixture mode.
* **KL**: assign every sample to its nearest mode, form the empirical mode
  histogram, and compute KL(empirical || true mixture weights). Low KL means
  mode coverage matches the target — the paper's headline metric on the
  *imbalanced* ring.

Pure jnp, jittable, O(N*M) distance matrix — runs on device for millions of
samples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from collaborative_gan_sampling_tpu.data.synthetic2d import MixtureSpec


def mode_assignments(samples: jax.Array, spec: MixtureSpec
                     ) -> tuple[jax.Array, jax.Array]:
    """(nearest-mode index (N,), distance to it (N,))."""
    d2 = jnp.sum((samples[:, None, :] - spec.means[None, :, :]) ** 2, axis=-1)
    idx = jnp.argmin(d2, axis=1)
    dist = jnp.sqrt(jnp.take_along_axis(d2, idx[:, None], axis=1))[:, 0]
    return idx, dist


def metrics_2d(samples: jax.Array, spec: MixtureSpec,
               hq_std: float = 4.0,
               weights: jax.Array | None = None) -> dict[str, jax.Array]:
    """%HQ, KL, modes_covered for a pool of 2D samples.

    `weights` overrides the mask weighting (e.g. pass the accept mask as
    float to evaluate only accepted samples without host compaction).
    """
    n_modes = spec.means.shape[0]
    idx, dist = mode_assignments(samples, spec)
    if weights is None:
        weights = jnp.ones(samples.shape[0], jnp.float32)
    total = jnp.sum(weights) + 1e-12

    hq_mask = (dist < hq_std * spec.std).astype(jnp.float32) * weights
    pct_hq = jnp.sum(hq_mask) / total

    # Mode histogram over HQ samples (off-manifold samples carry no mode
    # evidence); falls back to tiny uniform mass if nothing is HQ.
    counts = jnp.zeros(n_modes, jnp.float32).at[idx].add(hq_mask)
    hist = (counts + 1e-9) / (jnp.sum(counts) + n_modes * 1e-9)
    kl = jnp.sum(hist * (jnp.log(hist) - jnp.log(spec.weights + 1e-12)))

    modes_covered = jnp.sum(
        (counts / (jnp.sum(counts) + 1e-12)) > (0.01 / n_modes))
    return {"pct_hq": pct_hq, "kl": kl,
            "modes_covered": modes_covered.astype(jnp.float32)}
