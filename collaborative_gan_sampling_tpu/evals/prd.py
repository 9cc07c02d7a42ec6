"""Improved precision & recall for generative models (k-NN manifold).

Complements FID (a single summary statistic) with the two-sided coverage
diagnostic of Kynkaanniemi et al. 2019 ("Improved Precision and Recall
Metric for Assessing Generative Models", arXiv:1904.06991):

* precision — fraction of generated samples lying inside the *real* data
  manifold (within the distance of each real point's k-th nearest real
  neighbour): "are the samples realistic?"
* recall — fraction of real samples lying inside the *generated* manifold:
  "is the distribution covered?" (mode dropping shows up here, exactly the
  failure collaborative sampling targets).

This is the image-space analogue of the 2D %HQ / mode-KL pair the paper
uses (SURVEY.md C13): %HQ is a precision proxy, mode coverage a recall
proxy. DRS rejection should raise precision; shaping + refinement should
raise (or hold) recall at higher precision.

TPU-native implementation: the all-pairs distance matrix is one
``a @ b.T`` matmul plus row/column norms (MXU), the k-th NN radius one
``lax.top_k`` — no loops, no host round-trips; O(N*M) memory, fine for the
4-10k-sample pools the eval configs use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, D), (M, D) -> (N, M) squared euclidean distances (f32 matmul)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    d = a2 + b2.T - 2.0 * (a @ b.T)
    return jnp.maximum(d, 0.0)


def knn_radii(feats: jax.Array, k: int = 3) -> jax.Array:
    """Squared distance of each point to its k-th nearest *other* point."""
    d = _sq_dists(feats, feats)
    n = feats.shape[0]
    d = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d)  # exclude self
    # k-th smallest = -(k-th largest of -d)
    neg_topk, _ = jax.lax.top_k(-d, k)
    return -neg_topk[:, k - 1]


def manifold_membership(queries: jax.Array, support: jax.Array,
                        radii: jax.Array) -> jax.Array:
    """For each query, is it within some support point's k-NN radius?"""
    d = _sq_dists(queries, support)  # (Q, S)
    return jnp.any(d <= radii[None, :], axis=1)


def precision_recall(real_feats: jax.Array, fake_feats: jax.Array,
                     k: int = 3) -> dict[str, jax.Array]:
    """Improved precision/recall over feature spaces (arXiv:1904.06991).

    Returns {'precision', 'recall'} in [0, 1]. Use the same feature network
    as FID for comparability.

    Both pools must exceed k points: with n <= k the k-th-NN radius is the
    +inf-masked self-distance, every query trivially "belongs" to the
    manifold, and precision/recall silently read 1.0 for a nearly-empty
    pool — an error, not a score.
    """
    if real_feats.shape[0] <= k or fake_feats.shape[0] <= k:
        raise ValueError(
            f"precision_recall needs > k={k} points per pool, got "
            f"{real_feats.shape[0]} real / {fake_feats.shape[0]} fake "
            "(k-NN radii are undefined; guard tiny accepted pools upstream)")
    r_real = knn_radii(real_feats, k)
    r_fake = knn_radii(fake_feats, k)
    precision = jnp.mean(
        manifold_membership(fake_feats, real_feats, r_real)
        .astype(jnp.float32))
    recall = jnp.mean(
        manifold_membership(real_feats, fake_feats, r_fake)
        .astype(jnp.float32))
    return {"precision": precision, "recall": recall}
