"""FID evaluation (C13) — fully on-device moments + Frechet distance.

Reference pipeline (``fid.py`` per experiment dir, approximate path —
SURVEY.md C13 / call stack 3.4): batched Inception pool3 activations via
``sess.run`` per batch, host-side (mu, Sigma) with numpy, Frechet distance
with ``scipy.linalg.sqrtm`` on the host, compared against precomputed real
stats from an npz.

TPU-native design:
* feature extraction is a jitted ``lax.scan`` over batches (G sampling and
  the feature net fused in one program for the fake branch);
* (mu, Sigma) accumulate on device in float32 via sum / outer-product sums
  (one (F,N)x(N,F) matmul per batch on the MXU);
* the Frechet distance runs on device with a Newton-Schulz matrix sqrt
  (ops/sqrtm.py) — no scipy, no host sync;
* real-data stats can be computed once and cached (the npz pattern),
  see ``compute_dataset_stats`` / ``FIDStats``.

Under a data-parallel Mesh the batch axis of the feature pass shards over
devices and XLA all-reduces the moment sums over ICI (SURVEY.md C18/C19).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from collaborative_gan_sampling_tpu.ops.sqrtm import (
    trace_sqrtm_product,
    trace_sqrtm_product_eigh,
)


class FIDStats(NamedTuple):
    mu: jax.Array  # (F,)
    sigma: jax.Array  # (F, F)
    n: jax.Array  # scalar float32


def stats_from_features(feats: jax.Array) -> FIDStats:
    """Exact (mu, Sigma) of a (N, F) feature matrix (unbiased covariance)."""
    n = feats.shape[0]
    mu = jnp.mean(feats, axis=0)
    centered = feats - mu
    sigma = (centered.T @ centered) / (n - 1)
    return FIDStats(mu=mu, sigma=sigma, n=jnp.float32(n))


def streaming_stats(feature_fn: Callable, batch_fn: Callable,
                    num_batches: int, batch_size: int,
                    key: jax.Array) -> FIDStats:
    """Accumulate (mu, Sigma) over `num_batches` batches on device.

    `batch_fn(key, n) -> x` produces images in [-1, 1]; `feature_fn(x) ->
    (n, F)`. The whole loop is one jitted scan: O(F^2) accumulator state,
    never materialises the (N, F) feature matrix.

    Numerics: uses Chan's parallel mean/covariance merge (per-batch centered
    scatter + mean-delta correction), NOT the one-pass sum/sum-of-squares
    formula — that one catastrophically cancels in float32 for features with
    large means (e.g. relu classifier features), inflating the FID noise
    floor by orders of magnitude.
    """
    # Shape-only discovery of the feature dim: eval_shape traces without
    # compiling or running anything (a real batch-1 call would execute a
    # full sampler + feature-net forward just to read one integer).
    feat_dim = jax.eval_shape(
        lambda k: feature_fn(batch_fn(k, 1)), key).shape[-1]

    def body(carry, i):
        n_a, mu_a, m2_a = carry
        x = batch_fn(jax.random.fold_in(key, i), batch_size)
        f = feature_fn(x)
        n_b = jnp.float32(f.shape[0])
        mu_b = jnp.mean(f, axis=0)
        fc = f - mu_b
        m2_b = fc.T @ fc  # centered scatter of this batch (stable)
        delta = mu_b - mu_a
        n = n_a + n_b
        mu = mu_a + delta * (n_b / n)
        m2 = m2_a + m2_b + jnp.outer(delta, delta) * (n_a * n_b / n)
        return (n, mu, m2), None

    init = (jnp.float32(0.0), jnp.zeros((feat_dim,), jnp.float32),
            jnp.zeros((feat_dim, feat_dim), jnp.float32))
    (n, mu, m2), _ = jax.lax.scan(body, init, jnp.arange(num_batches))
    return FIDStats(mu=mu, sigma=m2 / (n - 1.0), n=n)


def frechet_distance(a: FIDStats, b: FIDStats,
                     newton_schulz_iters: int = 0) -> jax.Array:
    """FID = ||mu_a - mu_b||^2 + Tr(Sa + Sb - 2 (Sa Sb)^(1/2)), on device.

    newton_schulz_iters == 0 (default) selects the eigh-based cross term —
    exact and robust for rank-deficient covariances (small accepted pools);
    > 0 selects the all-matmul Newton-Schulz path (fastest on the MXU,
    requires well-conditioned covariances).
    """
    diff = a.mu - b.mu
    if newton_schulz_iters > 0:
        tr_cross = trace_sqrtm_product(a.sigma, b.sigma, newton_schulz_iters)
    else:
        tr_cross = trace_sqrtm_product_eigh(a.sigma, b.sigma)
    return (jnp.dot(diff, diff) + jnp.trace(a.sigma) + jnp.trace(b.sigma)
            - 2.0 * tr_cross)


def frechet_distance_host(a: FIDStats, b: FIDStats) -> float:
    """Float64 host-side Frechet distance (numpy eigh).

    The on-device float32 path cannot resolve FID values that are ~1e-5 of
    the covariance trace (classifier features easily reach that regime —
    the f32 eigenvalue error floor exceeds the statistic). mu/Sigma are a
    few hundred KB, evaluation is not a hot loop, and f64 on host is exact
    to ~1e-12, so the *final distance* defaults to this path
    (pipeline.Experiment). The device implementation remains for in-graph
    uses (e.g. FID-as-objective, arXiv:2009.14075-style backprop, where the
    gradient only needs f32).
    """
    import numpy as np

    mu_a = np.asarray(jax.device_get(a.mu), np.float64)
    mu_b = np.asarray(jax.device_get(b.mu), np.float64)
    s_a = np.asarray(jax.device_get(a.sigma), np.float64)
    s_b = np.asarray(jax.device_get(b.sigma), np.float64)
    if not (np.isfinite(mu_a).all() and np.isfinite(mu_b).all()
            and np.isfinite(s_a).all() and np.isfinite(s_b).all()):
        # Divergent samples (e.g. an over-aggressive refinement rate) yield
        # non-finite moments; report inf rather than crashing inside LAPACK.
        return float("inf")

    def psd_sqrt(s):
        s = 0.5 * (s + s.T)
        d, u = np.linalg.eigh(s)
        return (u * np.sqrt(np.maximum(d, 0.0))) @ u.T

    asq = psd_sqrt(s_a)
    m = asq @ s_b @ asq
    ev = np.linalg.eigvalsh(0.5 * (m + m.T))
    tr_cross = np.sum(np.sqrt(np.maximum(ev, 0.0)))
    diff = mu_a - mu_b
    return float(diff @ diff + np.trace(s_a) + np.trace(s_b) - 2 * tr_cross)


def save_stats(path: str, stats: FIDStats, feature_net: str = "") -> None:
    """Persist real-data (mu, Sigma) as an npz (the reference's precomputed-
    stats pattern, SURVEY.md C13 / TTUR fid.py). Keys follow the pytorch-fid
    convention (``mu``, ``sigma``) so files interoperate both ways; the
    feature-net label travels along to catch cross-feature-net reuse."""
    import os

    import numpy as np

    tmp = path + ".tmp"
    np.savez(tmp, mu=np.asarray(stats.mu), sigma=np.asarray(stats.sigma),
             n=np.asarray(stats.n), feature_net=np.asarray(feature_net))
    # np.savez appends .npz to paths without it
    os.replace(tmp if tmp.endswith(".npz") else tmp + ".npz", path)


def load_stats(path: str) -> tuple[FIDStats, str]:
    """FIDStats from an npz written by save_stats OR by pytorch-fid/TTUR
    tooling (``mu``/``sigma``, with ``mean``/``cov`` accepted as aliases).
    Returns (stats, feature_net_label) — label "" when the file carries
    none (foreign files: the caller cannot verify the feature net; use
    stats computed under the same feature model only)."""
    import numpy as np

    with np.load(path, allow_pickle=False) as z:
        keys = set(z.files)
        mu_key = "mu" if "mu" in keys else "mean" if "mean" in keys else None
        sig_key = ("sigma" if "sigma" in keys
                   else "cov" if "cov" in keys else None)
        if mu_key is None or sig_key is None:
            raise ValueError(
                f"{path}: not a FID-stats npz — expected keys mu/sigma "
                f"(or mean/cov), found {sorted(keys)}")
        mu = jnp.asarray(z[mu_key], jnp.float32)
        sigma = jnp.asarray(z[sig_key], jnp.float32)
        n = jnp.float32(z["n"]) if "n" in keys else jnp.float32(0.0)
        label = str(z["feature_net"]) if "feature_net" in keys else ""
    if mu.ndim != 1 or sigma.shape != (mu.shape[0], mu.shape[0]):
        raise ValueError(
            f"{path}: inconsistent stats shapes mu={mu.shape}, "
            f"sigma={sigma.shape}")
    return FIDStats(mu=mu, sigma=sigma, n=n), label


def fid_between(feature_fn: Callable, real_fn: Callable, fake_fn: Callable,
                num_samples: int, batch_size: int, key: jax.Array,
                newton_schulz_iters: int = 20) -> jax.Array:
    """End-to-end FID between two samplers, one compiled program each side."""
    num_batches = max(1, num_samples // batch_size)
    k_r, k_f = jax.random.split(key)
    stats_fn = jax.jit(
        lambda fn, k: streaming_stats(feature_fn, fn, num_batches,
                                      batch_size, k),
        static_argnums=0)
    real = stats_fn(real_fn, k_r)
    fake = stats_fn(fake_fn, k_f)
    return jax.jit(frechet_distance, static_argnums=2)(
        real, fake, newton_schulz_iters)


def per_class_fid(feats_real, labels_real, feats_fake, labels_fake,
                  min_count: int = 32, max_classes: int = 0,
                  classes=None) -> dict:
    """Intra-FID for class-conditional models: FID per class, averaged.

    The standard conditional-GAN metric (Miyato & Koyama's projection-D
    paper reports it as "intra FID"): global FID over a mixed pool cannot
    see per-class failures — a generator that swaps two classes'
    distributions scores the same global FID as a correct one. Feature
    extraction happens upstream (device); the per-class (mu, Sigma) +
    host f64 Frechet loop here is O(classes * F^2) numpy work.

    Classes with fewer than ``min_count`` samples on either side are
    skipped (singular covariance). With ``max_classes`` > 0, only that many
    most-frequent classes (in the fake pool) are evaluated — the 1000-class
    cost control. With ``classes``, only that explicit class set is scored
    (the cross-arm intersection protocol — see intersection_intra_fid).
    Returns {"intra_fid", "intra_fid_classes", "per_class": {label: fid}}.
    """
    import numpy as np

    fr = np.asarray(feats_real, np.float64)
    ff = np.asarray(feats_fake, np.float64)
    lr = np.asarray(labels_real).ravel()
    lf = np.asarray(labels_fake).ravel()
    if classes is not None:
        classes = np.asarray(sorted(classes))
    else:
        classes, counts = np.unique(lf, return_counts=True)
        order = np.argsort(-counts)
        classes = classes[order]
        if max_classes > 0:
            classes = classes[:max_classes]

    per = {}
    for c in classes:
        r = fr[lr == c]
        f = ff[lf == c]
        if r.shape[0] < min_count or f.shape[0] < min_count:
            continue
        a = FIDStats(jnp.asarray(r.mean(0)),
                     jnp.asarray(np.cov(r, rowvar=False)),
                     jnp.asarray(float(r.shape[0])))
        b = FIDStats(jnp.asarray(f.mean(0)),
                     jnp.asarray(np.cov(f, rowvar=False)),
                     jnp.asarray(float(f.shape[0])))
        per[int(c)] = frechet_distance_host(a, b)
    if not per:
        return {"intra_fid": float("inf"), "intra_fid_classes": 0,
                "per_class": {}}
    return {"intra_fid": float(np.mean(list(per.values()))),
            "intra_fid_classes": len(per),
            "per_class": per}


def intersection_intra_fid(per_class_tables: dict) -> dict:
    """Re-score several arms' intra-FID over the INTERSECTION of their
    measured classes.

    Arms with rejection (DRS) can starve some classes below min_count,
    dropping them from that arm's mean while they stay in another arm's —
    the means are then averages over different class sets and not directly
    comparable (VERDICT r3 weak item 5: standard measured 1000 classes,
    collab 981, --safe 996). Input: {arm: {class: fid}} (the "per_class"
    maps from per_class_fid; JSON round-trips with string keys are
    accepted). Returns {"classes": N, "intra_fid": {arm: mean-over-common}}.
    """
    norm = {arm: {int(c): float(v) for c, v in table.items()}
            for arm, table in per_class_tables.items()}
    common = set.intersection(*(set(t) for t in norm.values())) if norm \
        else set()
    if not common:
        return {"classes": 0,
                "intra_fid": {arm: float("inf") for arm in norm}}
    import numpy as np

    return {"classes": len(common),
            "intra_fid": {arm: float(np.mean([t[c] for c in sorted(common)]))
                          for arm, t in norm.items()}}
