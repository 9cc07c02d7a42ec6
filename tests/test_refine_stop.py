"""Per-sample early-stop refinement (RefineConfig.stop_score): freeze a
sample once sigmoid(D(x)) >= threshold. Bounds the D-score ascent per
sample — the defense against the (K, rate) overshoot failure mode the
quality campaigns measured at well-trained checkpoints (BASELINE.md).

Covers: exact freezing on an analytic D, masked hand-iteration parity,
s2d fast-path parity against the scan oracle, and the z-space path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.config import ModelConfig, RefineConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.ops.refine_s2d import make_refine_s2d
from collaborative_gan_sampling_tpu.sampling.refine import (
    make_draw_refine_fn,
    make_refine_fn,
)


class LinearD:
    """Analytic stub D(x) = w . x — logits cross zero, so sigmoid spans
    both sides of any threshold."""

    conditional = False

    def __init__(self, w):
        self.w = jnp.asarray(w)

    def discriminate(self, d_vars, x, labels=None, train=False):
        return x @ self.w


def _hand_iterate(x, w, lam, steps, stop_score):
    """Masked reference iteration: x <- x + lam * sigmoid(-w.x) * w for
    active samples only (ns objective on a linear D)."""
    x = np.array(x, np.float64)
    for _ in range(steps):
        logit = x @ w
        active = 1.0 / (1.0 + np.exp(-logit)) < stop_score
        g = -(1.0 / (1.0 + np.exp(logit)))[:, None] * w[None, :]
        x = np.where(active[:, None], x - lam * g, x)
    return x


def test_stop_freezes_high_score_samples():
    w = np.array([1.0, -0.5], np.float32)
    bundle = LinearD(w)
    cfg = RefineConfig(steps=5, rate=0.3, stop_score=0.5)
    refine = jax.jit(make_refine_fn(bundle, cfg))
    # Rows 0-1 start with positive logit (sigmoid > 0.5): frozen exactly.
    # Rows 2-3 start negative: they must move (toward higher w.x).
    x0 = jnp.array([[2.0, 0.0], [0.0, -2.0], [-2.0, 0.0], [0.0, 2.0]])
    x_k, aux = refine(None, x0)
    np.testing.assert_array_equal(np.asarray(x_k[:2]), np.asarray(x0[:2]))
    logits0 = np.asarray(x0) @ w
    logits_k = np.asarray(x_k) @ w
    assert (logits_k[2:] > logits0[2:]).all()


def test_stop_matches_masked_hand_iteration():
    w = np.array([0.8, 0.6], np.float32)
    bundle = LinearD(w)
    cfg = RefineConfig(steps=12, rate=0.5, stop_score=0.6)
    refine = jax.jit(make_refine_fn(bundle, cfg))
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (32, 2)) * 2.0
    x_k, _ = refine(None, x0)
    want = _hand_iterate(np.asarray(x0), w, 0.5, 12, 0.6)
    np.testing.assert_allclose(np.asarray(x_k), want, rtol=1e-4, atol=1e-5)


def test_stop_s2d_matches_scan_oracle():
    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    _, d_vars = bundle.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 1),
                           minval=-1.0, maxval=1.0)
    rcfg = RefineConfig(steps=5, rate=0.05, stop_score=0.55,
                        use_pallas=False)
    oracle = jax.jit(make_refine_fn(
        bundle, dataclasses.replace(rcfg, use_s2d=False)))
    x_ref, aux_ref = oracle(d_vars, x)
    fast = jax.jit(make_refine_s2d(bundle, rcfg))
    x_s2d, aux_s2d = fast(d_vars, x)
    # Freezing is a per-sample mask — it commutes with the s2d permutation.
    np.testing.assert_allclose(np.asarray(x_s2d), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_s2d["logits"]),
                               np.asarray(aux_ref["logits"]),
                               rtol=1e-4, atol=1e-4)


class IdentityGLinearD:
    """G(z) = z, D(x) = w . x — the z-space drift reduces to the x-space
    one, so freezing must hold z (and hence the emitted x) fixed."""

    conditional = False

    def __init__(self, w):
        self.w = jnp.asarray(w)

    def sample_z(self, key, n):
        return jax.random.normal(key, (n, self.w.shape[0])) * 2.0

    def generate(self, g_vars, z, labels=None, train=False):
        return z

    def discriminate(self, d_vars, x, labels=None, train=False):
        return x @ self.w


def test_stop_z_space_freezes_and_matches_hand_iteration():
    w = np.array([1.0, -1.0], np.float32)
    bundle = IdentityGLinearD(w)
    cfg = RefineConfig(steps=8, rate=0.4, stop_score=0.5, space="z")
    draw_refine = jax.jit(make_draw_refine_fn(bundle, cfg),
                          static_argnums=3)
    key = jax.random.PRNGKey(2)
    x, labels, logits = draw_refine(None, None, key, 16)
    # Reconstruct z0 from the same PRNG stream the sampler uses.
    k_z, _ = jax.random.split(key)
    z0 = np.asarray(bundle.sample_z(k_z, 16))
    want = _hand_iterate(z0, w, 0.4, 8, 0.5)
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-4, atol=1e-5)
    frozen = 1.0 / (1.0 + np.exp(-(z0 @ w))) >= 0.5
    assert frozen.any() and (~frozen).any()
    np.testing.assert_array_equal(np.asarray(x)[frozen], z0[frozen])


def test_stop_zero_is_reference_path():
    """stop_score=0 must reproduce the unmasked reference refinement."""
    w = np.array([0.7, 0.3], np.float32)
    bundle = LinearD(w)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (16, 2))
    base = jax.jit(make_refine_fn(bundle, RefineConfig(steps=6, rate=0.2)))
    x_base, _ = base(None, x0)
    want = _hand_iterate(np.asarray(x0), w, 0.2, 6, stop_score=np.inf)
    np.testing.assert_allclose(np.asarray(x_base), want, rtol=1e-4,
                               atol=1e-5)
