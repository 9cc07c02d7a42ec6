"""Latent-space refinement (refine.space='z', DGflow arXiv:2012.00780
section 4.1) — hand-gradient parity on an analytic G/D pair, logit
improvement on a real MLP bundle, and end-to-end collab integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.config import ModelConfig, RefineConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.sampling.refine import make_draw_refine_fn


class LinearGQuadD:
    """Analytic stub: G(z) = W z + b, D(x) = -a ||x - c||^2.

    l(z) = softplus(-D(G(z))) = softplus(a ||Wz + b - c||^2), so
    grad_z l = sigmoid(a||r||^2) * 2a * W^T r with r = Wz + b - c.
    """

    conditional = False

    def __init__(self, W, b):
        self.W, self.b = jnp.asarray(W), jnp.asarray(b)

    def sample_z(self, key, n):
        return jax.random.normal(key, (n, self.W.shape[1]))

    def generate(self, g_vars, z, labels=None, train=False):
        return z @ self.W.T + self.b

    def discriminate(self, d_vars, x, labels=None, train=False):
        return -d_vars["a"] * jnp.sum((x - d_vars["c"]) ** 2, axis=-1)


def _hand_z_step(z, W, b, a, c, lam):
    r = z @ W.T + b - c
    u = a * np.sum(r * r, axis=-1, keepdims=True)
    sig = 1.0 / (1.0 + np.exp(-u))
    return z - lam * sig * 2 * a * (r @ W)


def _setup_stub():
    W = np.array([[1.5, 0.0], [0.5, -1.0]], np.float32)
    b = np.array([0.2, -0.1], np.float32)
    bundle = LinearGQuadD(W, b)
    d_vars = {"a": jnp.float32(0.5), "c": jnp.array([1.0, -2.0])}
    return bundle, d_vars, W, b


def test_z_refine_k_steps_match_hand_gradient():
    bundle, d_vars, W, b = _setup_stub()
    cfg = RefineConfig(steps=5, rate=0.1, space="z")
    draw_refine = make_draw_refine_fn(bundle, cfg)
    key = jax.random.PRNGKey(3)
    x, labels, logits = jax.jit(draw_refine, static_argnums=3)(
        None, d_vars, key, 16)
    assert labels is None

    z = np.asarray(bundle.sample_z(jax.random.split(key)[0], 16))
    for _ in range(5):
        z = _hand_z_step(z, W, b, 0.5, np.array([1.0, -2.0]), 0.1)
    np.testing.assert_allclose(np.asarray(x), z @ W.T + b, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logits),
        -0.5 * np.sum((z @ W.T + b - np.array([1.0, -2.0])) ** 2, -1),
        rtol=1e-4)


def test_z_refine_output_stays_on_g_manifold():
    """The defining property vs x-space: every output is exactly G(z) for
    some z — for a linear G, exactly in G's affine column space."""
    W = np.array([[1.0], [2.0]], np.float32)  # rank-1 manifold in R^2
    b = np.array([0.0, 0.0], np.float32)
    bundle = LinearGQuadD(W, b)
    d_vars = {"a": jnp.float32(1.0), "c": jnp.array([3.0, 1.0])}
    cfg = RefineConfig(steps=20, rate=0.2, space="z")
    x, _, _ = make_draw_refine_fn(bundle, cfg)(
        None, d_vars, jax.random.PRNGKey(0), 32)
    x = np.asarray(x)
    # x must remain proportional to (1, 2) — x-space refinement would
    # leave the line toward c immediately.
    np.testing.assert_allclose(x[:, 1], 2.0 * x[:, 0], rtol=1e-4)


def test_z_refine_improves_logits_real_mlp():
    mcfg = ModelConfig(kind="mlp", z_dim=4, g_hidden=32, d_hidden=32,
                      compute_dtype="float32")
    bundle = make_bundle(mcfg)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))

    def mean_logit(space, steps):
        cfg = RefineConfig(steps=steps, rate=0.05, space=space,
                           objective="kl")
        x, _, logits = make_draw_refine_fn(bundle, cfg)(
            g_vars, d_vars, jax.random.PRNGKey(7), 256)
        return float(jnp.mean(logits))

    base = mean_logit("z", 0)
    assert mean_logit("z", 30) > base + 1e-3


def test_z_space_collab_end_to_end(tmp_path):
    from tests.test_pipeline import _tiny_toy_cfg
    from collaborative_gan_sampling_tpu.pipeline import Experiment

    cfg = _tiny_toy_cfg(tmp_path / "zrun")
    cfg = dataclasses.replace(cfg, refine=dataclasses.replace(
        cfg.refine, space="z"))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    for method in ("refinement", "collab"):
        res = exp.sample(state, method=method)
        m = exp.evaluate(res)
        assert np.isfinite(m["pct_hq"])
        assert res.samples.shape[-1] == 2


def test_space_validation():
    bundle, d_vars, _, _ = _setup_stub()
    cfg = RefineConfig(steps=1, rate=0.1, space="pixel")
    try:
        make_draw_refine_fn(bundle, cfg)
    except ValueError as e:
        assert "space" in str(e)
    else:
        raise AssertionError("bad refine.space accepted")


def test_z_refine_conditional_labels_flow_through():
    """z-space drift with a conditional (label-embedding G, projection D)
    model: labels thread through G and D inside the drift scan, and
    targeted labels are preserved in the output."""
    from collaborative_gan_sampling_tpu.config import (
        ModelConfig,
        RefineConfig,
    )
    from collaborative_gan_sampling_tpu.models import make_bundle
    from collaborative_gan_sampling_tpu.sampling.refine import (
        make_draw_refine_fn,
    )

    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8, num_classes=4,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    cfg = RefineConfig(steps=3, rate=0.05, space="z", use_pallas=False)
    dr = make_draw_refine_fn(bundle, cfg)
    want = jnp.full((16,), 2, jnp.int32)
    x, labels, logits = jax.jit(
        lambda: dr(g_vars, d_vars, jax.random.PRNGKey(1), 16, labels=want))()
    assert x.shape == (16, 16, 16, 1)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(want))
    assert np.isfinite(np.asarray(x)).all()
    assert np.isfinite(np.asarray(logits)).all()
