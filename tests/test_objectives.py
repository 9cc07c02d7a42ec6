"""Refinement objective variants (RefineConfig.objective — the DGflow-style
f-divergence drift families, arXiv:2012.00780) and per-class DRS calibration
(RefineConfig.per_class_drs) — SURVEY.md C4/C5 extensions."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.config import ModelConfig, RefineConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.sampling.refine import (
    OBJECTIVES,
    make_refine_fn,
    refine_loss_per_sample,
)
from collaborative_gan_sampling_tpu.sampling.rejection import (
    drs_accept_mask,
    drs_acceptance_prob,
    estimate_logit_max_per_class,
)


# ---------------------------------------------------------------------------
# objective formulas
# ---------------------------------------------------------------------------


def test_objective_formulas():
    d = jnp.asarray([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(refine_loss_per_sample(d, "ns"),
                               np.log1p(np.exp(-np.asarray(d))), rtol=1e-6)
    np.testing.assert_allclose(refine_loss_per_sample(d, "kl"),
                               -np.asarray(d), rtol=1e-6)
    np.testing.assert_allclose(refine_loss_per_sample(d, "saturating"),
                               -np.log1p(np.exp(np.asarray(d))), rtol=1e-6)
    with pytest.raises(ValueError):
        refine_loss_per_sample(d, "banana")


class _LinearBundle:
    """Stub bundle with a linear discriminator d(x) = x @ w — the refine
    update has a closed form per objective, letting the scan be pinned
    exactly: x' = x + rate * weight(d) * w with weight = sigmoid(-d) (ns),
    1 (kl), sigmoid(d) (saturating)."""

    conditional = False
    d = None  # defeats both fast-path gates -> scan path

    def __init__(self, w):
        self.w = jnp.asarray(w, jnp.float32)

    def discriminate(self, d_vars, x, labels, train):
        return x @ self.w


@pytest.mark.parametrize("objective", OBJECTIVES)
def test_refine_step_closed_form(objective):
    w = jnp.asarray([0.5, -1.5], jnp.float32)
    bundle = _LinearBundle(w)
    cfg = RefineConfig(steps=1, rate=0.1, objective=objective,
                       use_pallas=False, use_s2d=False)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (16, 2))
    x1, aux = make_refine_fn(bundle, cfg)({}, x0)

    d = np.asarray(x0 @ w)
    weight = {"ns": 1 / (1 + np.exp(d)), "kl": np.ones_like(d),
              "saturating": 1 / (1 + np.exp(-d))}[objective]
    want = np.asarray(x0) + 0.1 * weight[:, None] * np.asarray(w)
    np.testing.assert_allclose(np.asarray(x1), want, rtol=1e-5, atol=1e-6)
    # Every objective ascends the logit.
    assert float(jnp.mean(aux["logits"])) > float(np.mean(d))


@pytest.mark.parametrize("objective", ["kl", "saturating"])
def test_s2d_parity_across_objectives(objective):
    """The s2d fast path is a layout rewrite — it must match the scan oracle
    for every objective, not just the default."""
    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    _, d_vars = bundle.init(jax.random.PRNGKey(0))
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 1),
                            minval=-1.0, maxval=1.0)
    cfg = RefineConfig(steps=3, rate=0.05, objective=objective,
                       use_pallas=False)
    fast, _ = make_refine_fn(bundle, cfg)(d_vars, x0)
    oracle, _ = make_refine_fn(
        bundle, dataclasses.replace(cfg, use_s2d=False))(d_vars, x0)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(oracle),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# per-class DRS calibration
# ---------------------------------------------------------------------------


class _ClassLogitBundle:
    """Conditional stub: d(x, c) = per-class offset + x[:, 0]."""

    conditional = True
    num_classes = 3

    def __init__(self, offsets):
        self.offsets = jnp.asarray(offsets, jnp.float32)

    def discriminate(self, d_vars, x, labels, train):
        return self.offsets[labels] + x[:, 0]


def test_estimate_logit_max_per_class():
    bundle = _ClassLogitBundle([5.0, 0.0, -4.0])

    def sample_fn(key, n):
        k1, k2 = jax.random.split(key)
        x = jax.random.normal(k1, (n, 2)) * 0.1
        labels = jax.random.randint(k2, (n,), 0, 2)  # class 2 never drawn
        return x, labels

    m = estimate_logit_max_per_class(bundle, {}, sample_fn,
                                     jax.random.PRNGKey(0), burn_in=512,
                                     batch_size=128, num_classes=3)
    m = np.asarray(m)
    assert abs(m[0] - 5.0) < 0.5 and abs(m[1] - 0.0) < 0.5
    # Unseen class falls back to the global max, never -inf.
    assert np.isfinite(m[2]) and abs(m[2] - m.max()) < 1e-6


def test_per_class_shift_fold_identity():
    """logits - M with logit_max=0 is exactly drs(logits, M): the shift
    depends only on the difference — the identity the samplers rely on."""
    key = jax.random.PRNGKey(3)
    logits = jax.random.normal(key, (256,)) * 2.0
    m = jnp.float32(4.2)
    a = drs_accept_mask(jax.random.PRNGKey(7), logits, m, 0.1, 1e-6, 0.0)
    b = drs_accept_mask(jax.random.PRNGKey(7), logits - m, jnp.float32(0.0),
                        0.1, 1e-6, 0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_per_class_drs_balances_acceptance():
    """With class-dependent logit scales, global M starves the low-logit
    class; per-class M gives both classes comparable acceptance."""
    key = jax.random.PRNGKey(0)
    l0 = 5.0 + 0.1 * jax.random.normal(key, (512,))  # class 0
    l1 = 0.0 + 0.1 * jax.random.normal(key, (512,))  # class 1
    m_global = jnp.maximum(jnp.max(l0), jnp.max(l1))

    p0g = float(jnp.mean(drs_acceptance_prob(l0, m_global)))
    p1g = float(jnp.mean(drs_acceptance_prob(l1, m_global)))
    assert p1g < 0.05 * p0g  # global calibration starves class 1

    p0c = float(jnp.mean(drs_acceptance_prob(l0 - jnp.max(l0), 0.0)))
    p1c = float(jnp.mean(drs_acceptance_prob(l1 - jnp.max(l1), 0.0)))
    assert 0.5 < p1c / p0c < 2.0  # per-class calibration balances them


@pytest.mark.parametrize("method", ["reject", "collab"])
def test_per_class_drs_end_to_end(method):
    """Wiring smoke on a real conditional DCGAN bundle: per-class DRS
    compiles and runs inside the jitted reject/collab programs."""
    from collaborative_gan_sampling_tpu.sampling.collab import sample

    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8, num_classes=4,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    cfg = RefineConfig(method=method, steps=2, rate=0.05, num_batches=3,
                       batch_size=16, burn_in=32, per_class_drs=True,
                       shape_every=2, use_pallas=False)

    def data_fn(key, n):
        k1, k2 = jax.random.split(key)
        x = jax.random.uniform(k1, (n, 16, 16, 1), minval=-1.0, maxval=1.0)
        return x, jax.random.randint(k2, (n,), 0, 4)

    res = sample(bundle, g_vars, d_vars, cfg, jax.random.PRNGKey(1),
                 method=method, data_fn=data_fn)
    assert res.samples.shape == (48, 16, 16, 1)
    assert res.accepted.shape == (48,)
    assert np.asarray(res.aux["logit_max"]).shape == (4,)
    assert 0.0 < res.accept_rate <= 1.0


# ---------------------------------------------------------------------------
# class-stratified shaping (RefineConfig.shaping_class_weight)
# ---------------------------------------------------------------------------


def test_class_weights_properties():
    from collaborative_gan_sampling_tpu.training.shaping import (
        _class_weights,
    )

    # Balanced batch: exactly all-ones (the weighting is a no-op).
    balanced = jnp.array([0, 1, 2, 0, 1, 2], jnp.int32)
    np.testing.assert_allclose(np.asarray(_class_weights(balanced, 3)),
                               np.ones(6), rtol=1e-6)

    # Skewed batch: per-class totals equal, mean weight 1.
    skewed = jnp.array([0, 0, 0, 1], jnp.int32)
    w = np.asarray(_class_weights(skewed, 4))
    assert w.mean() == pytest.approx(1.0, rel=1e-6)
    assert w[:3].sum() == pytest.approx(w[3], rel=1e-6)  # class totals equal
    assert w[3] > w[0]  # rare class up-weighted


def test_shaping_class_weight_balanced_batch_matches_unweighted():
    """On a class-balanced batch the stratified loss equals the plain
    non-saturating loss exactly — weighting only acts on skewed draws."""
    from collaborative_gan_sampling_tpu.training.shaping import (
        create_shaping_state,
        make_shaping_step,
    )

    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8, num_classes=4,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    _, d_vars = bundle.init(jax.random.PRNGKey(0))
    labels = jnp.tile(jnp.arange(4, dtype=jnp.int32), 4)  # balanced, B=16
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x_real = jax.random.uniform(k1, (16, 16, 16, 1), minval=-1.0, maxval=1.0)
    x_fake = jax.random.uniform(k2, (16, 16, 16, 1), minval=-1.0, maxval=1.0)

    losses = {}
    for cw in (False, True):
        step = make_shaping_step(bundle, lr=1e-3, class_weight=cw)
        st, _ = create_shaping_state(d_vars, 1e-3)
        st, loss = jax.jit(step)(st, x_real, x_fake, labels, labels)
        losses[cw] = float(loss)
    assert losses[True] == pytest.approx(losses[False], rel=1e-6)


def test_shaping_class_weight_end_to_end():
    """shaping_class_weight composes inside the jitted collab scan."""
    from collaborative_gan_sampling_tpu.sampling.collab import sample

    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8, num_classes=4,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    cfg = RefineConfig(method="collab", steps=2, rate=0.05, num_batches=3,
                       batch_size=16, burn_in=32, shape_every=1,
                       shaping_class_weight=True, use_pallas=False)

    def data_fn(key, n):
        k1, k2 = jax.random.split(key)
        x = jax.random.uniform(k1, (n, 16, 16, 1), minval=-1.0, maxval=1.0)
        return x, jax.random.randint(k2, (n,), 0, 4)

    res = sample(bundle, g_vars, d_vars, cfg, jax.random.PRNGKey(1),
                 method="collab", data_fn=data_fn)
    assert int(res.aux["shaping_steps_done"]) == 3
    for leaf in jax.tree_util.tree_leaves(res.aux["shaped_d_vars"]):
        assert bool(jnp.isfinite(leaf).all())
