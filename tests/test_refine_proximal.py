"""DOT-style proximal refinement (refine.proximal — Tanaka NeurIPS 2019,
arXiv:1910.06832): the drift gains + proximal*(x - x0), i.e. descent on
l(D(x)) + (proximal/2)||x - x0||^2 anchored to the initial sample."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.config import ModelConfig, RefineConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.sampling.refine import (
    make_draw_refine_fn,
    make_refine_fn,
    refine_samples,
)


class _LinearD:
    """D(x) = <c, x>: closed-form drift for hand-checked updates."""

    conditional = False
    z_dim = 2

    def __init__(self, c):
        self.c = jnp.asarray(c, jnp.float32)

    def sample_z(self, key, n):
        return jax.random.normal(key, (n, 2))

    def generate(self, g_vars, z, labels=None, train=False):
        return z

    def discriminate(self, d_vars, x, labels=None, train=False):
        return x @ self.c


def test_proximal_matches_hand_computed_updates():
    """Two steps of kl-objective (loss = -d) proximal refinement against
    the hand recursion x' = x - rate*(-c + p*(x - x0))."""
    c = jnp.asarray([1.0, -2.0], jnp.float32)
    bundle = _LinearD(c)
    x0 = jnp.asarray([[0.5, 1.0], [-1.0, 0.25]], jnp.float32)
    rate, p = 0.1, 2.0
    cfg = RefineConfig(steps=2, rate=rate, objective="kl", proximal=p,
                       use_pallas=False, use_s2d=False)
    refine = make_refine_fn(bundle, cfg)
    x_k, aux = jax.jit(lambda x: refine({}, x))(x0)

    x = x0
    for _ in range(2):
        x = x - rate * (-c + p * (x - x0))
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x), rtol=1e-6)


def test_proximal_bounds_displacement_monotonically():
    """Stronger proximity cost => refined samples stay closer to x0 (and
    p -> 0 recovers the unguarded refinement exactly)."""
    mcfg = ModelConfig(kind="mlp", z_dim=4, g_hidden=32, d_hidden=32,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    _, d_vars = bundle.init(jax.random.PRNGKey(0))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (128, 2))

    def disp(p):
        cfg = RefineConfig(steps=20, rate=0.1, proximal=p, use_pallas=False)
        x_k, _ = refine_samples(bundle, d_vars, x0, cfg)
        return float(jnp.mean(jnp.sum((x_k - x0) ** 2, axis=1)))

    d0, d1, d10 = disp(0.0), disp(1.0), disp(10.0)
    assert d0 > d1 > d10 > 0.0

    cfg0 = RefineConfig(steps=20, rate=0.1, proximal=0.0, use_pallas=False)
    base, _ = refine_samples(bundle, d_vars, x0, cfg0)
    again, _ = refine_samples(
        bundle, d_vars, x0, dataclasses.replace(cfg0, proximal=0.0))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(again))


def test_proximal_fixed_point_of_linear_drift():
    """With loss = -<c, x>, the proximal objective's stationary point is
    x* = x0 + c/p; many small steps converge to it."""
    c = jnp.asarray([2.0, -1.0], jnp.float32)
    bundle = _LinearD(c)
    x0 = jnp.zeros((4, 2), jnp.float32)
    p = 4.0
    cfg = RefineConfig(steps=400, rate=0.05, objective="kl", proximal=p,
                       use_pallas=False, use_s2d=False)
    refine = make_refine_fn(bundle, cfg)
    x_k, _ = jax.jit(lambda x: refine({}, x))(x0)
    np.testing.assert_allclose(np.asarray(x_k),
                               np.asarray(x0 + c / p)[None][0],
                               rtol=1e-4, atol=1e-5)


def test_s2d_parity_with_proximal():
    """The s2d fast path must stay bit-compatible (to fp tolerance) with
    the oracle scan when the proximal term is on."""
    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    _, d_vars = bundle.init(jax.random.PRNGKey(0))
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 1),
                            minval=-1.0, maxval=1.0)
    kw = dict(steps=4, rate=0.05, proximal=0.7, use_pallas=False)
    fast = make_refine_fn(bundle, RefineConfig(use_s2d=True, **kw))
    oracle = make_refine_fn(bundle, RefineConfig(use_s2d=False, **kw))
    xf, af = jax.jit(lambda x: fast(d_vars, x))(x0)
    xo, ao = jax.jit(lambda x: oracle(d_vars, x))(x0)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xo),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(af["logits"]),
                               np.asarray(ao["logits"]),
                               rtol=2e-5, atol=2e-5)


def test_z_space_proximal_anchors_latent():
    mcfg = ModelConfig(kind="mlp", z_dim=4, g_hidden=32, d_hidden=32,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(2)

    def run(p):
        # Keep rate*proximal < 2 (explicit-Euler stability of the anchor
        # term — see the config docstring).
        cfg = RefineConfig(steps=20, rate=0.2, space="z", proximal=p,
                           use_pallas=False)
        dr = make_draw_refine_fn(bundle, cfg)
        x, _, logits = jax.jit(lambda: dr(g_vars, d_vars, key, 64))()
        return np.asarray(x)

    # Same PRNG stream => same z0/x0 draw; the anchored run must stay
    # closer to the unrefined G output than the unanchored one.
    cfg0 = RefineConfig(steps=0, rate=0.0, space="z", use_pallas=False)
    x_base, _, _ = jax.jit(
        lambda: make_draw_refine_fn(bundle, cfg0)(g_vars, d_vars, key, 64))()
    x_base = np.asarray(x_base)
    d_free = np.mean(np.sum((run(0.0) - x_base) ** 2, axis=1))
    d_anch = np.mean(np.sum((run(5.0) - x_base) ** 2, axis=1))
    assert d_anch < d_free


def test_tuner_prox_axis():
    from tests.test_pipeline import _tiny_image_cfg  # noqa: F401  (fixture helper)
    import dataclasses as dc

    from collaborative_gan_sampling_tpu.pipeline import Experiment

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        cfg = _tiny_image_cfg(td + "/prox")
        exp = Experiment(cfg, echo_metrics=False)
        state = exp.train()
        best, table = exp.select_hparams(
            state, ks=[2], rates=[0.05], method="refinement",
            proxs=[0.0, 1.0])
        assert len(best) == 3 and best[2] in (0.0, 1.0)
        assert set(table) == {(2, 0.05, 0.0), (2, 0.05, 1.0)}


@pytest.mark.parametrize("knob", ["stop", "prox"])
def test_guards_compose_with_collab(knob):
    """Both overshoot guards run through the full collab path."""
    from collaborative_gan_sampling_tpu.data import (
        make_mixture,
        sample_mixture,
    )
    from collaborative_gan_sampling_tpu.sampling import sample

    mcfg = ModelConfig(kind="mlp", z_dim=4, g_hidden=16, d_hidden=16,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    spec = make_mixture("ring8", std=0.1)
    data_fn = lambda key, n: (sample_mixture(key, spec, n), None)  # noqa: E731
    kw = {"stop_score": 0.5} if knob == "stop" else {"proximal": 1.0}
    cfg = RefineConfig(steps=3, rate=0.1, num_batches=2, batch_size=32,
                       burn_in=64, use_pallas=False, **kw)
    res = sample(bundle, g_vars, d_vars, cfg, jax.random.PRNGKey(1),
                 method="collab", data_fn=data_fn)
    assert np.isfinite(np.asarray(res.samples)).all()
