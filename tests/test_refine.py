import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.config import ModelConfig, RefineConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.sampling.refine import (
    make_refine_fn,
    refine_loss_per_sample,
)


class QuadraticD:
    """Stub bundle with analytic D(x) = -a * ||x - c||^2.

    Refinement loss l(x) = softplus(-D(x)) = softplus(a ||x - c||^2),
    so grad_x l = sigmoid(a ||x-c||^2) * 2a (x - c) — hand-derivable.
    """

    conditional = False

    def discriminate(self, d_vars, x, labels=None, train=False):
        return -d_vars["a"] * jnp.sum((x - d_vars["c"]) ** 2, axis=-1)


def _hand_step(x, a, c, lam):
    u = a * np.sum((x - c) ** 2, axis=-1, keepdims=True)
    sig = 1.0 / (1.0 + np.exp(-u))
    return x - lam * sig * 2 * a * (x - c)


def test_refine_single_step_matches_hand_gradient():
    bundle = QuadraticD()
    d_vars = {"a": jnp.float32(0.5), "c": jnp.array([1.0, -2.0])}
    cfg = RefineConfig(steps=1, rate=0.1, clip_norm=0.0)
    refine = make_refine_fn(bundle, cfg)
    x0 = jnp.array([[3.0, 0.0], [-1.0, -1.0], [0.5, 0.5]])
    x1, aux = jax.jit(refine)(d_vars, x0)
    expected = _hand_step(np.asarray(x0), 0.5, np.array([1.0, -2.0]), 0.1)
    np.testing.assert_allclose(np.asarray(x1), expected, rtol=1e-5)


def test_refine_k_steps_matches_iterated_hand_steps():
    bundle = QuadraticD()
    d_vars = {"a": jnp.float32(0.5), "c": jnp.array([0.0, 0.0])}
    cfg = RefineConfig(steps=7, rate=0.2)
    refine = make_refine_fn(bundle, cfg)
    x0 = jnp.array([[2.0, 1.0]])
    xk, _ = jax.jit(refine)(d_vars, x0)
    x = np.asarray(x0)
    for _ in range(7):
        x = _hand_step(x, 0.5, np.zeros(2), 0.2)
    np.testing.assert_allclose(np.asarray(xk), x, rtol=1e-5)


def test_refine_moves_toward_high_d_region():
    bundle = QuadraticD()
    c = jnp.array([1.0, -2.0])
    d_vars = {"a": jnp.float32(1.0), "c": c}
    cfg = RefineConfig(steps=50, rate=0.1)
    refine = make_refine_fn(bundle, cfg)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (32, 2)) * 3
    xk, aux = jax.jit(refine)(d_vars, x0)
    d0 = np.linalg.norm(np.asarray(x0 - c), axis=1)
    dk = np.linalg.norm(np.asarray(xk - c), axis=1)
    assert (dk < d0).all()
    # Final logits reported by aux match a direct D call.
    np.testing.assert_allclose(
        np.asarray(aux["logits"]),
        np.asarray(bundle.discriminate(d_vars, xk)), rtol=1e-6)


def test_refine_gradient_clipping_bounds_step_size():
    bundle = QuadraticD()
    d_vars = {"a": jnp.float32(100.0), "c": jnp.zeros(2)}  # huge gradients
    cfg = RefineConfig(steps=1, rate=1.0, clip_norm=0.5)
    refine = make_refine_fn(bundle, cfg)
    x0 = jnp.array([[10.0, 0.0]])
    x1, _ = jax.jit(refine)(d_vars, x0)
    # ||x1 - x0|| <= rate * clip_norm
    assert float(jnp.linalg.norm(x1 - x0)) <= 0.5 + 1e-5


def test_refine_trajectory_shape_and_endpoints():
    bundle = QuadraticD()
    d_vars = {"a": jnp.float32(0.5), "c": jnp.zeros(2)}
    cfg = RefineConfig(steps=5, rate=0.1)
    refine = make_refine_fn(bundle, cfg, return_trajectory=True)
    x0 = jnp.ones((3, 2))
    xk, aux = jax.jit(refine)(d_vars, x0)
    assert aux["traj"].shape == (6, 3, 2)
    np.testing.assert_allclose(np.asarray(aux["traj"][0]), np.asarray(x0))
    np.testing.assert_allclose(np.asarray(aux["traj"][-1]), np.asarray(xk))


def test_refine_per_sample_independence_real_mlp():
    """With the real MLP D: refining a batch == refining samples alone."""
    cfg_m = ModelConfig(kind="mlp", compute_dtype="float32")
    bundle = make_bundle(cfg_m)
    _, d_vars = bundle.init(jax.random.PRNGKey(0))
    cfg = RefineConfig(steps=5, rate=0.05)
    refine = jax.jit(make_refine_fn(bundle, cfg))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    x_batch, _ = refine(d_vars, x0)
    x_single, _ = refine(d_vars, x0[3:4])
    np.testing.assert_allclose(np.asarray(x_batch[3:4]),
                               np.asarray(x_single), rtol=2e-4, atol=1e-5)


def test_refine_loss_formula():
    logits = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(refine_loss_per_sample(logits)),
        np.log1p(np.exp(-np.asarray(logits))), rtol=1e-6)


def test_traced_rate_matches_baked_rate():
    """The tuner's compile-once-per-K path: passing rate as a traced scalar
    must reproduce the baked-constant program bit-for-bit (same math, same
    dtype discipline) — on both the oracle scan and the s2d fast path."""
    import dataclasses

    import jax.numpy as jnp

    from collaborative_gan_sampling_tpu.config import ModelConfig
    from collaborative_gan_sampling_tpu.models import make_bundle

    for use_s2d in (False, True):
        cfg_a = RefineConfig(steps=3, rate=0.05, use_pallas=False,
                             use_s2d=use_s2d)
        # The dynamic call's cfg carries a DIFFERENT baked rate: the traced
        # scalar must win.
        cfg_b = dataclasses.replace(cfg_a, rate=0.9)
        bundle = make_bundle(ModelConfig(kind="dcgan", z_dim=8,
                                         image_size=16, channels=1,
                                         g_base_filters=8, d_base_filters=8,
                                         compute_dtype="float32"))
        g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
        x0 = bundle.generate(g_vars, bundle.sample_z(jax.random.PRNGKey(1),
                                                     8))
        x_static, aux_s = jax.jit(make_refine_fn(bundle, cfg_a))(d_vars, x0)
        dyn = jax.jit(lambda d, x, r: make_refine_fn(bundle, cfg_b)(
            d, x, rate=r))
        x_dyn, aux_d = dyn(d_vars, x0, jnp.float32(0.05))
        np.testing.assert_allclose(np.asarray(x_dyn), np.asarray(x_static),
                                   atol=0, rtol=0)
        np.testing.assert_allclose(np.asarray(aux_d["logits"]),
                                   np.asarray(aux_s["logits"]),
                                   atol=0, rtol=0)
