"""Langevin (DGflow-style) stochastic refinement option (refine.noise)."""

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.config import ModelConfig, RefineConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.sampling.refine import make_refine_fn


def _bundle():
    b = make_bundle(ModelConfig(kind="mlp", compute_dtype="float32"))
    _, d_vars = b.init(jax.random.PRNGKey(0))
    return b, d_vars


def test_noise_zero_matches_deterministic():
    b, d_vars = _bundle()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (32, 2))
    det = jax.jit(make_refine_fn(b, RefineConfig(steps=5, rate=0.1,
                                                 use_pallas=False)))
    stoch0 = jax.jit(make_refine_fn(b, RefineConfig(steps=5, rate=0.1,
                                                    noise=0.0,
                                                    use_pallas=False)))
    xa, _ = det(d_vars, x0)
    xb, _ = stoch0(d_vars, x0, None, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb))


def test_noise_perturbs_but_tracks_gradient():
    b, d_vars = _bundle()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (256, 2))
    fn = jax.jit(make_refine_fn(b, RefineConfig(steps=5, rate=0.1, noise=0.1,
                                                use_pallas=False)))
    x1, _ = fn(d_vars, x0, None, jax.random.PRNGKey(2))
    x2, _ = fn(d_vars, x0, None, jax.random.PRNGKey(3))
    # Different keys -> different trajectories; same key -> identical.
    assert not np.allclose(np.asarray(x1), np.asarray(x2))
    x1b, _ = fn(d_vars, x0, None, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x1b))
    # Noise magnitude sane: mean displacement dominated by drift+noise scale.
    disp = np.linalg.norm(np.asarray(x1 - x0), axis=1).mean()
    assert disp < 5.0


def test_noise_variance_matches_langevin_scale():
    """With a flat D (zero gradient), steps are pure Langevin noise:
    Var(x_K - x_0) = K * 2 * rate * noise per dimension."""

    class FlatD:
        conditional = False

        def discriminate(self, d_vars, x, labels=None, train=False):
            return jnp.zeros(x.shape[0])  # grad = 0 ... softplus'(0) != 0

    # softplus(-0) grad wrt x is 0 since D is constant in x.
    b = FlatD()
    rate, noise, steps = 0.05, 0.2, 8
    fn = jax.jit(make_refine_fn(b, RefineConfig(steps=steps, rate=rate,
                                                noise=noise,
                                                use_pallas=False)))
    x0 = jnp.zeros((4096, 2))
    xk, _ = fn({}, x0, None, jax.random.PRNGKey(0))
    var = float(jnp.var(xk))
    want = steps * 2 * rate * noise
    assert abs(var - want) / want < 0.1
