import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.config import ModelConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.sampling.mh import (
    calibrated_score,
    fit_platt,
    make_mh_sampler,
)


def test_platt_recovers_separation():
    key = jax.random.PRNGKey(0)
    # Real logits ~ N(+2, 1), fake ~ N(-2, 1) -> well separated.
    lr = 2.0 + jax.random.normal(key, (512,))
    lf = -2.0 + jax.random.normal(jax.random.fold_in(key, 1), (512,))
    a, b = fit_platt(lr, lf)
    s_real = np.asarray(calibrated_score(lr, a, b))
    s_fake = np.asarray(calibrated_score(lf, a, b))
    assert s_real.mean() > 0.8
    assert s_fake.mean() < 0.2


def test_platt_handles_inverted_scores():
    key = jax.random.PRNGKey(0)
    lr = -2.0 + jax.random.normal(key, (512,))  # real scores LOW
    lf = 2.0 + jax.random.normal(jax.random.fold_in(key, 1), (512,))
    a, b = fit_platt(lr, lf, iters=500)
    assert float(a) < 0  # calibration flips the axis
    assert np.asarray(calibrated_score(lr, a, b)).mean() > 0.6


class _ScoreBundle:
    """MH over a 1-mode 'data distribution': D scores distance to origin."""

    conditional = False
    z_dim = 2

    def sample_z(self, key, n):
        return jax.random.normal(key, (n, self.z_dim))

    def generate(self, g_vars, z, labels=None, train=False):
        # proposals spread wide
        return 3.0 * z

    def discriminate(self, d_vars, x, labels=None, train=False):
        return -jnp.sum(x ** 2, axis=-1)  # peak at origin


def test_mh_chain_concentrates_on_high_score_region():
    bundle = _ScoreBundle()
    mh = make_mh_sampler(bundle, chain_len=100)
    key = jax.random.PRNGKey(0)
    x0 = bundle.generate({}, bundle.sample_z(key, 256))
    x_fin, aux = jax.jit(
        lambda k, x: mh({}, {}, k, x, None, jnp.float32(1.0),
                        jnp.float32(0.0)))(jax.random.fold_in(key, 1), x0)
    r0 = np.linalg.norm(np.asarray(x0), axis=1).mean()
    rf = np.linalg.norm(np.asarray(x_fin), axis=1).mean()
    assert rf < r0  # chains drift toward the high-score mode
    assert 0.0 < float(aux["accept_rate"]) <= 1.0


def test_mh_preserves_shapes_with_real_models():
    bundle = make_bundle(ModelConfig(kind="mlp", compute_dtype="float32"))
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    mh = make_mh_sampler(bundle, chain_len=5)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    x_fin, aux = jax.jit(
        lambda: mh(d_vars, g_vars, jax.random.PRNGKey(2), x0, None,
                   jnp.float32(1.0), jnp.float32(0.0)))()
    assert x_fin.shape == (16, 2)
    assert np.isfinite(np.asarray(x_fin)).all()
