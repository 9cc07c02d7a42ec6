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


def test_platt_converges_on_large_logit_scale():
    # Overlapping classes at a raw logit spread ~30: the optimal slope is
    # ~1/30, and an unnormalized fixed-step fit (lr=0.1 on raw logits)
    # oscillates instead of converging. The standardized fit is scale-free.
    key = jax.random.PRNGKey(0)
    lr = 30.0 * (0.5 + jax.random.normal(key, (1024,)))
    lf = 30.0 * (-0.5 + jax.random.normal(jax.random.fold_in(key, 1),
                                          (1024,)))
    a, b = fit_platt(lr, lf)
    s_real = np.asarray(calibrated_score(lr, a, b))
    s_fake = np.asarray(calibrated_score(lf, a, b))
    # Calibrated log-loss must beat the identity calibration (a=1, b=0),
    # which saturates and scores ~0/1 confidently-wrong on the overlap.
    def logloss(s, y):
        s = np.clip(s, 1e-7, 1 - 1e-7)
        return -(y * np.log(s) + (1 - y) * np.log(1 - s)).mean()

    cal = 0.5 * (logloss(s_real, 1.0) + logloss(s_fake, 0.0))
    ident = 0.5 * (
        logloss(np.asarray(calibrated_score(lr, 1.0, 0.0)), 1.0)
        + logloss(np.asarray(calibrated_score(lf, 1.0, 0.0)), 0.0))
    assert np.isfinite(cal) and cal < ident
    assert s_real.mean() > 0.6 and s_fake.mean() < 0.4
    assert 0 < float(a) < 0.2  # ~1/30-scale slope, not the raw-scale 1.0


def test_mh_aux_counts_acceptances_per_chain():
    bundle = _ScoreBundle()
    mh = make_mh_sampler(bundle, chain_len=50)
    key = jax.random.PRNGKey(0)
    x0 = bundle.generate({}, bundle.sample_z(key, 128))
    _, aux = jax.jit(
        lambda k, x: mh({}, {}, k, x, None, jnp.float32(1.0),
                        jnp.float32(0.0)))(jax.random.fold_in(key, 1), x0)
    n_acc = np.asarray(aux["n_accepts"])
    assert n_acc.shape == (128,)
    assert (n_acc >= 0).all() and (n_acc <= 50).all()
    np.testing.assert_allclose(n_acc.mean() / 50,
                               float(aux["accept_rate"]), rtol=1e-6)


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
