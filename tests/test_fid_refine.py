"""FID-backprop refinement (sampling/fid_refine.py).

With identity features and Gaussian data the Frechet distance is closed-form,
so gradient descent on it must provably move a shifted batch toward the real
distribution.
"""

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.evals.fid import (
    FIDStats,
    stats_from_features,
)
from collaborative_gan_sampling_tpu.sampling.fid_refine import (
    fid_loss,
    make_fid_refine_fn,
)


def _real_stats(key, n=4096, dim=4):
    feats = jax.random.normal(key, (n, dim))  # N(0, I)
    return stats_from_features(feats)


def test_fid_loss_zero_at_match():
    real = _real_stats(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2048, 4))
    val = float(fid_loss(x, lambda t: t, real, ns_iters=25))
    assert abs(val) < 0.1


def test_fid_refine_moves_shifted_batch_toward_real():
    real = _real_stats(jax.random.PRNGKey(0))
    # Shifted + shrunk batch: mean 3, std 0.5.
    x0 = jax.random.normal(jax.random.PRNGKey(2), (1024, 4)) * 0.5 + 3.0
    refine = jax.jit(make_fid_refine_fn(lambda t: t, real, steps=200,
                                        rate=0.05, ns_iters=25))
    x_k, aux = refine(x0)
    assert float(aux["fid_end"]) < 0.15 * float(aux["fid_start"])
    # Moments actually restored.
    assert abs(float(x_k.mean())) < 0.5
    assert abs(float(x_k.std()) - 1.0) < 0.2
    # FID decreased monotonically-ish along the trajectory.
    traj = np.asarray(aux["fid_trajectory"])
    assert traj[-1] < traj[0]


def test_fid_refine_gradient_is_finite_rank_deficient():
    # batch (32) << feature dim (64): rank-deficient batch covariance.
    real = _real_stats(jax.random.PRNGKey(3), n=512, dim=64)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (32, 64)) + 1.0
    g = jax.grad(lambda x: fid_loss(x, lambda t: t, real))(x0)
    assert np.isfinite(np.asarray(g)).all()
