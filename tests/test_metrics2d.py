import jax.numpy as jnp
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.data import make_mixture
from collaborative_gan_sampling_tpu.evals import metrics_2d, mode_assignments


def test_mode_assignment_exact():
    spec = make_mixture("ring8", radius=2.0, std=0.1)
    # Points exactly at modes 0 and 3.
    x = jnp.stack([spec.means[0], spec.means[3]])
    idx, dist = mode_assignments(x, spec)
    np.testing.assert_array_equal(np.asarray(idx), [0, 3])
    np.testing.assert_allclose(np.asarray(dist), 0.0, atol=1e-6)


def test_pct_hq_constructed():
    spec = make_mixture("ring8", radius=2.0, std=0.1)
    # 3 points at modes (HQ), 1 point at origin (distance 2 = 20 std, not HQ).
    x = jnp.concatenate([spec.means[:3], jnp.zeros((1, 2))])
    m = metrics_2d(x, spec, hq_std=4.0)
    assert float(m["pct_hq"]) == pytest.approx(0.75)


def test_kl_zero_for_weight_matched_samples():
    spec = make_mixture("ring8", radius=2.0, std=0.1)
    # 1000 samples distributed exactly per the (uniform) weights at modes.
    reps = (1000 * np.asarray(spec.weights)).astype(int)
    x = jnp.concatenate([jnp.tile(spec.means[i], (reps[i], 1))
                         for i in range(8)])
    m = metrics_2d(x, spec)
    assert float(m["kl"]) < 1e-3
    assert float(m["modes_covered"]) == 8.0


def test_kl_large_for_single_mode_collapse():
    spec = make_mixture("ring8", radius=2.0, std=0.1)
    x = jnp.tile(spec.means[0], (1000, 1))
    m = metrics_2d(x, spec)
    # KL(delta_0 || uniform8) = log 8 ~ 2.08
    assert float(m["kl"]) == pytest.approx(np.log(8), rel=0.01)
    assert float(m["modes_covered"]) == 1.0


def test_weights_mask_restricts_evaluation():
    spec = make_mixture("ring8", radius=2.0, std=0.1)
    x = jnp.concatenate([spec.means[:4], jnp.zeros((4, 2))])
    w = jnp.array([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)
    m = metrics_2d(x, spec, weights=w)
    assert float(m["pct_hq"]) == pytest.approx(1.0)  # only modes counted


def test_imbalanced_target_kl():
    spec = make_mixture("ring8_imbalanced", radius=2.0, std=0.1)
    # Uniform samples over modes vs imbalanced target -> positive KL.
    x = jnp.concatenate([jnp.tile(spec.means[i], (100, 1)) for i in range(8)])
    m = metrics_2d(x, spec)
    w = np.asarray(spec.weights)
    expected = float(np.sum((1 / 8) * (np.log(1 / 8) - np.log(w))))
    assert float(m["kl"]) == pytest.approx(expected, rel=0.02)
