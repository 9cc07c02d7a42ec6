"""Kernel Inception Distance (evals/kid.py) against a direct numpy
reference of the unbiased MMD^2 U-statistic, plus distributional sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.evals.kid import (
    kid,
    mmd2_unbiased,
    polynomial_kernel,
)


def _np_mmd2(x, y):
    d = x.shape[1]
    kxx = (x @ x.T / d + 1.0) ** 3
    kyy = (y @ y.T / d + 1.0) ** 3
    kxy = (x @ y.T / d + 1.0) ** 3
    m, n = x.shape[0], y.shape[0]
    sxx = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
    syy = (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
    return sxx + syy - 2.0 * kxy.mean()


def test_mmd2_matches_numpy_reference():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(37, 16)).astype(np.float32)
    y = rng.normal(size=(29, 16)).astype(np.float32) + 0.3
    got = float(mmd2_unbiased(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, _np_mmd2(x, y), rtol=1e-5)


def test_polynomial_kernel_formula():
    x = jnp.asarray([[1.0, 0.0], [0.0, 2.0]])
    k = polynomial_kernel(x, x)
    # k(x0,x0) = (1/2 + 1)^3, k(x0,x1) = (0/2 + 1)^3 = 1
    np.testing.assert_allclose(np.asarray(k),
                               [[3.375, 1.0], [1.0, 27.0]], rtol=1e-6)


def test_same_distribution_near_zero_and_shift_increases():
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    a = jax.random.normal(keys[0], (512, 32))
    b = jax.random.normal(keys[1], (512, 32))
    mean_same, _ = kid(a, b, keys[2], n_subsets=8, subset_size=256)
    mean_near, _ = kid(a, b + 0.2, keys[2], n_subsets=8, subset_size=256)
    mean_far, _ = kid(a, b + 1.0, keys[2], n_subsets=8, subset_size=256)
    # Unbiased: E[KID] = 0 for identical distributions.
    assert abs(float(mean_same)) < 0.05
    assert float(mean_near) > float(mean_same)
    assert float(mean_far) > 5 * float(mean_near)


def test_kid_deterministic_and_jittable():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    a = jax.random.normal(k1, (128, 8))
    b = a + 0.5
    f = jax.jit(lambda a, b, k: kid(a, b, k, n_subsets=4, subset_size=64))
    m1, s1 = f(a, b, k2)
    m2, s2 = f(a, b, k2)
    assert float(m1) == float(m2) and float(s1) == float(s2)
    assert float(s1) >= 0.0


def test_experiment_reports_kid(tmp_path):
    import dataclasses

    from tests.test_pipeline import _tiny_image_cfg
    from collaborative_gan_sampling_tpu.pipeline import Experiment

    cfg = _tiny_image_cfg(tmp_path / "kid")
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, kid_subsets=4, kid_subset_size=64))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    m = exp.evaluate(exp.sample(state, method="standard"))
    assert "kid" in m and "kid_std" in m
    assert np.isfinite(m["kid"]) and m["kid_std"] >= 0.0
