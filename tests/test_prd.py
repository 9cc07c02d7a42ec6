"""Improved precision/recall (evals/prd.py) on constructed point sets —
the metric must read out realism vs coverage independently."""

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.evals.prd import (
    knn_radii,
    precision_recall,
)


def _cluster(key, center, n=256, std=0.05, dim=8):
    return center + std * jax.random.normal(key, (n, dim))


def test_identical_distributions_score_one():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = _cluster(k1, 0.0)
    b = _cluster(k2, 0.0)
    pr = precision_recall(a, b, k=5)
    assert float(pr["precision"]) > 0.85
    assert float(pr["recall"]) > 0.85


def test_disjoint_distributions_score_zero():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    a = _cluster(k1, 0.0)
    b = _cluster(k2, 100.0)
    pr = precision_recall(a, b)
    assert float(pr["precision"]) < 0.05
    assert float(pr["recall"]) < 0.05


def test_mode_dropping_high_precision_low_recall():
    """Fake covers only one of two real modes: realistic but not covering."""
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    real = jnp.concatenate([_cluster(keys[0], 0.0, n=128),
                            _cluster(keys[1], 50.0, n=128)])
    fake = _cluster(keys[2], 0.0, n=256)
    pr = precision_recall(real, fake)
    assert float(pr["precision"]) > 0.8  # fakes sit on a real mode
    assert 0.3 < float(pr["recall"]) < 0.7  # only half the real manifold
    # Precision must clearly exceed recall: realistic but not covering.
    assert float(pr["precision"]) - float(pr["recall"]) > 0.3


def test_knn_radii_excludes_self():
    x = jnp.asarray([[0.0], [1.0], [3.0]])
    r = knn_radii(x, k=1)
    np.testing.assert_allclose(np.asarray(r), [1.0, 1.0, 4.0], atol=1e-6)


def test_tiny_pool_raises_instead_of_trivial_one():
    """n <= k points: the k-NN radius is the inf-masked self distance and
    precision/recall would silently read 1.0 — must raise instead."""
    import pytest

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    real = _cluster(k1, 0.0, n=64)
    tiny = _cluster(k2, 100.0, n=3)  # disjoint AND tiny
    with pytest.raises(ValueError, match="needs > k"):
        precision_recall(real, tiny, k=3)
    with pytest.raises(ValueError, match="needs > k"):
        precision_recall(tiny, real, k=3)


def test_experiment_prd_guards_empty_accepted_pool(tmp_path):
    """An all-rejected SampleResult must evaluate to zeros/inf, not crash
    with ZeroDivisionError in the batched feature pass."""
    import dataclasses

    from tests.test_pipeline import _tiny_image_cfg
    from collaborative_gan_sampling_tpu.pipeline import Experiment
    from collaborative_gan_sampling_tpu.sampling import SampleResult

    cfg = _tiny_image_cfg(tmp_path / "prd_empty")
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, prd_samples=64, prd_k=3))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    res = exp.sample(state, method="standard")
    rejected = SampleResult(res.samples,
                            jnp.zeros_like(res.accepted), res.logits,
                            res.labels, res.aux)
    m = exp.evaluate(rejected)
    assert m["fid"] == float("inf")
    assert m["precision"] == 0.0 and m["recall"] == 0.0


def test_experiment_reports_prd(tmp_path):
    import dataclasses

    from tests.test_pipeline import _tiny_image_cfg
    from collaborative_gan_sampling_tpu.pipeline import Experiment

    cfg = _tiny_image_cfg(tmp_path / "prd")
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, prd_samples=64, prd_k=3))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    m = exp.evaluate(exp.sample(state, method="standard"))
    assert 0.0 <= m["precision"] <= 1.0
    assert 0.0 <= m["recall"] <= 1.0
