"""Intra-FID (evals/fid.per_class_fid) — the per-class conditional metric.

The motivating property: a generator that swaps two classes' feature
distributions has near-zero *global* FID over the mixed pool but large
intra-FID, because each class is compared against its own real class.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.evals.fid import (
    FIDStats,
    frechet_distance_host,
    per_class_fid,
)


def _two_class_pools(rng, swap=False, n=400, d=8):
    """Real pool: class 0 ~ N(0, I), class 1 ~ N(3, I). Fake pool matches,
    or swaps the two class-conditionals when swap=True (same mixture)."""
    r0 = rng.normal(size=(n, d))
    r1 = rng.normal(size=(n, d)) + 3.0
    f0 = rng.normal(size=(n, d)) + (3.0 if swap else 0.0)
    f1 = rng.normal(size=(n, d)) + (0.0 if swap else 3.0)
    feats_r = np.concatenate([r0, r1]).astype(np.float32)
    feats_f = np.concatenate([f0, f1]).astype(np.float32)
    labels = np.concatenate([np.zeros(n, np.int32), np.ones(n, np.int32)])
    return feats_r, labels, feats_f, labels.copy()


def _global_fid(fr, ff):
    a = FIDStats(jnp.asarray(fr.mean(0)),
                 jnp.asarray(np.cov(fr, rowvar=False)),
                 jnp.asarray(float(fr.shape[0])))
    b = FIDStats(jnp.asarray(ff.mean(0)),
                 jnp.asarray(np.cov(ff, rowvar=False)),
                 jnp.asarray(float(ff.shape[0])))
    return frechet_distance_host(a, b)


def test_matched_classes_near_zero():
    rng = np.random.default_rng(0)
    fr, lr, ff, lf = _two_class_pools(rng, swap=False)
    res = per_class_fid(fr, lr, ff, lf)
    assert res["intra_fid_classes"] == 2
    assert res["intra_fid"] < 0.5
    assert set(res["per_class"]) == {0, 1}


def test_class_swap_invisible_to_global_fid_visible_to_intra():
    rng = np.random.default_rng(1)
    fr, lr, ff, lf = _two_class_pools(rng, swap=True)
    # Mixed pools are the same mixture -> global FID stays small ...
    assert _global_fid(fr, ff) < 0.5
    # ... but every class is compared against the wrong conditional:
    # squared mean gap alone is d * 3^2 = 72.
    res = per_class_fid(fr, lr, ff, lf)
    assert res["intra_fid"] > 50.0


def test_min_count_skips_starved_classes():
    rng = np.random.default_rng(2)
    fr, lr, ff, lf = _two_class_pools(rng)
    # Starve class 1 on the fake side below min_count.
    keep = np.flatnonzero(lf == 1)[:8]
    sel = np.concatenate([np.flatnonzero(lf == 0), keep])
    res = per_class_fid(fr, lr, ff[sel], lf[sel], min_count=32)
    assert res["intra_fid_classes"] == 1
    assert set(res["per_class"]) == {0}


def test_max_classes_takes_most_frequent():
    rng = np.random.default_rng(3)
    fr, lr, ff, lf = _two_class_pools(rng)
    # Make class 1 the majority in the fake pool, then cap at one class.
    sel = np.concatenate([np.flatnonzero(lf == 0)[:100],
                          np.flatnonzero(lf == 1)])
    res = per_class_fid(fr, lr, ff[sel], lf[sel], max_classes=1)
    assert set(res["per_class"]) == {1}


def test_empty_result_is_inf():
    rng = np.random.default_rng(4)
    fr, lr, ff, lf = _two_class_pools(rng, n=8)
    res = per_class_fid(fr, lr, ff, lf, min_count=32)
    assert res["intra_fid"] == float("inf")
    assert res["intra_fid_classes"] == 0


def test_experiment_reports_intra_fid(tmp_path):
    from tests.test_pipeline import _tiny_image_cfg
    from collaborative_gan_sampling_tpu.pipeline import Experiment

    cfg = _tiny_image_cfg(tmp_path / "intra")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, num_classes=10),
        eval=dataclasses.replace(cfg.eval, intra_fid_classes=4,
                                 intra_fid_min_count=2))
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    m = exp.evaluate(exp.sample(state, method="standard"))
    assert "intra_fid" in m and "intra_fid_classes" in m
    assert m["intra_fid_classes"] >= 1
    assert np.isfinite(m["intra_fid"])


def test_explicit_classes_restricts_scoring():
    rng = np.random.default_rng(7)
    fr, lr, ff, lf = _two_class_pools(rng)
    res = per_class_fid(fr, lr, ff, lf, min_count=16, classes=[1])
    assert set(res["per_class"]) == {1}
    both = per_class_fid(fr, lr, ff, lf, min_count=16)
    assert abs(res["per_class"][1] - both["per_class"][1]) < 1e-9


def test_intersection_intra_fid_common_classes():
    from collaborative_gan_sampling_tpu.evals.fid import (
        intersection_intra_fid,
    )

    tables = {
        "standard": {0: 1.0, 1: 2.0, 2: 9.0},
        # collab starved class 2 below min_count — and JSON round-trips
        # give string keys, which must be accepted.
        "collab": {"0": 2.0, "1": 4.0},
    }
    out = intersection_intra_fid(tables)
    assert out["classes"] == 2
    # standard's mean drops once the class it alone measured is excluded.
    assert abs(out["intra_fid"]["standard"] - 1.5) < 1e-9
    assert abs(out["intra_fid"]["collab"] - 3.0) < 1e-9

    empty = intersection_intra_fid({"a": {0: 1.0}, "b": {1: 1.0}})
    assert empty["classes"] == 0
    assert empty["intra_fid"]["a"] == float("inf")
