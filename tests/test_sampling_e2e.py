"""End-to-end sampling strategies on a tiny trained toy GAN (CPU-runnable)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.config import (
    ModelConfig,
    RefineConfig,
    TrainConfig,
)
from collaborative_gan_sampling_tpu.data import make_mixture, sample_mixture
from collaborative_gan_sampling_tpu.evals import metrics_2d
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.sampling import METHODS, sample
from collaborative_gan_sampling_tpu.training import (
    create_train_state,
    make_train_chunk,
)


@pytest.fixture(scope="module")
def trained_toy():
    mcfg = ModelConfig(kind="mlp", z_dim=4, g_hidden=64, d_hidden=64,
                       compute_dtype="float32")
    tcfg = TrainConfig(batch_size=128, steps_per_call=100, d_lr=1e-3,
                       g_lr=1e-3)
    bundle = make_bundle(mcfg)
    spec = make_mixture("ring8_imbalanced", std=0.1)
    data_fn = lambda key, n: (sample_mixture(key, spec, n), None)
    base = jax.random.PRNGKey(0)
    state = create_train_state(bundle, tcfg, base)
    chunk = make_train_chunk(bundle, tcfg, data_fn, base)
    for _ in range(6):  # 600 iters — deliberately imperfect generator
        state, _ = chunk(state)
    return bundle, state, spec, data_fn


RCFG = RefineConfig(steps=10, rate=0.1, num_batches=6, batch_size=128,
                    burn_in=256, mh_chain_len=20, use_pallas=False)


@pytest.mark.parametrize("method", METHODS)
def test_every_method_produces_finite_samples(trained_toy, method):
    bundle, state, spec, data_fn = trained_toy
    res = sample(bundle, state.g_vars, state.d_vars, RCFG,
                 jax.random.PRNGKey(1), method=method, data_fn=data_fn)
    n = RCFG.num_batches * RCFG.batch_size
    assert res.samples.shape == (n, 2)
    assert res.logits.shape == (n,)
    assert res.accepted.shape == (n,)
    assert np.isfinite(np.asarray(res.samples)).all()
    if method in ("standard", "refinement"):
        assert res.accept_rate == 1.0
    elif method == "mhgan":
        # Real-data-initialized chains that never accept a G proposal are
        # rejected (they still hold training data); most chains accept.
        assert 0.5 < res.accept_rate <= 1.0
        never = float(res.aux["mh_never_accepted"])
        assert abs((1.0 - never) - res.accept_rate) < 1e-6
    else:
        assert 0.05 < res.accept_rate < 0.95  # DRS-style selectivity


def test_collab_without_shaping_reduces_to_refine_reject(trained_toy):
    """shape_every=0 must disable BOTH shaping and the EMA logit-max
    recalibration: D is static, so collab's DRS calibration has to equal
    refine+reject's burn-in M (the shaping-on/off ablation would otherwise
    be confounded by a laxer acceptance threshold)."""
    from collaborative_gan_sampling_tpu.sampling.collab import (
        sample_refine_reject,
    )

    bundle, state, spec, data_fn = trained_toy
    rcfg = dataclasses.replace(RCFG, shape_every=0)
    key = jax.random.PRNGKey(7)
    collab = sample(bundle, state.g_vars, state.d_vars, rcfg, key,
                    method="collab", data_fn=data_fn)
    rr = sample_refine_reject(bundle, state.g_vars, state.d_vars, rcfg, key,
                              data_fn=data_fn)
    np.testing.assert_allclose(np.asarray(collab.aux["logit_max"]),
                               np.asarray(rr.aux["logit_max"]), rtol=1e-6)
    # D untouched.
    jax.tree.map(np.testing.assert_array_equal,
                 collab.aux["shaped_d_vars"], state.d_vars)
    assert int(collab.aux["shaping_steps_done"]) == 0


def test_collab_shaping_steps_zero_means_zero_updates(trained_toy):
    bundle, state, spec, data_fn = trained_toy
    rcfg = dataclasses.replace(RCFG, shape_every=1, shaping_steps=0)
    res = sample(bundle, state.g_vars, state.d_vars, rcfg,
                 jax.random.PRNGKey(8), method="collab", data_fn=data_fn)
    assert int(res.aux["shaping_steps_done"]) == 0
    jax.tree.map(np.testing.assert_array_equal,
                 res.aux["shaped_d_vars"], state.d_vars)


def test_refinement_improves_hq(trained_toy):
    bundle, state, spec, data_fn = trained_toy
    key = jax.random.PRNGKey(2)
    std = sample(bundle, state.g_vars, state.d_vars, RCFG, key,
                 method="standard", data_fn=data_fn)
    ref = sample(bundle, state.g_vars, state.d_vars, RCFG, key,
                 method="refinement", data_fn=data_fn)
    m_std = metrics_2d(std.samples, spec)
    m_ref = metrics_2d(ref.samples, spec)
    # Strict: refinement must actually improve %HQ at this imperfect
    # checkpoint (the 5-seed study in runs/toy_seed_robustness.json shows a
    # ~6-10 point margin; 2 points is far outside seed noise).
    assert float(m_ref["pct_hq"]) >= float(m_std["pct_hq"]) + 0.02


def test_collab_beats_standard(trained_toy):
    """The paper's scientific claim as an executable assertion
    (SURVEY.md section 4): collab improves %HQ and KL over standard."""
    bundle, state, spec, data_fn = trained_toy
    key = jax.random.PRNGKey(3)
    rcfg = dataclasses.replace(RCFG, num_batches=12)
    std = sample(bundle, state.g_vars, state.d_vars, rcfg, key,
                 method="standard", data_fn=data_fn)
    col = sample(bundle, state.g_vars, state.d_vars, rcfg, key,
                 method="collab", data_fn=data_fn)
    m_std = metrics_2d(std.samples, spec)
    m_col = metrics_2d(col.samples, spec,
                       weights=col.accepted.astype(jnp.float32))
    assert float(m_col["pct_hq"]) > float(m_std["pct_hq"])
    assert float(m_col["kl"]) < float(m_std["kl"])


def test_collab_returns_shaped_discriminator(trained_toy):
    bundle, state, spec, data_fn = trained_toy
    res = sample(bundle, state.g_vars, state.d_vars, RCFG,
                 jax.random.PRNGKey(4), method="collab", data_fn=data_fn)
    shaped = res.aux["shaped_d_vars"]
    before = jax.tree_util.tree_leaves(state.d_vars["params"])
    after = jax.tree_util.tree_leaves(shaped["params"])
    assert any(not np.allclose(a, b) for a, b in zip(before, after))
    assert int(res.aux["shaping_steps_done"]) == RCFG.num_batches


def test_accepted_samples_compaction(trained_toy):
    bundle, state, spec, data_fn = trained_toy
    res = sample(bundle, state.g_vars, state.d_vars, RCFG,
                 jax.random.PRNGKey(5), method="reject", data_fn=data_fn)
    acc = res.accepted_samples()
    assert acc.shape[0] == int(np.asarray(res.accepted).sum())
    assert acc.shape[1:] == (2,)


def test_sampling_deterministic_given_key(trained_toy):
    bundle, state, spec, data_fn = trained_toy
    r1 = sample(bundle, state.g_vars, state.d_vars, RCFG,
                jax.random.PRNGKey(6), method="refinement", data_fn=data_fn)
    r2 = sample(bundle, state.g_vars, state.d_vars, RCFG,
                jax.random.PRNGKey(6), method="refinement", data_fn=data_fn)
    np.testing.assert_array_equal(np.asarray(r1.samples),
                                  np.asarray(r2.samples))


def test_collab_shaping_steps_config(trained_toy):
    """refine.shaping_steps D updates happen per shaping event (the config
    field is wired, not silently ignored — round-1 advisor finding)."""
    bundle, state, spec, data_fn = trained_toy
    rcfg = dataclasses.replace(RCFG, shaping_steps=3)
    res = sample(bundle, state.g_vars, state.d_vars, rcfg,
                 jax.random.PRNGKey(7), method="collab", data_fn=data_fn)
    assert int(res.aux["shaping_steps_done"]) == 3 * RCFG.num_batches


def test_collab_shaping_target_stops_updates(trained_toy):
    """'Shape until target': with an unreachably high separation target the
    update is skipped every round (step counter stays 0) while sampling
    still completes; with target off, every round shapes."""
    bundle, state, spec, data_fn = trained_toy
    rcfg = dataclasses.replace(RCFG, shaping_target=1e9)
    res = sample(bundle, state.g_vars, state.d_vars, rcfg,
                 jax.random.PRNGKey(8), method="collab", data_fn=data_fn)
    assert int(res.aux["shaping_steps_done"]) == 0
    before = jax.tree_util.tree_leaves(state.d_vars["params"])
    after = jax.tree_util.tree_leaves(res.aux["shaped_d_vars"]["params"])
    assert all(np.allclose(a, b) for a, b in zip(before, after))


def test_collab_shaping_decay_shrinks_updates(trained_toy):
    """shaping_decay < 1: later shaping updates move D less than a no-decay
    run's (exponential lr schedule is wired through optax)."""
    bundle, state, spec, data_fn = trained_toy

    def total_update(decay):
        rcfg = dataclasses.replace(RCFG, shaping_decay=decay, num_batches=8)
        res = sample(bundle, state.g_vars, state.d_vars, rcfg,
                     jax.random.PRNGKey(9), method="collab", data_fn=data_fn)
        shaped = res.aux["shaped_d_vars"]["params"]
        base = state.d_vars["params"]
        return sum(float(jnp.sum(jnp.abs(a - b)))
                   for a, b in zip(jax.tree_util.tree_leaves(shaped),
                                   jax.tree_util.tree_leaves(base)))

    assert total_update(0.5) < total_update(1.0)


def test_collab_class_balanced_shaping_wiring():
    """Conditional collab: shaping real batches are drawn with the refined
    batch's labels when a cond_data_fn is supplied (class-balanced shaping),
    and fall back to random draws when disabled."""
    from collaborative_gan_sampling_tpu.data import load_image_dataset
    from collaborative_gan_sampling_tpu.config import DataConfig

    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8, num_classes=4,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    ds = load_image_dataset(DataConfig(dataset="mnist"), image_size=16,
                            procedural_n=64)

    def data_fn(key, n):
        x, labs = ds.batch(key, n)
        return x, labs % 4

    seen = []

    def cond_fn(key, labels):
        seen.append(True)
        x, labs = ds.batch_by_labels(key, labels)
        return x, labs

    rcfg = RefineConfig(steps=2, rate=0.05, num_batches=2, batch_size=16,
                        burn_in=16, use_pallas=False)
    res = sample(bundle, g_vars, d_vars, rcfg, jax.random.PRNGKey(1),
                 method="collab", data_fn=data_fn, cond_data_fn=cond_fn)
    assert seen, "cond_data_fn was not used for shaping"
    assert np.isfinite(np.asarray(res.samples)).all()

    seen.clear()
    rcfg_off = dataclasses.replace(rcfg, class_balanced_shaping=False)
    sample(bundle, g_vars, d_vars, rcfg_off, jax.random.PRNGKey(1),
           method="collab", data_fn=data_fn, cond_data_fn=cond_fn)
    assert not seen


def _tiny_conditional():
    from collaborative_gan_sampling_tpu.config import DataConfig
    from collaborative_gan_sampling_tpu.data import load_image_dataset

    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8, num_classes=4,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    ds = load_image_dataset(DataConfig(dataset="mnist"), image_size=16,
                            procedural_n=64)

    def data_fn(key, n):
        x, labs = ds.batch(key, n)
        return x, labs % 4

    return bundle, g_vars, d_vars, data_fn


def test_shaping_freeze_embed_keeps_projection_rows():
    """shaping_freeze_embed: the projection discriminator's class-embedding
    params are untouched by collab shaping while the trunk still moves
    (the many-class mitigation — BASELINE.md ImageNet-64 boundary)."""
    bundle, g_vars, d_vars, data_fn = _tiny_conditional()
    rcfg = RefineConfig(steps=2, rate=0.05, num_batches=3, batch_size=16,
                        burn_in=16, use_pallas=False,
                        shaping_freeze_embed=True)
    res = sample(bundle, g_vars, d_vars, rcfg, jax.random.PRNGKey(2),
                 method="collab", data_fn=data_fn)
    shaped = res.aux["shaped_d_vars"]["params"]
    assert int(res.aux["shaping_steps_done"]) > 0
    np.testing.assert_array_equal(
        np.asarray(shaped["proj_embed"]["embedding"]),
        np.asarray(d_vars["params"]["proj_embed"]["embedding"]))
    assert not np.allclose(np.asarray(shaped["conv0"]["kernel"]),
                           np.asarray(d_vars["params"]["conv0"]["kernel"]))

    # Default (freeze off): the embedding rows do move.
    rcfg_off = dataclasses.replace(rcfg, shaping_freeze_embed=False)
    res2 = sample(bundle, g_vars, d_vars, rcfg_off, jax.random.PRNGKey(2),
                  method="collab", data_fn=data_fn)
    shaped2 = res2.aux["shaped_d_vars"]["params"]
    assert not np.allclose(
        np.asarray(shaped2["proj_embed"]["embedding"]),
        np.asarray(d_vars["params"]["proj_embed"]["embedding"]))


def test_shaping_anchor_limits_drift(trained_toy):
    """shaping_anchor (L2-SP trust region): a strong anchor keeps the shaped
    D closer to the restored D than an unanchored run."""
    bundle, state, spec, data_fn = trained_toy

    def drift(anchor):
        rcfg = dataclasses.replace(RCFG, shaping_anchor=anchor,
                                   num_batches=8)
        res = sample(bundle, state.g_vars, state.d_vars, rcfg,
                     jax.random.PRNGKey(11), method="collab",
                     data_fn=data_fn)
        shaped = res.aux["shaped_d_vars"]["params"]
        base = state.d_vars["params"]
        return sum(float(jnp.sum(jnp.abs(a - b)))
                   for a, b in zip(jax.tree_util.tree_leaves(shaped),
                                   jax.tree_util.tree_leaves(base)))

    assert drift(1e4) < 0.5 * drift(0.0)
