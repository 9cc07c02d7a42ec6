"""Serving path (sampling/serve.py): compile-once persistent sampler —
round reuse, acceptance semantics, determinism, and the Experiment.generate
/ CLI 'generate' wiring."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.config import ModelConfig, RefineConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.sampling.serve import (
    SERVING_METHODS,
    ServingSampler,
)


def _bundle(num_classes=0):
    mcfg = ModelConfig(kind="mlp", z_dim=4, data_dim=2, g_hidden=16,
                       d_hidden=16, g_layers=2, d_layers=2,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    return bundle, *bundle.init(jax.random.PRNGKey(0))


@pytest.mark.parametrize("method", SERVING_METHODS)
def test_round_shapes_and_accept_semantics(method):
    bundle, g_vars, d_vars = _bundle()
    cfg = RefineConfig(steps=2, rate=0.05, num_batches=3, batch_size=32,
                       burn_in=64, use_pallas=False)
    srv = ServingSampler(bundle, cfg, method=method)
    m = srv.calibrate(g_vars, d_vars, jax.random.PRNGKey(1))
    x, labels, acc, logits = srv.round(g_vars, d_vars, m,
                                       jax.random.PRNGKey(2))
    assert x.shape == (96, 2) and acc.shape == (96,) and logits.shape == (96,)
    assert labels is None
    if method in ("standard", "refinement"):
        assert bool(jnp.all(acc))  # accept-all methods
    else:
        assert 0 < int(acc.sum()) < 96  # DRS actually selects


def test_generate_returns_exactly_n_deterministically():
    bundle, g_vars, d_vars = _bundle()
    cfg = RefineConfig(steps=2, rate=0.05, num_batches=2, batch_size=32,
                       burn_in=64, use_pallas=False)
    srv = ServingSampler(bundle, cfg, method="reject")
    key = jax.random.PRNGKey(3)
    s1, lab1, stats = srv.generate(g_vars, d_vars, key, n=150)
    s2, _, _ = srv.generate(g_vars, d_vars, key, n=150)
    assert s1.shape == (150, 2) and lab1 is None
    np.testing.assert_array_equal(s1, s2)
    assert stats["rounds"] >= 2  # needed multiple compiled rounds
    assert 0 < stats["accept_rate"] < 1
    assert stats["samples_per_sec"] > 0
    # The warm-up/compile round's accepted samples are kept, not discarded.
    assert stats["warmup_samples"] > 0


def test_compact_quantization_rounds_like_denormalize():
    """Served uint8 pixels must match the canonical eval/viz transform
    (jnp.round, not astype truncation): x=0.0 is 128, not 127."""
    from collaborative_gan_sampling_tpu.data.images import denormalize_images

    bundle, g_vars, d_vars = _bundle()
    cfg = RefineConfig(steps=0, rate=0.0, num_batches=1, batch_size=8,
                       burn_in=8, use_pallas=False)
    srv = ServingSampler(bundle, cfg, method="standard")
    compact = srv._build_compact(cap=4, quantize=True)
    x = jnp.stack([jnp.full((2, 2, 1), v) for v in
                   (0.0, -1.0, 1.0, 0.5, -0.25, 0.999)])
    acc = jnp.array([True, True, True, True, False, False])
    x_sel, _, count = compact(x, None, acc)
    assert int(count) == 4
    np.testing.assert_array_equal(np.asarray(x_sel)[:4],
                                  np.asarray(denormalize_images(x[:4])))
    assert int(np.asarray(x_sel)[0, 0, 0, 0]) == 128  # round, not truncate


def test_generate_raises_when_acceptance_starves():
    bundle, g_vars, d_vars = _bundle()
    # gamma so large nothing is ever accepted -> clear, fast error.
    cfg = RefineConfig(steps=0, rate=0.0, num_batches=1, batch_size=16,
                       burn_in=16, gamma=1e6, gamma_percentile=0.0,
                       use_pallas=False)
    srv = ServingSampler(bundle, cfg, method="reject")
    with pytest.raises(RuntimeError, match="accept rate too low"):
        srv.generate(g_vars, d_vars, jax.random.PRNGKey(0), n=32,
                     max_rounds=3)


def test_conditional_serving_with_per_class_drs():
    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8, num_classes=4,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    cfg = RefineConfig(steps=2, rate=0.02, num_batches=2, batch_size=32,
                       burn_in=64, per_class_drs=True, use_pallas=False)
    srv = ServingSampler(bundle, cfg, method="reject")
    m = srv.calibrate(g_vars, d_vars, jax.random.PRNGKey(1))
    assert np.asarray(m).shape == (4,)
    x, labels, acc, _ = srv.round(g_vars, d_vars, m, jax.random.PRNGKey(2))
    assert x.shape == (64, 16, 16, 1) and labels.shape == (64,)
    samples, out_labels, stats = srv.generate(g_vars, d_vars,
                                              jax.random.PRNGKey(3), n=40)
    assert samples.shape == (40, 16, 16, 1) and out_labels.shape == (40,)


def test_targeted_class_serving():
    """class_id serving: every emitted sample carries the requested class,
    refined through the class-conditional G/D pair."""
    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=1,
                       g_base_filters=8, d_base_filters=8, num_classes=4,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(0))
    cfg = RefineConfig(steps=2, rate=0.02, num_batches=2, batch_size=32,
                       burn_in=64, use_pallas=False)
    srv = ServingSampler(bundle, cfg, method="collab", class_id=3)
    samples, labels, stats = srv.generate(g_vars, d_vars,
                                          jax.random.PRNGKey(1), n=40)
    assert samples.shape[0] == 40
    assert np.all(np.asarray(labels) == 3)
    # Targeted samples differ from another class's (conditioning is live).
    srv0 = ServingSampler(bundle, cfg, method="collab", class_id=0)
    s0, _, _ = srv0.generate(g_vars, d_vars, jax.random.PRNGKey(1), n=40)
    assert not np.array_equal(samples, s0)
    with pytest.raises(ValueError, match="out of range"):
        ServingSampler(bundle, cfg, class_id=7)
    with pytest.raises(ValueError, match="conditional"):
        ServingSampler(_bundle()[0], cfg, class_id=0)


def test_serving_rejects_unknown_method():
    bundle, *_ = _bundle()
    with pytest.raises(ValueError, match="serving supports"):
        ServingSampler(bundle, RefineConfig(), method="mhgan")


def test_experiment_generate_collab_shapes_then_serves(tmp_path):
    """End-to-end: collab serving shapes D once, persists it, writes npz."""
    from collaborative_gan_sampling_tpu.config import (
        Config,
        DataConfig,
        EvalConfig,
        TrainConfig,
    )
    from collaborative_gan_sampling_tpu.pipeline import Experiment

    cfg = Config(
        name="toy2d", seed=0, workdir=str(tmp_path),
        model=ModelConfig(kind="mlp", z_dim=4, data_dim=2, g_hidden=16,
                          d_hidden=16, g_layers=2, d_layers=2,
                          compute_dtype="float32"),
        data=DataConfig(dataset="ring8", mixture_std=0.1),
        train=TrainConfig(batch_size=64, niters=60, steps_per_call=30,
                          ckpt_every=60),
        refine=RefineConfig(steps=2, rate=0.05, num_batches=2,
                            batch_size=32, burn_in=64, shape_every=1,
                            use_pallas=False),
        eval=EvalConfig(),
    )
    exp = Experiment(cfg, echo_metrics=False)
    state = exp.train()
    out = os.path.join(str(tmp_path), "samples.npz")
    samples, labels, stats = exp.generate(state, n=100, method="collab",
                                          out=out)
    assert samples.shape == (100, 2) and labels is None
    assert stats["method"] == "collab" and stats["out"] == out
    # Shaped D was persisted for future serving sessions.
    assert os.path.exists(os.path.join(str(tmp_path), "shaped_d.msgpack"))
    loaded = np.load(out)
    np.testing.assert_array_equal(loaded["samples"], samples)
    # use_shaped_d must be honored for NON-collab methods too (the 'train
    # once, shape once, refine many times' serving path): refinement under
    # the shaped D differs from refinement under the raw D.
    s_raw, _, _ = exp.generate(state, n=64, method="refinement")
    s_shaped, _, _ = exp.generate(state, n=64, method="refinement",
                                  use_shaped_d=True)
    assert not np.array_equal(s_raw, s_shaped)


def test_serving_under_mesh_matches_single_device():
    """Data-parallel serving must not change the math: same (key, params)
    give the same samples with and without the 8-device mesh."""
    from collaborative_gan_sampling_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8 fake-device CI setup")
    bundle, g_vars, d_vars = _bundle()
    cfg = RefineConfig(steps=2, rate=0.05, num_batches=2, batch_size=32,
                       burn_in=64, use_pallas=False)
    key = jax.random.PRNGKey(5)
    s1, _, _ = ServingSampler(bundle, cfg, method="reject").generate(
        g_vars, d_vars, key, n=100)
    s8, _, _ = ServingSampler(bundle, cfg, method="reject",
                              mesh=make_mesh()).generate(
        g_vars, d_vars, key, n=100)
    np.testing.assert_allclose(s1, s8, rtol=1e-5, atol=1e-6)


def test_z_space_serving_and_mesh_parity():
    """refine.space='z' flows through the serving path; DP mesh parity
    holds for the latent-drift sampler too."""
    from collaborative_gan_sampling_tpu.parallel import make_mesh

    bundle, g_vars, d_vars = _bundle()
    cfg = RefineConfig(steps=3, rate=0.1, num_batches=2, batch_size=32,
                       burn_in=64, space="z", use_pallas=False)
    key = jax.random.PRNGKey(6)
    srv = ServingSampler(bundle, cfg, method="refinement")
    x, _, acc, logits = srv.round(g_vars, d_vars, srv.calibrate(
        g_vars, d_vars, jax.random.PRNGKey(1)), key)
    assert x.shape == (64, 2) and bool(jnp.all(acc))

    if len(jax.devices()) >= 8:
        s1, _, _ = ServingSampler(bundle, cfg, method="refinement").generate(
            g_vars, d_vars, key, n=50)
        s8, _, _ = ServingSampler(bundle, cfg, method="refinement",
                                  mesh=make_mesh()).generate(
            g_vars, d_vars, key, n=50)
        np.testing.assert_allclose(s1, s8, rtol=1e-5, atol=1e-6)


def test_cli_generate(tmp_path, capsys):
    from collaborative_gan_sampling_tpu.cli import main

    out = os.path.join(str(tmp_path), "gen.npz")
    rc = main(["generate", "--config", "toy2d", "--workdir", str(tmp_path),
               "--method", "refinement", "n=64", f"out={out}",
               "train.niters=40", "train.steps_per_call=20",
               "train.ckpt_every=40", "refine.num_batches=2",
               "refine.batch_size=32", "refine.steps=2",
               "refine.use_pallas=false",
               "model.g_hidden=16", "model.d_hidden=16",
               "model.compute_dtype=float32"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n"] == 64 and stats["out"] == out
    assert np.load(out)["samples"].shape == (64, 2)
