"""Golden-file drift tests (SURVEY.md section 4): fixed-seed tiny-model
outputs pinned to on-disk arrays. Catches silent numerical drift from
refactors, jax upgrades, or op-semantics changes. Regenerate deliberately
with tests/golden/README instructions when a change is intended."""

import os

import jax
import numpy as np

from collaborative_gan_sampling_tpu.config import ModelConfig, RefineConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.sampling.refine import make_refine_fn

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "mlp_forward.npz")


def test_mlp_pipeline_matches_golden():
    data = np.load(GOLDEN)
    bundle = make_bundle(ModelConfig(kind="mlp", z_dim=4, g_hidden=32,
                                     d_hidden=32, compute_dtype="float32"))
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(42))
    z = bundle.sample_z(jax.random.PRNGKey(7), 16)
    np.testing.assert_allclose(np.asarray(z), data["z"], atol=1e-6)

    x = bundle.generate(g_vars, z)
    np.testing.assert_allclose(np.asarray(x), data["x"], atol=1e-5)

    logits = bundle.discriminate(d_vars, x)
    np.testing.assert_allclose(np.asarray(logits), data["logits"], atol=1e-5)

    refine = jax.jit(make_refine_fn(
        bundle, RefineConfig(steps=5, rate=0.1, use_pallas=False)))
    x_ref, aux = refine(d_vars, x)
    np.testing.assert_allclose(np.asarray(x_ref), data["x_refined"],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(aux["logits"]),
                               data["logits_refined"], atol=1e-4)


GOLDEN_DCGAN = os.path.join(os.path.dirname(__file__), "golden",
                            "dcgan_forward.npz")


def test_dcgan_pipeline_matches_golden():
    """DCGAN G/D forward + one refine step pinned (VERDICT r1 weak item 7):
    numerical drift bites hardest in the conv paths."""
    data = np.load(GOLDEN_DCGAN)
    bundle = make_bundle(ModelConfig(kind="dcgan", z_dim=8, image_size=16,
                                     channels=1, g_base_filters=8,
                                     d_base_filters=8,
                                     compute_dtype="float32"))
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(42))
    z = bundle.sample_z(jax.random.PRNGKey(7), 4)
    np.testing.assert_allclose(np.asarray(z), data["z"], atol=1e-6)

    x = bundle.generate(g_vars, z)
    np.testing.assert_allclose(np.asarray(x), data["x"], atol=1e-5)

    logits = bundle.discriminate(d_vars, x)
    np.testing.assert_allclose(np.asarray(logits), data["logits"], atol=1e-5)

    refine = jax.jit(make_refine_fn(
        bundle, RefineConfig(steps=1, rate=0.05, use_pallas=False)))
    x_ref, aux = refine(d_vars, x)
    np.testing.assert_allclose(np.asarray(x_ref), data["x_refined"],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(aux["logits"]),
                               data["logits_refined"], atol=1e-4)
