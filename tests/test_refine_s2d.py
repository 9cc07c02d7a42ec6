"""Parity gates for the space-to-depth conv-D refinement fast path
(ops/refine_s2d.py) against the lax.scan oracle (sampling/refine.py) —
SURVEY.md section 4 'kernel parity' discipline, applied to an XLA rewrite."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collaborative_gan_sampling_tpu.config import ModelConfig, RefineConfig
from collaborative_gan_sampling_tpu.models import make_bundle
from collaborative_gan_sampling_tpu.ops.conv_refine_ref import (
    depth_to_space,
    space_to_depth,
)
from collaborative_gan_sampling_tpu.ops.refine_s2d import (
    conv0_kernel_to_s2d,
    make_d_fwd_s2d,
    make_refine_s2d,
    supports_s2d_refine,
)
from collaborative_gan_sampling_tpu.sampling.refine import make_refine_fn


def _setup(size=16, channels=1, num_classes=0, seed=0):
    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=size,
                       channels=channels, g_base_filters=8, d_base_filters=8,
                       num_classes=num_classes, compute_dtype="float32")
    bundle = make_bundle(mcfg)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(seed))
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
    x = jax.random.uniform(k1, (8, size, size, channels), minval=-1.0,
                           maxval=1.0)
    labels = (jax.random.randint(k2, (8,), 0, num_classes)
              if num_classes else None)
    return bundle, d_vars, x, labels


def test_s2d_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x), 3)), np.asarray(x))


@pytest.mark.parametrize("size,channels,classes", [
    (16, 1, 0), (28, 1, 0), (32, 3, 0), (64, 3, 0), (16, 1, 4)])
def test_d_fwd_s2d_matches_flax(size, channels, classes):
    bundle, d_vars, x, labels = _setup(size, channels, classes)
    want = bundle.discriminate(d_vars, x, labels, train=False)
    fwd = make_d_fwd_s2d(bundle.d)
    got = fwd(d_vars, space_to_depth(x), labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("clip", [0.0, 0.5])
def test_refine_s2d_matches_scan_oracle(clip):
    bundle, d_vars, x, labels = _setup(16, 1, 0)
    rcfg = RefineConfig(steps=5, rate=0.05, clip_norm=clip, use_pallas=False)
    oracle = jax.jit(make_refine_fn(
        bundle, dataclasses.replace(rcfg, use_s2d=False)))
    x_ref, aux_ref = oracle(d_vars, x)
    fast = jax.jit(make_refine_s2d(bundle, rcfg))
    x_s2d, aux_s2d = fast(d_vars, x)
    np.testing.assert_allclose(np.asarray(x_s2d), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_s2d["logits"]),
                               np.asarray(aux_ref["logits"]),
                               rtol=1e-4, atol=1e-4)


def test_refine_s2d_conditional_matches_oracle():
    bundle, d_vars, x, labels = _setup(16, 1, 4)
    rcfg = RefineConfig(steps=4, rate=0.05, use_pallas=False)
    oracle = jax.jit(make_refine_fn(
        bundle, dataclasses.replace(rcfg, use_s2d=False)))
    x_ref, aux_ref = oracle(d_vars, x, labels)
    fast = jax.jit(make_refine_s2d(bundle, rcfg))
    x_s2d, aux_s2d = fast(d_vars, x, labels)
    np.testing.assert_allclose(np.asarray(x_s2d), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)


def test_make_refine_fn_dispatches_to_s2d():
    """With use_s2d on (default), DCGAN refinement must route through the
    fast path; the gate must refuse trajectories, noise, and MLP models."""
    bundle, d_vars, x, labels = _setup(16, 1, 0)
    rcfg = RefineConfig(steps=3, rate=0.05, use_pallas=False)
    assert supports_s2d_refine(bundle, rcfg, False, 0.0)
    assert not supports_s2d_refine(bundle, rcfg, True, 0.0)
    assert not supports_s2d_refine(bundle, rcfg, False, 0.1)
    assert not supports_s2d_refine(
        bundle, dataclasses.replace(rcfg, use_s2d=False), False, 0.0)

    from collaborative_gan_sampling_tpu.models import make_bundle as mb
    mlp = mb(ModelConfig(kind="mlp", compute_dtype="float32"))
    assert not supports_s2d_refine(mlp, rcfg, False, 0.0)

    # Dispatch happens inside make_refine_fn and agrees with the oracle.
    fast = jax.jit(make_refine_fn(bundle, rcfg))
    oracle = jax.jit(make_refine_fn(
        bundle, dataclasses.replace(rcfg, use_s2d=False)))
    np.testing.assert_allclose(np.asarray(fast(d_vars, x)[0]),
                               np.asarray(oracle(d_vars, x)[0]),
                               rtol=1e-4, atol=1e-5)


def test_conv0_kernel_mapping_shape():
    w = jax.random.normal(jax.random.PRNGKey(0), (5, 5, 3, 16))
    k2 = conv0_kernel_to_s2d(w)
    assert k2.shape == (3, 3, 12, 16)
    # Every original tap appears exactly once: total mass preserved.
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(k2))),
                               float(jnp.sum(jnp.abs(w))), rtol=1e-6)


def test_sampler_fused_g_path_matches_oracle():
    """End-to-end sampler parity: the fused z->G(s2d)->refine path must
    produce the same samples as the unfused pixel-space path (identical
    PRNG streams, math equal up to conv reassociation)."""
    from collaborative_gan_sampling_tpu.sampling import sample

    bundle, d_vars, _, _ = _setup(16, 1, 0)
    g_vars, d_vars = bundle.init(jax.random.PRNGKey(3))
    rcfg = RefineConfig(steps=3, rate=0.05, num_batches=2, batch_size=8,
                        burn_in=8, use_pallas=False)
    res_fast = sample(bundle, g_vars, d_vars, rcfg, jax.random.PRNGKey(4),
                      method="refinement")
    res_ref = sample(bundle, g_vars, d_vars,
                     dataclasses.replace(rcfg, use_s2d=False),
                     jax.random.PRNGKey(4), method="refinement")
    np.testing.assert_allclose(np.asarray(res_fast.samples),
                               np.asarray(res_ref.samples),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_fast.logits),
                               np.asarray(res_ref.logits),
                               rtol=1e-4, atol=1e-4)


def test_g_fwd_s2d_matches_flax():
    """d2s(G_s2d(z)) == bundle.generate(z) for unconditional + conditional
    and 2/4-stage generators (the deconv tap map is exact)."""
    from collaborative_gan_sampling_tpu.ops.refine_s2d import make_g_fwd_s2d

    for size, ch, classes in ((16, 1, 0), (28, 1, 0), (64, 3, 0),
                              (16, 1, 4)):
        bundle, _, _, labels = _setup(size, ch, classes, seed=9)
        g_vars, _ = bundle.init(jax.random.PRNGKey(9))
        z = bundle.sample_z(jax.random.PRNGKey(10), 4)
        labs = labels[:4] if classes else None
        want = bundle.generate(g_vars, z, labs, train=False)
        got = depth_to_space(make_g_fwd_s2d(bundle.g)(g_vars, z, labs), ch)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"(size={size}, ch={ch}, "
                                           f"classes={classes})")


def test_s2d_parity_all_knobs_combined():
    """Objective + clip + stop + proximal all on at once: the s2d fast
    path must stay within fp tolerance of the oracle scan under knob
    INTERACTIONS, not just each knob alone."""
    import dataclasses as _dc

    from collaborative_gan_sampling_tpu.config import (
        ModelConfig,
        RefineConfig,
    )
    from collaborative_gan_sampling_tpu.models import make_bundle
    from collaborative_gan_sampling_tpu.sampling.refine import make_refine_fn

    mcfg = ModelConfig(kind="dcgan", z_dim=8, image_size=16, channels=3,
                       g_base_filters=8, d_base_filters=8, num_classes=4,
                       compute_dtype="float32")
    bundle = make_bundle(mcfg)
    _, d_vars = bundle.init(jax.random.PRNGKey(0))
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3),
                            minval=-1.0, maxval=1.0)
    labels = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 4)
    kw = dict(steps=5, rate=0.05, objective="saturating", clip_norm=0.5,
              stop_score=0.6, proximal=0.8, use_pallas=False)
    fast = make_refine_fn(bundle, RefineConfig(use_s2d=True, **kw))
    oracle = make_refine_fn(bundle, RefineConfig(use_s2d=False, **kw))
    xf, af = jax.jit(lambda x: fast(d_vars, x, labels))(x0)
    xo, ao = jax.jit(lambda x: oracle(d_vars, x, labels))(x0)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xo),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(af["logits"]),
                               np.asarray(ao["logits"]),
                               rtol=3e-5, atol=3e-5)
